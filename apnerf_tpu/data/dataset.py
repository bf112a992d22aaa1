"""Online ray dataset: growing observation store + bootstrap resampling.

Capability parity with the reference ``Dataset``
(``perception/data_proc/habitat_to_data.py:31-272``), re-designed for XLA:

  * The reference grows GPU tensors by ``torch.cat`` on every planning step
    (``:140-151``) — under jit that would retrace on each shape change.
    Here observations live in **fixed-capacity device arrays** with a host
    ``size`` cursor; appends are ``dynamic_update_slice`` writes.
  * Per-member bootstrap index pools (members >= 1 draw 0.7x new images
    with replacement per update; member 0 sees everything —
    ``:47-49, 102-132, 178-182``) are kept as host numpy pools; image
    selection happens on host (tiny scalars), pixel sampling on device.
  * Training fetch = one random image per member, ``num_rays`` random
    pixels, OpenGL rays from K (``:205-265``); random background color in
    training, white at eval (``:189-194``).
  * ``save``/``load`` use the same ``data<k>.npz`` schema (``:164-173``)
    so reference-collected trajectories replay directly.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rays import Rays, make_intrinsics, rays_from_pixels


class RayBatch(NamedTuple):
    """One member's training batch (device arrays)."""

    origins: jnp.ndarray  # [R, 3]
    viewdirs: jnp.ndarray  # [R, 3]
    pixels: jnp.ndarray  # [R, 3] in [0, 1]
    depth: jnp.ndarray  # [R]
    sem: jnp.ndarray  # [R] int32
    color_bkgd: jnp.ndarray  # [3]


def fetch_rays(
    images: jnp.ndarray,  # [N, H, W, 3] uint8
    depths: jnp.ndarray,  # [N, H, W] f32
    semantics: jnp.ndarray,  # [N, H, W] int32
    camtoworlds: jnp.ndarray,  # [N, 4, 4]
    K: jnp.ndarray,  # [3, 3]
    image_idx: jnp.ndarray,  # [] int32
    key: jax.Array,
    num_rays: int,
    training: bool = True,
    shard: Optional[Tuple[jnp.ndarray, int]] = None,
) -> RayBatch:
    """Jittable pixel→ray fetch for one image (``habitat_to_data.py:205-272``).

    ``shard=(shard_idx, n_shards)``: draw the SAME ``num_rays`` global
    pixel indices as the unsharded fetch, then gather only this shard's
    contiguous ``num_rays // n_shards`` slice — so a shard_map
    data-parallel phase sees bit-identical rays to the single-device
    phase (index generation is trivial; only the pixel gathers are
    sharded)."""
    H, W = images.shape[1], images.shape[2]
    k_x, k_y, k_bkgd = jax.random.split(key, 3)
    x = jax.random.randint(k_x, (num_rays,), 0, W)
    y = jax.random.randint(k_y, (num_rays,), 0, H)
    if shard is not None:
        shard_idx, n_shards = shard
        local = num_rays // n_shards
        x = jax.lax.dynamic_slice_in_dim(x, shard_idx * local, local)
        y = jax.lax.dynamic_slice_in_dim(y, shard_idx * local, local)
    # Barrier-fenced FLAT pixel gather from the whole pool. The naive
    # fused 3-D gather images[img_idx, y, x] measured ~1 ms/step SLOWER
    # on the v5e (XLA scalarizes gathers whose index arithmetic fuses in,
    # docs/PERFORMANCE.md "fusion scalarization") — but fencing the flat
    # index on BOTH sides keeps the gather vectorized: 0.655 vs the
    # two-step image-copy path's 0.937 ms/step (scripts/profile_fetch.py;
    # the copy alone was ~0.24 ms/step of pure relayout at 640²).
    flat = image_idx * (H * W) + y * W + x
    (flat,) = jax.lax.optimization_barrier((flat,))
    rgb8 = jnp.take(images.reshape(-1, 3), flat, axis=0)
    dep = jnp.take(depths.reshape(-1), flat, axis=0)
    sem = jnp.take(semantics.reshape(-1), flat, axis=0)
    rgb8, dep, sem = jax.lax.optimization_barrier((rgb8, dep, sem))
    c2w = jax.lax.dynamic_index_in_dim(camtoworlds, image_idx, keepdims=False)
    rgb = rgb8.astype(jnp.float32) / 255.0
    rays = rays_from_pixels(x, y, c2w, K)
    if training:
        bkgd = jax.random.uniform(k_bkgd, (3,))
    else:
        bkgd = jnp.ones((3,))
    return RayBatch(
        origins=rays.origins,
        viewdirs=rays.viewdirs,
        pixels=rgb,
        depth=dep,
        sem=sem.astype(jnp.int32),
        color_bkgd=bkgd,
    )


class RayDataset:
    """Host-side manager of the fixed-capacity device observation store."""

    def __init__(
        self,
        training: bool,
        save_fp: Optional[str] = None,
        num_rays: int = 1024,
        num_models: int = 1,
        width: int = 640,
        height: int = 640,
        hfov: float = np.pi / 2,
        max_images: int = 512,
        boot_scale: float = 0.7,
        seed: int = 9,
    ):
        self.training = training
        self.save_fp = save_fp
        self.num_rays = num_rays
        self.num_models = num_models
        self.boot_scale = boot_scale
        self.max_images = max_images
        self.size = 0
        self.saved_batch = 0
        self.width, self.height = width, height
        self.K = jnp.asarray(make_intrinsics(width, height, hfov))
        self._rng = np.random.RandomState(seed)
        # bootstrap pools for members 1..num_models-1 (member 0 = all data)
        self.bootstrap_indices = [
            np.array([], dtype=np.int64) for _ in range(num_models - 1)
        ]
        self.images = jnp.zeros((max_images, height, width, 3), dtype=jnp.uint8)
        self.depths = jnp.zeros((max_images, height, width), dtype=jnp.float32)
        self.semantics = jnp.zeros((max_images, height, width), dtype=jnp.int32)
        self.camtoworlds = jnp.tile(
            jnp.eye(4, dtype=jnp.float32)[None], (max_images, 1, 1)
        )
        if save_fp and not os.path.exists(save_fp):
            os.makedirs(save_fp)

    def __len__(self) -> int:
        return self.size

    def update_data(self, images, depths, semantics, camtoworlds) -> None:
        """Append a batch of observations (``habitat_to_data.py:89-153``)."""
        images = np.asarray(images)[..., :3].astype(np.uint8)
        depths = np.asarray(depths, dtype=np.float32)
        semantics = np.asarray(semantics).astype(np.int32)
        camtoworlds = np.asarray(camtoworlds, dtype=np.float32)
        n = len(images)
        if self.size + n > self.max_images:
            raise ValueError(
                f"RayDataset capacity {self.max_images} exceeded "
                f"({self.size} + {n}); raise max_images."
            )
        for i, arr in enumerate(self.bootstrap_indices):
            ids = self._rng.choice(n, size=int(n * self.boot_scale), replace=True)
            self.bootstrap_indices[i] = np.concatenate([arr, self.size + ids])
        sl = jax.lax.dynamic_update_slice
        self.images = sl(self.images, jnp.asarray(images), (self.size, 0, 0, 0))
        self.depths = sl(self.depths, jnp.asarray(depths), (self.size, 0, 0))
        self.semantics = sl(self.semantics, jnp.asarray(semantics), (self.size, 0, 0))
        self.camtoworlds = sl(
            self.camtoworlds, jnp.asarray(camtoworlds), (self.size, 0, 0)
        )
        self.size += n

    def bootstrap(self, model_idx: int) -> np.ndarray:
        """Index pool visible to a member (``habitat_to_data.py:178-182``)."""
        if model_idx == 0:
            return np.arange(self.size)
        return self.bootstrap_indices[model_idx - 1]

    def sample_image_indices(
        self, recent_bias: bool, sample_disc: int
    ) -> np.ndarray:
        """One training image index per member, with the reference's 50%%
        recent-data bias during planning (``pipeline.py:421-434``).
        ``recent_bias`` decides whether the bias coin is flipped at all
        (False for initial/final training)."""
        out = np.zeros((self.num_models,), dtype=np.int32)
        for m in range(self.num_models):
            pool = self.bootstrap(m)
            if recent_bias and self._rng.random_sample() < 0.5:
                recent = pool[pool >= self.size - sample_disc]
                if len(recent) > 0:
                    pool = recent
            out[m] = self._rng.choice(pool)
        return out

    def resample_data(self) -> None:
        """Keep a random 70% of images and rebuild bootstrap pools
        (``habitat_to_data.py:68-87``). Host-side reshuffle of the store."""
        keep = self._rng.choice(self.size, size=int(self.size * 0.7), replace=False)
        n = len(keep)
        keep_j = jnp.asarray(keep)
        for name in ("images", "depths", "semantics", "camtoworlds"):
            arr = getattr(self, name)
            taken = jnp.take(arr, keep_j, axis=0)
            buf = jnp.zeros_like(arr)
            setattr(
                self, name, jax.lax.dynamic_update_slice(
                    buf, taken, (0,) + (0,) * (arr.ndim - 1)
                )
            )
        self.size = n
        self.bootstrap_indices = [
            self._rng.choice(n, size=int(n * self.boot_scale), replace=True).astype(
                np.int64
            )
            for _ in range(self.num_models - 1)
        ]

    # ---- persistence: same npz schema as habitat_to_data.py:164-173 ----

    def save(self) -> str:
        assert self.save_fp is not None
        path = os.path.join(self.save_fp, f"data{self.saved_batch}.npz")
        np.savez(
            path,
            images=np.asarray(self.images[: self.size]),
            depths=np.asarray(self.depths[: self.size]),
            semantics=np.asarray(self.semantics[: self.size]),
            camtoworlds=np.asarray(self.camtoworlds[: self.size]),
            K=np.asarray(self.K),
            bootstrap_indices=np.array(self.bootstrap_indices, dtype=object),
        )
        return path

    @classmethod
    def load(cls, npz_path: str, training: bool = True, **kw) -> "RayDataset":
        """Rebuild a dataset from a saved (or reference-produced) npz."""
        data = np.load(npz_path, allow_pickle=True)
        images = data["images"]
        n, h, w = images.shape[:3]
        kw.setdefault("max_images", max(n, 1))
        ds = cls(training=training, width=w, height=h, **kw)
        ds.update_data(
            images, data["depths"], data["semantics"], data["camtoworlds"]
        )
        if "bootstrap_indices" in data and ds.num_models > 1:
            loaded = list(data["bootstrap_indices"])
            for i in range(min(len(loaded), len(ds.bootstrap_indices))):
                ds.bootstrap_indices[i] = np.asarray(loaded[i], dtype=np.int64)
        return ds
