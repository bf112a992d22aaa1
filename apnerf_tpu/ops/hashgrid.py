"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native replacement for tiny-cuda-nn's ``HashGrid`` encoding, which the
reference consumes through ``tcnn.NetworkWithInputEncoding``
(``perception/models/radiance_fields/ngp.py:123-141``: 16 levels,
4 features/level, 2^19 table, base res 16 → max res 4096, geometric
per-level scale).

Design:
  * One [L, T, F] feature table (all levels same hashmap size, like tcnn).
  * Levels whose dense grid fits in T index directly; larger levels use the
    Instant-NGP spatial hash with primes (1, 2654435761, 805459861) — same
    scheme tcnn uses, so collision statistics match.
  * The jnp path is the reference implementation (gathers + trilinear
    lerp); a fused Pallas kernel lives in ``apnerf_tpu/ops/pallas/`` with
    this as its test oracle. Corner gathers are batched into a single
    [N*8] take per level so XLA emits one big gather per level.
  * Backward (scatter-add into the table) comes for free from JAX autodiff
    of the gather; the Pallas kernel provides a custom VJP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 4
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def per_level_scale(self) -> float:
        # ngp.py:103-105
        return float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / max(self.n_levels - 1, 1)
            )
        )

    @property
    def resolutions(self) -> np.ndarray:
        """Per-level grid resolution, floor(base * scale^l) as in tcnn."""
        s = self.per_level_scale
        return np.array(
            [
                int(np.floor(self.base_resolution * (s**l) + 1e-6))
                for l in range(self.n_levels)
            ],
            dtype=np.int32,
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def init_hash_table(key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32):
    """tcnn initializes hash tables U(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_indices(coords: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Table index for integer grid coords [..., 3] at one level.

    Dense indexing when the (res+1)^3 grid fits the table, else the
    Instant-NGP xor-of-prime-multiples spatial hash.
    """
    n_dense = (res + 1) ** 3
    c = coords.astype(jnp.uint32)
    if n_dense <= table_size:
        stride = res + 1
        return (
            c[..., 0] + c[..., 1] * stride + c[..., 2] * (stride * stride)
        ).astype(jnp.int32)
    h = c[..., 0] * np.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * np.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * np.uint32(_PRIMES[2]))
    return (h % np.uint32(table_size)).astype(jnp.int32)


# The 8 trilinear corner offsets, [8, 3].
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def hash_encode(
    table: jnp.ndarray,  # [L, T, F]
    x: jnp.ndarray,  # [N, 3] in [0, 1]
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """Encode unit-cube positions → [N, L*F] features.

    Matches tcnn's convention: a level of resolution R scales the position
    by R and trilinearly interpolates the 8 surrounding integer vertices.
    """
    N = x.shape[0]
    feats = []
    resolutions = cfg.resolutions
    for lvl in range(cfg.n_levels):
        res = int(resolutions[lvl])
        xs = x * res  # tcnn: pos = x * scale (+0.5 rounding variant omitted)
        x0 = jnp.floor(xs)
        w = xs - x0  # [N, 3]
        corners = x0[:, None, :].astype(jnp.int32) + _CORNERS[None, :, :]  # [N,8,3]
        idx = _level_indices(corners, res, cfg.table_size)  # [N, 8]
        vals = table[lvl][idx.reshape(-1)].reshape(N, 8, cfg.n_features)
        # trilinear weights: product over dims of (1-w) or w per corner
        cw = jnp.where(_CORNERS[None, :, :] == 1, w[:, None, :], 1.0 - w[:, None, :])
        weights = jnp.prod(cw, axis=-1)  # [N, 8]
        feats.append(jnp.einsum("nc,ncf->nf", weights, vals))
    return jnp.concatenate(feats, axis=-1)
