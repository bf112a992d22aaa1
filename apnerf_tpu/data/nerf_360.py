"""Mip-NeRF 360 (real captures, COLMAP poses) dataset loader.

Capability parity with ``perception/models/datasets/nerf_360_v2.py``:
COLMAP sparse model → OpenGL c2w poses, downsampled images, scene
normalization so cameras sit inside the unit region (pairs with the
unbounded contraction field).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

from .colmap import load_colmap_poses


class SceneData(NamedTuple):
    images: np.ndarray  # [N, H, W, 3] uint8
    camtoworlds: np.ndarray  # [N, 4, 4]
    K: np.ndarray  # [3, 3]

    @property
    def width(self) -> int:
        return self.images.shape[2]

    @property
    def height(self) -> int:
        return self.images.shape[1]


def normalize_poses(c2ws: np.ndarray) -> np.ndarray:
    """Center on the mean camera position and scale so all cameras fit in
    a unit ball (the loader's similarity normalization)."""
    c2ws = c2ws.copy()
    center = c2ws[:, :3, 3].mean(axis=0)
    c2ws[:, :3, 3] -= center
    scale = np.max(np.linalg.norm(c2ws[:, :3, 3], axis=1))
    if scale > 0:
        c2ws[:, :3, 3] /= scale
    return c2ws


def load_360_scene(
    root: str,
    factor: int = 4,
    split: str = "train",
    test_every: int = 8,
    max_images: Optional[int] = None,
) -> SceneData:
    """root must contain sparse/0/{cameras,images}.bin and images[_N]/."""
    c2ws, K, names = load_colmap_poses(os.path.join(root, "sparse", "0"))
    img_dir = os.path.join(root, f"images_{factor}" if factor > 1 else "images")
    if not os.path.isdir(img_dir):
        img_dir = os.path.join(root, "images")
        factor_actual = 1
    else:
        factor_actual = factor
    try:
        import imageio.v2 as imageio
    except ImportError:  # pragma: no cover
        import imageio

    idx = np.arange(len(names))
    test_mask = idx % test_every == 0
    keep = ~test_mask if split == "train" else test_mask
    sel = idx[keep]
    if max_images:
        sel = sel[:max_images]

    images = np.stack(
        [imageio.imread(os.path.join(img_dir, names[i]))[..., :3] for i in sel]
    )
    K = K.copy()
    K[:2] /= factor_actual
    return SceneData(
        images=images.astype(np.uint8),
        camtoworlds=normalize_poses(c2ws[sel]),
        K=K.astype(np.float32),
    )
