"""NeRF-Synthetic (blender) dataset loader.

Capability parity with ``perception/models/datasets/nerf_synthetic.py``
(SubjectLoader: transforms_<split>.json + PNGs, white/random background,
OpenGL rays) on numpy/jnp. Used by the standalone example trainers —
the benchmark path for the nerfacc-docs baselines (BASELINE.md).
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import numpy as np

from ..ops.rays import Rays

SUBJECTS = [
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
]


class SubjectData(NamedTuple):
    images: np.ndarray  # [N, H, W, 4] uint8 (RGBA)
    camtoworlds: np.ndarray  # [N, 4, 4] f32
    focal: float
    width: int
    height: int


def load_subject(root: str, subject: str, split: str = "train",
                 max_images: Optional[int] = None) -> SubjectData:
    path = os.path.join(root, subject, f"transforms_{split}.json")
    with open(path) as f:
        meta = json.load(f)
    try:
        import imageio.v2 as imageio
    except ImportError:  # pragma: no cover
        import imageio

    images, c2ws = [], []
    frames = meta["frames"][:max_images] if max_images else meta["frames"]
    for frame in frames:
        fname = os.path.join(root, subject, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        c2ws.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
    images = np.stack(images)
    c2ws = np.stack(c2ws)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return SubjectData(images=images, camtoworlds=c2ws, focal=focal,
                       width=w, height=h)


def rays_for_pixels(data: SubjectData, image_id, x, y) -> Rays:
    """OpenGL rays for pixel coords (same math as the online dataset)."""
    import jax.numpy as jnp

    from ..ops.rays import rays_from_pixels

    K = jnp.asarray(
        [
            [data.focal, 0, data.width / 2],
            [0, data.focal, data.height / 2],
            [0, 0, 1],
        ],
        dtype=jnp.float32,
    )
    c2w = jnp.asarray(data.camtoworlds[np.asarray(image_id)])
    return rays_from_pixels(jnp.asarray(x), jnp.asarray(y), c2w, K)
