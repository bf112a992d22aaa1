"""Ray generation from camera intrinsics and poses (OpenGL convention).

Capability parity with the reference's pixel→ray math
(``perception/data_proc/habitat_to_data.py:234-265`` and
``generate_image_rays`` at ``:274-301``): pixel centers offset by +0.5,
y flipped, camera looks down -z, directions rotated by the c2w rotation,
origins broadcast from the c2w translation.

Everything here is pure jnp and jit/vmap friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Rays(NamedTuple):
    """A bundle of rays. Mirrors the reference's ``Rays`` namedtuple
    (``perception/models/datasets/utils.py:7``)."""

    origins: jnp.ndarray  # [..., 3]
    viewdirs: jnp.ndarray  # [..., 3]


def make_intrinsics(width: int, height: int, hfov: float = np.pi / 2) -> np.ndarray:
    """Pinhole K from image size + horizontal FOV
    (``habitat_to_data.py:113-123``)."""
    focal = 0.5 * width / np.tan(hfov / 2.0)
    return np.array(
        [
            [focal, 0.0, width / 2.0],
            [0.0, focal, height / 2.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def pixel_dirs(x: jnp.ndarray, y: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame direction for pixel coords (x, y), OpenGL convention.

    Args:
      x, y: integer or float pixel coordinates, any matching shape [...].
      K: [3, 3] intrinsics.
    Returns:
      [..., 3] un-normalized camera-frame directions.
    """
    dx = (x - K[0, 2] + 0.5) / K[0, 0]
    dy = -(y - K[1, 2] + 0.5) / K[1, 1]
    dz = -jnp.ones_like(dx)
    return jnp.stack([dx, dy, dz], axis=-1)


def rays_from_pixels(
    x: jnp.ndarray, y: jnp.ndarray, c2w: jnp.ndarray, K: jnp.ndarray
) -> Rays:
    """Rays through given pixels.

    Args:
      x, y: pixel coordinates of shape [...].
      c2w: camera-to-world matrices, [..., 4, 4] or [..., 3, 4]
           (broadcastable against x/y's batch shape).
      K: [3, 3] intrinsics.
    """
    cam_dirs = pixel_dirs(x, y, K)  # [..., 3]
    rot = c2w[..., :3, :3]
    directions = jnp.einsum("...ij,...j->...i", rot, cam_dirs)
    origins = jnp.broadcast_to(c2w[..., :3, 3], directions.shape)
    viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return Rays(origins=origins, viewdirs=viewdirs)


def image_rays(c2w: jnp.ndarray, K: jnp.ndarray, width: int, height: int) -> Rays:
    """Full-image ray grid, flattened row-major to [height*width, 3]."""
    x, y = jnp.meshgrid(jnp.arange(width), jnp.arange(height), indexing="xy")
    return rays_from_pixels(x.reshape(-1), y.reshape(-1), c2w, K)


def subsampled_image_rays(
    c2w: jnp.ndarray, K: jnp.ndarray, width: int, height: int, scale: float
) -> Rays:
    """Evenly subsampled image rays, matching the reference's
    ``np.linspace(0, n-1, out_h*out_w).round()`` flat-index subsampling
    (``habitat_to_data.py:349-354``). Used for low-res candidate-view
    uncertainty rendering."""
    out_h, out_w = int(height * scale), int(width * scale)
    n = height * width
    idx = np.round(np.linspace(0, n - 1, out_h * out_w)).astype(np.int32)
    rays = image_rays(c2w, K, width, height)
    return Rays(origins=rays.origins[idx], viewdirs=rays.viewdirs[idx])


def pose_matrix_from_quat(pos: np.ndarray, quat_xyzw: np.ndarray) -> np.ndarray:
    """4x4 c2w from position + xyzw quaternion (host-side helper, numpy).

    Equivalent of the reference's scipy ``R.from_quat(...).as_matrix()``
    construction (``habitat_to_data.py:332-338``), implemented directly so
    it also works on plain float arrays inside tests.
    """
    x, y, z, w = [float(v) for v in quat_xyzw]
    n = np.sqrt(x * x + y * y + z * z + w * w)
    if n > 0:
        x, y, z, w = x / n, y / n, z / n, w / n
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(pos, dtype=np.float64)
    return T


def quat_xyzw_from_matrix(R: np.ndarray) -> np.ndarray:
    """xyzw quaternion from a 3x3 rotation (inverse of
    ``pose_matrix_from_quat``; Shepperd's method, numerically stable for
    every sign pattern of the diagonal). Host-side numpy helper used by
    the replay simulator to express recorded c2w matrices in the facade's
    pose7 convention (``simulator/sim.py:145-151`` carries xyzw quats)."""
    R = np.asarray(R, dtype=np.float64)[:3, :3]
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w], dtype=np.float64)
    return q / np.linalg.norm(q)
