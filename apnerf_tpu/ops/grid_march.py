"""Occupancy-grid ray marching with static shapes.

TPU-native replacement for the reference's CUDA DDA traversal
(``perception/nerfacc/nerfacc/cuda/csrc/grid.cu:68-282`` — one thread per
ray, Amanatides–Woo voxel stepping, variable-length packed output) and its
Python wrapper ``traverse_grids`` (``nerfacc/grid.py:93-192``).

The XLA-friendly formulation:

1. A *candidate lattice* of K sample intervals per ray follows the exact
   cone-angle step rule of the reference (``grid.cu``:
   ``dt = clamp(t * cone_angle, dt_min, inf)``) in closed form: steps are
   ``dt_min`` (linear phase) while ``t < dt_min/cone`` and geometric
   (``t_{k+1} = t_k (1+cone)``) after. The lattice is shared by all rays
   and computed once per (near, dt, cone) configuration.
2. Each candidate midpoint is gathered from the binary occupancy grid —
   a dense [R, K] lookup instead of per-thread DDA.
3. Candidates are *compacted* to the first ``max_samples`` occupied
   entries per ray via a cumsum + scatter, producing padded
   ``[R, max_samples]`` (t_starts, t_ends, valid) buffers — the static-
   shape analogue of nerfacc's packed (ray_indices, t_starts, t_ends).

Everything is jit/vmap-compatible; no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RaySegments(NamedTuple):
    """Padded per-ray sample intervals (static-shape RaySamples analogue of
    ``nerfacc/data_specs.py:12-181``)."""

    t_starts: jnp.ndarray  # [R, S]
    t_ends: jnp.ndarray  # [R, S]
    valid: jnp.ndarray  # [R, S] bool


def ray_aabb_intersect(
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    aabb: jnp.ndarray,  # [6]
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    miss_value: float = 1e10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test ray/AABB intersection → (t_min, t_max), each [R].

    Behavior parity with ``nerfacc/grid.py:13-51`` (CUDA) and the pure
    reference ``_ray_aabb_intersect`` (``grid.py:54-90``): results clamped
    to [near_plane, far_plane], misses get ``miss_value``.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d, 1e-10)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_min = jnp.clip(t_min, near_plane, far_plane)
    t_max = jnp.clip(t_max, near_plane, far_plane)
    hit = t_min < t_max
    t_min = jnp.where(hit, t_min, miss_value)
    t_max = jnp.where(hit, t_max, miss_value)
    return t_min, t_max


def candidate_lattice(
    n_candidates: int,
    near: float,
    dt_min: float,
    cone_angle: float = 0.0,
) -> np.ndarray:
    """The shared marching lattice t_0..t_K (host-side, static).

    Exact closed form of the reference's step recurrence
    ``t += clamp(t*cone, dt_min, inf)`` (``grid.cu`` ``setup_traversal`` /
    sampling loop): linear spacing until ``t >= dt_min/cone``, geometric
    growth after. Returns [K+1] interval boundaries starting at ``near``.
    """
    k = np.arange(n_candidates + 1, dtype=np.float64)
    if cone_angle <= 0.0:
        t = near + k * dt_min
    else:
        c = dt_min / cone_angle
        # linear phase: t_k = near + k*dt_min while t_k < c
        k0 = max(0.0, np.ceil((c - near) / dt_min))
        t_lin = near + k * dt_min
        t_k0 = near + k0 * dt_min
        t_geo = t_k0 * (1.0 + cone_angle) ** (k - k0)
        t = np.where(k < k0, t_lin, t_geo)
    return t.astype(np.float32)


def compact_mask(
    mask: jnp.ndarray,  # [R, K] bool
    max_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first ``max_samples`` True entries per row.

    Returns (idx [R, S] int32, valid [R, S] bool). This is the static-shape
    stream-compaction that replaces the CUDA two-pass count-then-fill
    allocation in ``grid.cu:405-470``.

    Implementation: the (s+1)-th True position is
    ``searchsorted(cumsum(mask), s+1)`` — a vmapped binary search
    (log K gather rounds), which on TPU beats both a scatter
    (serialized updates) and a stable argsort (minutes of compile,
    measured) by >30x.
    """
    R, K = mask.shape
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # [R, K] monotone
    targets = jnp.broadcast_to(
        jnp.arange(1, max_samples + 1, dtype=jnp.int32)[None, :],
        (R, max_samples),
    )
    # Branchless binary search for the first position with csum >= target,
    # UNROLLED in Python: as a lax.fori_loop the same 11 rounds measured
    # 56 ms on a v5e (loop-carried gather indices defeat XLA's gather
    # pipelining); unrolled straight-line HLO measures 0.03 ms.
    lo = jnp.zeros((R, max_samples), dtype=jnp.int32)
    hi = jnp.full((R, max_samples), K - 1, dtype=jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(K, 2))))):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(csum, mid, axis=1)
        ge = v >= targets
        lo = jnp.where(ge, lo, mid + 1)
        hi = jnp.where(ge, mid, hi)
    idx = lo  # [R, S]
    n_kept = jnp.minimum(csum[:, -1], max_samples)  # [R]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (R, max_samples), 1) < n_kept[:, None]
    )
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    return idx, valid


def occupancy_lookup(
    binaries: jnp.ndarray,  # [Gx, Gy, Gz] bool (single level)
    aabb: jnp.ndarray,  # [6]
    positions: jnp.ndarray,  # [..., 3]
) -> jnp.ndarray:
    """Gather the binary occupancy at world positions → [...] bool.

    Points outside the aabb read as unoccupied (the reference's traversal
    never emits samples outside the grid).
    """
    res = jnp.array(binaries.shape, dtype=jnp.float32)
    u = (positions - aabb[:3]) / (aabb[3:] - aabb[:3])
    inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    ijk = jnp.clip((u * res).astype(jnp.int32), 0, jnp.array(binaries.shape) - 1)
    # Flat-index gather fenced by optimization_barrier: XLA otherwise fuses
    # the index arithmetic into the gather and scalarizes it (same v5e
    # pathology measured for the hash table — see ops/hashgrid.py).
    strides = jnp.array(
        [binaries.shape[1] * binaries.shape[2], binaries.shape[2], 1],
        dtype=jnp.int32,
    )
    flat_idx = jax.lax.optimization_barrier(
        (ijk * strides).sum(axis=-1).reshape(-1)
    )
    occ = jax.lax.optimization_barrier(binaries.reshape(-1)[flat_idx])
    return occ.reshape(positions.shape[:-1]) & inside


def march_rays(
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    binaries: jnp.ndarray,  # [Gx, Gy, Gz] bool
    aabb: jnp.ndarray,  # [6]
    lattice: jnp.ndarray,  # [K+1] from candidate_lattice
    max_samples: int,
    near_planes: jnp.ndarray = None,  # [R] optional per-ray near override
    far_plane: float = 1e10,
) -> RaySegments:
    """Occupancy-grid marching: padded (t_starts, t_ends, valid).

    Functional equivalent of ``OccGridEstimator.sampling``'s traversal stage
    (``nerfacc/estimators/occ_grid.py:81-238`` → ``traverse_grids``): the
    lattice starts at the sampling near plane; candidates outside
    [t_aabb_min, min(t_aabb_max, far)] or in empty voxels are discarded;
    survivors are compacted to ``max_samples`` per ray.
    """
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb, far_plane=far_plane)
    t0 = lattice[:-1][None, :]  # [1, K]
    t1 = lattice[1:][None, :]
    t_mid = 0.5 * (t0 + t1)
    if near_planes is not None:
        lo = jnp.maximum(t_min, near_planes)[:, None]
    else:
        lo = t_min[:, None]
    in_range = (t_mid >= lo) & (t_mid <= t_max[:, None])  # [R, K]

    # Per-axis occupancy test in [R, K] layouts (K minor → clean lane
    # tiling; a [R, K, 3] position array pads its minor dim 43x and
    # dominated the march cost — see ops/hashgrid.py for the measured
    # layout rules). The flat-index gather is fenced from the index
    # arithmetic with optimization_barrier to stay a pure memory op.
    gx, gy, gz = binaries.shape
    res = (gx, gy, gz)
    inside = in_range
    flat_idx = jnp.zeros_like(in_range, dtype=jnp.int32)
    strides = (gy * gz, gz, 1)
    for d in range(3):
        u_d = (rays_o[:, d : d + 1] + t_mid * rays_d[:, d : d + 1] - aabb[d]) / (
            aabb[d + 3] - aabb[d]
        )
        inside = inside & (u_d >= 0.0) & (u_d < 1.0)
        i_d = jnp.clip((u_d * res[d]).astype(jnp.int32), 0, res[d] - 1)
        flat_idx = flat_idx + i_d * strides[d]
    idx_b = jax.lax.optimization_barrier(flat_idx.reshape(-1))
    occ = jax.lax.optimization_barrier(binaries.reshape(-1)[idx_b])
    mask = inside & occ.reshape(in_range.shape)
    idx, valid = compact_mask(mask, max_samples)
    t_starts = jnp.take_along_axis(jnp.broadcast_to(t0, mask.shape), idx, axis=1)
    t_ends = jnp.take_along_axis(jnp.broadcast_to(t1, mask.shape), idx, axis=1)
    zero = jnp.zeros_like(t_starts)
    return RaySegments(
        t_starts=jnp.where(valid, t_starts, zero),
        t_ends=jnp.where(valid, t_ends, zero),
        valid=valid,
    )
