"""Grid-march / compaction tests.

Oracle strategy mirrors ``/root/reference/perception/nerfacc/tests/
test_grid.py``: the fast path is checked against a brute-force numpy
reference (there: CUDA vs pure-torch; here: vectorized jnp vs per-ray
Python marching).
"""

import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.grid_march import (
    candidate_lattice,
    compact_mask,
    march_rays,
    occupancy_lookup,
    ray_aabb_intersect,
)


def test_ray_aabb_intersect_brute_force():
    # mirrors test_grid.py:8-35: check midpoints of hits are inside the box.
    rng = np.random.RandomState(42)
    n = 500
    rays_o = rng.rand(n, 3).astype(np.float32) * 2 - 0.5
    rays_d = rng.randn(n, 3).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])

    t_min, t_max = ray_aabb_intersect(jnp.asarray(rays_o), jnp.asarray(rays_d), aabb)
    t_min, t_max = np.array(t_min), np.array(t_max)
    hit = t_min < 1e9
    mid = rays_o + np.clip((t_min + t_max) / 2, 0, None)[:, None] * rays_d
    inside = np.all((mid >= 0.0 - 1e-5) & (mid <= 1.0 + 1e-5), axis=-1)
    assert np.all(inside[hit])
    assert hit.any() and (~hit).any()


def test_candidate_lattice_matches_recurrence():
    # exact vs the grid.cu step rule: dt = max(t*cone, dt_min)
    near, dt_min, cone = 0.1, 0.01, 0.04
    lat = candidate_lattice(64, near, dt_min, cone)
    t = near
    for k in range(65):
        np.testing.assert_allclose(lat[k], t, rtol=1e-5)
        t = t + max(t * cone, dt_min)

    lat0 = candidate_lattice(16, 0.5, 0.25, 0.0)
    np.testing.assert_allclose(lat0, 0.5 + 0.25 * np.arange(17), rtol=1e-6)


def test_compact_mask():
    mask = jnp.asarray(
        [
            [0, 1, 0, 1, 1, 0, 1],
            [0, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 1],
        ],
        dtype=bool,
    )
    idx, valid = compact_mask(mask, 3)
    assert list(np.array(idx[0])) == [1, 3, 4]
    assert np.all(np.array(valid[0]))
    assert not np.any(np.array(valid[1]))
    assert list(np.array(idx[2])) == [0, 1, 2]
    assert np.all(np.array(valid[2]))


def test_occupancy_lookup():
    binaries = jnp.zeros((4, 4, 4), dtype=bool).at[1, 2, 3].set(True)
    aabb = jnp.asarray([0.0, 0.0, 0.0, 4.0, 4.0, 4.0])
    pts = jnp.asarray([[1.5, 2.5, 3.5], [0.5, 0.5, 0.5], [9.0, 0.0, 0.0]])
    occ = occupancy_lookup(binaries, aabb, pts)
    assert list(np.array(occ)) == [True, False, False]


def test_march_rays_vs_python_reference():
    """Vectorized marcher vs a per-ray scalar reference implementation."""
    rng = np.random.RandomState(7)
    res = (8, 8, 8)
    binaries_np = rng.rand(*res) > 0.6
    aabb_np = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], dtype=np.float32)
    n_rays, max_s = 32, 16
    rays_o = rng.randn(n_rays, 3).astype(np.float32) * 0.2
    rays_d = rng.randn(n_rays, 3).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    dt = 0.05
    lat = candidate_lattice(128, 0.0, dt, 0.0)
    segs = march_rays(
        jnp.asarray(rays_o),
        jnp.asarray(rays_d),
        jnp.asarray(binaries_np),
        jnp.asarray(aabb_np),
        jnp.asarray(lat),
        max_s,
    )

    for r in range(n_rays):
        # scalar reference march
        expected = []
        for k in range(128):
            t0, t1 = lat[k], lat[k + 1]
            tm = (t0 + t1) / 2
            p = rays_o[r] + tm * rays_d[r]
            u = (p - aabb_np[:3]) / (aabb_np[3:] - aabb_np[:3])
            if np.any(u < 0) or np.any(u >= 1):
                continue
            ijk = np.floor(u * np.array(res)).astype(int)
            if binaries_np[tuple(ijk)]:
                expected.append((t0, t1))
            if len(expected) == max_s:
                break
        got_valid = np.array(segs.valid[r])
        got_ts = np.array(segs.t_starts[r])[got_valid]
        got_te = np.array(segs.t_ends[r])[got_valid]
        assert len(got_ts) == len(expected), f"ray {r}"
        if expected:
            np.testing.assert_allclose(got_ts, [e[0] for e in expected], rtol=1e-5)
            np.testing.assert_allclose(got_te, [e[1] for e in expected], rtol=1e-5)


def test_march_rays_t_range_clipping():
    # mirrors test_grid.py near/far-plane coverage (:135-234)
    binaries = jnp.ones((8, 8, 8), dtype=bool)
    aabb = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    rays_o = jnp.asarray([[-1.0, 0.5, 0.5]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    lat = jnp.asarray(candidate_lattice(256, 0.0, 0.05, 0.0))
    segs = march_rays(rays_o, rays_d, binaries, aabb, lat, 64)
    valid = np.array(segs.valid[0])
    t_mids = (np.array(segs.t_starts[0]) + np.array(segs.t_ends[0]))[valid] / 2
    # ray enters box at t=1, exits at t=2
    assert np.all(t_mids >= 1.0) and np.all(t_mids <= 2.0)

    segs2 = march_rays(
        rays_o,
        rays_d,
        binaries,
        aabb,
        lat,
        64,
        near_planes=jnp.asarray([1.5]),
    )
    valid2 = np.array(segs2.valid[0])
    t_mids2 = (np.array(segs2.t_starts[0]) + np.array(segs2.t_ends[0]))[valid2] / 2
    assert np.all(t_mids2 >= 1.5)
