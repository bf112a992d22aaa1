"""Native planning core parity tests: C++ vs pure-Python implementations."""

import numpy as np
import pytest

from apnerf_tpu.native import (
    dijkstra_plan_native,
    is_available,
    raycast_update_native,
    voxel_traverse_native,
)

native = pytest.mark.skipif(not is_available(), reason="native lib not built")


@native
def test_dijkstra_native_matches_python_cost():
    from apnerf_tpu.planning.dijkstra import Dijkstra

    rng = np.random.RandomState(3)
    pmap = (rng.rand(30, 30) < 0.2).astype(np.int32)
    pmap[2, 2] = pmap[25, 25] = 0
    aabb = np.array([0.0, 0.0, 0.0, 3.0, 3.0, 3.0])
    d = Dijkstra(aabb, pmap, 0.1, 0.05)
    p_py = d.planning(0.2, 0.2, 2.5, 2.5, use_native=False)
    p_cc = d.planning(0.2, 0.2, 2.5, 2.5, use_native=True)
    assert (p_py is None) == (p_cc is None)
    if p_py is not None:
        def cost(path):
            xs, ys = np.asarray(path[0]), np.asarray(path[1])
            steps = np.stack([np.diff(xs), np.diff(ys)], -1)
            return np.sum(np.linalg.norm(steps, axis=-1))

        # equal-cost shortest paths (tie-breaking may differ)
        np.testing.assert_allclose(cost(p_py), cost(p_cc), atol=1e-6)
        # both collision-free
        for path in (p_py, p_cc):
            xs = np.round(np.asarray(path[0]) / 0.1).astype(int)
            ys = np.round(np.asarray(path[1]) / 0.1).astype(int)
            assert not pmap[xs, ys].any()
        # same endpoints
        assert p_py[0][0] == p_cc[0][0] and p_py[0][-1] == p_cc[0][-1]


@native
def test_dijkstra_native_unreachable():
    out = dijkstra_plan_native(
        np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], dtype=np.uint8),
        0, 0, 0, 2,
    )
    assert out is None


@native
def test_raycast_native_close_to_python():
    from apnerf_tpu.planning.cost_map import generate_ray_casting_grid_map

    aabb = np.array([0.0, 0.0, 0.0, 4.0, 4.0, 4.0])
    ox = np.array([2.0, 3.0, 1.0])
    oy = np.array([3.8, 2.0, 0.4])
    occ_py = generate_ray_casting_grid_map(ox, oy, 20, 20, 10, 10, aabb, 0.2)
    occ_cc = raycast_update_native(
        np.full((20, 20), 0.5), ox, oy, 10, 10, aabb[2], aabb[0], 0.2
    )
    # endpoints occupied in both
    assert occ_py[10, 19] == occ_cc[10, 19] == 1.0
    # free/occupied sets agree up to Bresenham tie-breaking on diagonals
    agree = (occ_py == occ_cc).mean()
    assert agree > 0.97
    assert (occ_cc == 0).sum() > 0


@native
def test_voxel_traverse_matches_python():
    from apnerf_tpu.planning.traj import get_voxels_between_points

    start = np.array([0.05, 0.12, 0.07])
    end = np.array([0.93, 0.41, 0.88])
    sv = np.array([0, 1, 0], dtype=np.int32)
    ev = np.array([9, 4, 8], dtype=np.int32)
    py = np.array(get_voxels_between_points(start, end, sv, ev, 0.1))
    cc = voxel_traverse_native(start, end, sv, ev, 0.1)
    np.testing.assert_array_equal(py, cc)


def test_fallback_when_unavailable(monkeypatch):
    """planning still works when the native lib is missing."""
    import apnerf_tpu.native.lib as nl

    monkeypatch.setattr(nl, "_lib", None)
    monkeypatch.setattr(nl, "_tried", True)
    from apnerf_tpu.planning.dijkstra import Dijkstra

    pmap = np.zeros((10, 10), dtype=np.int32)
    d = Dijkstra(np.array([0, 0, 0, 1.0, 1.0, 1.0]), pmap, 0.1, 0.05)
    assert d.planning(0.2, 0.2, 0.8, 0.8) is not None
