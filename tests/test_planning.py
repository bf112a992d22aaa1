"""Planning stack tests: cost map, Dijkstra, MinSnap, SE3, trajectory
sampling."""

import numpy as np
import pytest

from apnerf_tpu.planning.cost_map import (
    bresenham,
    depth_scan_angles,
    generate_ray_casting_grid_map,
    update_cost_map,
)
from apnerf_tpu.planning.dijkstra import Dijkstra
from apnerf_tpu.planning.minsnap import MinSnap
from apnerf_tpu.planning.se3_control import SE3Control
from apnerf_tpu.planning.traj import (
    build_path_map,
    collision_checker,
    dilate3x3,
    get_voxels_between_points,
    sample_traj,
    voxels2world,
    world2voxels,
)


def test_bresenham_docstring_case():
    # the reference's own doctest case (depth_to_grid.py:36-39)
    pts = bresenham((4, 4), (6, 10))
    expected = [[4, 4], [4, 5], [5, 6], [5, 7], [5, 8], [6, 9], [6, 10]]
    assert [list(p) for p in pts] == expected


def test_bresenham_straight_and_reverse():
    pts = bresenham((0, 0), (5, 0))
    assert [list(p) for p in pts] == [[i, 0] for i in range(6)]
    ptsr = bresenham((5, 0), (0, 0))
    assert [list(p) for p in ptsr] == [[i, 0] for i in range(5, -1, -1)]


def test_ray_casting_map_marks_free_and_occupied():
    aabb = np.array([0.0, 0.0, 0.0, 4.0, 4.0, 4.0])
    # one beam from the center cell (10, 10) to endpoint world (2.0, 3.8)
    occ = generate_ray_casting_grid_map(
        np.array([2.0]), np.array([3.8]), 20, 20, 10, 10, aabb, 0.2
    )
    assert occ[10, 10] == 0.0  # sensor cell free
    assert occ[10, 19] == 1.0  # endpoint occupied
    assert occ[10, 15] == 0.0  # along the beam free
    assert occ[0, 0] == 0.5  # untouched unknown


def test_update_cost_map():
    aabb = np.array([0.0, 0.0, 0.0, 4.0, 4.0, 4.0])
    cost = np.full((20, 20), 0.5)
    depth = np.full(8, 1.0)
    angle = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    w_loc = np.array([2.0, 1.0, 2.0])
    g_loc = np.array([10, 5, 10])
    cost, visiting = update_cost_map(cost, depth, angle, g_loc, w_loc, aabb, 0.2)
    assert (cost == 1).sum() > 0
    assert (cost == 0).sum() > 0
    assert set(np.unique(visiting)) <= {0.0, 1.0}
    assert visiting.sum() > 0


def test_depth_scan_angles():
    a = depth_scan_angles(640)
    assert a.shape == (640,)
    assert a[0] == pytest.approx(np.arctan(319.5 / 320))
    assert a[-1] == pytest.approx(-np.arctan(319.5 / 320))


def test_dijkstra_routes_around_wall():
    pmap = np.zeros((20, 20), dtype=np.int32)
    pmap[10, 2:18] = 1  # wall with gaps at the edges
    aabb = np.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0])
    d = Dijkstra(aabb, pmap, 0.1, 0.05)
    path = d.planning(0.5, 0.5, 1.5, 0.5)
    assert path is not None
    rx, ry = path
    # path must dodge the wall row x=1.0 in the blocked column range
    cells = set(zip((np.array(rx) / 0.1).round().astype(int),
                    (np.array(ry) / 0.1).round().astype(int)))
    assert not any(pmap[x, y] for x, y in cells)
    # endpoints: path is returned goal→start
    assert rx[0] == pytest.approx(1.5) and rx[-1] == pytest.approx(0.5)


def test_dijkstra_unreachable():
    pmap = np.zeros((10, 10), dtype=np.int32)
    pmap[5, :] = 1  # full wall
    aabb = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    d = Dijkstra(aabb, pmap, 0.1, 0.05)
    assert d.planning(0.2, 0.5, 0.8, 0.5) is None


def test_minsnap_hits_waypoints_and_boundary_conditions():
    pts = np.array([[0, 0, 1], [1, 0, 1], [2, 1, 1], [3, 1, 1.5]])
    yaw = np.linspace(2 * np.pi, 0, 4)
    ms = MinSnap(points=pts, yaw_angles=yaw, v_avg=0.5)
    assert ms.initialize() and not ms.null
    # waypoints hit at keyframe times
    for i, t in enumerate(ms.t_keyframes):
        out = ms.update(t)
        np.testing.assert_allclose(out["x"], pts[i], atol=1e-6)
    # zero boundary velocity/acceleration
    np.testing.assert_allclose(ms.update(0.0)["x_dot"], 0, atol=1e-8)
    np.testing.assert_allclose(ms.update(0.0)["x_ddot"], 0, atol=1e-8)
    tf = ms.t_keyframes[-1]
    np.testing.assert_allclose(ms.update(tf)["x_dot"], 0, atol=1e-6)
    # velocity continuity at an interior knot
    t1 = ms.t_keyframes[1]
    v_before = ms.update(t1 - 1e-6)["x_dot"]
    v_after = ms.update(t1 + 1e-6)["x_dot"]
    np.testing.assert_allclose(v_before, v_after, atol=1e-3)
    # yaw endpoints
    assert ms.update(0.0)["yaw"] == pytest.approx(2 * np.pi, abs=1e-6)
    assert ms.update(tf)["yaw"] == pytest.approx(0.0, abs=1e-4)


def test_minsnap_single_point_null():
    ms = MinSnap(points=np.array([[1.0, 2.0, 3.0]]), v_avg=0.5)
    assert ms.initialize() and ms.null
    np.testing.assert_allclose(ms.update(0.5)["x"], [1, 2, 3])


def test_minsnap_dedupes_close_waypoints():
    pts = np.array([[0, 0, 1], [0, 0, 1.0001], [1, 0, 1]])
    ms = MinSnap(points=pts, v_avg=0.5)
    assert ms.points.shape[0] == 2


def test_se3_update_ref_hover_and_accel():
    ctrl = SE3Control()
    flat = {
        "x": np.zeros(3), "x_dot": np.zeros(3), "x_ddot": np.zeros(3),
        "x_dddot": np.zeros(3), "x_ddddot": np.zeros(3),
        "yaw": 0.0, "yaw_dot": 0.0, "yaw_ddot": 0.0,
    }
    out = ctrl.update_ref(0.0, flat)
    # hover: identity attitude, thrust = m*g, zero rates
    np.testing.assert_allclose(out["cmd_q"], [0, 0, 0, 1], atol=1e-9)
    assert out["cmd_thrust"] == pytest.approx(0.03 * 9.81)
    np.testing.assert_allclose(out["cmd_w"], 0, atol=1e-12)
    # accelerate +x: quad pitches (rotation about y)
    flat["x_ddot"] = np.array([2.0, 0.0, 0.0])
    out2 = ctrl.update_ref(0.0, flat)
    q = out2["cmd_q"]
    assert abs(q[1]) > 0.05 and abs(q[0]) < 1e-9 and abs(q[2]) < 1e-9
    # yaw 90°: rotation about z
    flat["x_ddot"] = np.zeros(3)
    flat["yaw"] = np.pi / 2
    out3 = ctrl.update_ref(0.0, flat)
    np.testing.assert_allclose(
        out3["cmd_q"], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-9
    )


def test_voxel_traversal_and_collision():
    # straight line through 10 voxels
    vox = get_voxels_between_points(
        np.array([0.05, 0.05, 0.05]), np.array([0.95, 0.05, 0.05]),
        np.array([0, 0, 0]), np.array([9, 0, 0]), 0.1,
    )
    vox = np.array(vox)
    assert vox[-1][0] >= 9
    assert np.all(vox[:, 1] == 0) and np.all(vox[:, 2] == 0)

    grid = np.zeros((1, 10, 10, 10), dtype=bool)
    flat = {"x": np.stack([np.array([0.05, 0.05, 0.05]),
                           np.array([0.95, 0.05, 0.05])])}
    aabb = np.zeros(6)
    aabb[3:] = 1.0
    assert not collision_checker(grid, flat, 0.1, aabb)
    grid[0, 5, 0, 0] = True
    assert collision_checker(grid, flat, 0.1, aabb)


def test_dilate3x3():
    b = np.zeros((5, 5), dtype=np.int32)
    b[2, 2] = 1
    d = dilate3x3(b)
    assert d[1:4, 1:4].all() and d.sum() == 9


def test_sample_traj_end_to_end():
    rng = np.random.RandomState(0)
    X = Y = 30
    Z = 16
    grids = np.zeros((2, X, Y, Z), dtype=bool)
    # border walls at slice z=8
    grids[:, 0, :, 8] = True
    grids[:, -1, :, 8] = True
    grids[:, :, 0, 8] = True
    grids[:, :, -1, 8] = True
    aabb = np.array([0.0, 0.0, 0.0, 6.0, 6.0, 3.2])  # xzy-swapped layout
    current = np.array([3.0, 3.0, 1.5])
    vm = np.zeros((X, Y))
    trajs = sample_traj(
        voxel_grid=grids, current_state=current, N_traj=3, aabb=aabb,
        cost_map=np.full((X, Y), 0.5), visiting_map=vm,
        N_sample_disc=20, voxel_grid_size=0.2, rng=rng,
    )
    assert len(trajs) == 3
    for t in trajs:
        assert t.shape[1] == 7
        assert t.shape[0] >= 40  # ≥20 along + 20 spin
        # quaternions normalized
        np.testing.assert_allclose(
            np.linalg.norm(t[:, 3:], axis=1), 1.0, atol=1e-6
        )
        # last 20 poses share one position (the spin)
        np.testing.assert_allclose(
            t[-20:, :3], np.tile(t[-1, :3], (20, 1)), atol=1e-9
        )
        # spin covers 360°: first and last spin quats match (0° vs 360°)
        np.testing.assert_allclose(
            np.abs(np.dot(t[-20, 3:], t[-1, 3:])), 1.0, atol=1e-6
        )
        # flying at ~1.7 m (xzy → habitat y)
        assert np.all(np.abs(t[:-20, 1] - 1.7) < 0.5)


def test_world_voxel_roundtrip():
    x = np.array([1.25, 0.61, 2.9])
    v = world2voxels(x, 0.25)
    assert list(v) == [5, 2, 11]
    np.testing.assert_allclose(voxels2world(v, 0.25), [1.25, 0.5, 2.75])
