"""Eval subsystem tests: VoxelGrid, frontier detection, offline eval."""

import json
import os

import numpy as np

from apnerf_tpu.eval.frontier import (
    detect_objects,
    find_frontiers,
    frontier_exploration,
    load_gt_objects,
)
from apnerf_tpu.eval.offline_eval import run_eval
from apnerf_tpu.eval.voxel_grid import VoxelGrid, bresenhamline
from apnerf_tpu.sim.fake import Box, FakeSim


def test_bresenhamline_3d():
    line = bresenhamline(np.array([[0, 0, 0]]), np.array([[5, 0, 0]]))
    assert line.shape == (5, 3)
    assert list(line[-1]) == [5, 0, 0]
    diag = bresenhamline(np.array([[0, 0, 0]]), np.array([[3, 3, 3]]))
    assert list(diag[-1]) == [3, 3, 3]


def test_voxel_grid_insert_and_pointcloud():
    vg = VoxelGrid(grid_size=20, grid_resolution=0.5, occupancy=True,
                   stride=2)
    # flat wall 2 m in front of the camera (camera looks down -z)
    depth = np.full((32, 32), 2.0)
    pose = np.array([0.0, 1.0, 0.0, 0, 0, 0, 1.0])
    assert vg.insert_depth_image(depth, pose)
    assert vg.initialized
    pts = vg.get_pointcloud()
    assert len(pts) > 0
    # hit points concentrate near z = -2 (center pixel exactly; corners
    # land farther out along their slanted rays at hfov 90°)
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1] - 1.0))]
    assert abs(center[2] + 2.0) < 0.5
    # free space carved between camera and wall
    grid2d = vg.get_occupancy_grid()
    assert (grid2d == 0).sum() > 0 and (grid2d == 1).sum() > 0
    assert (grid2d == -1).sum() > 0


def test_voxel_grid_nan_masking():
    vg = VoxelGrid(grid_size=20, grid_resolution=0.5, occupancy=False)
    depth = np.full((16, 16), np.nan)
    assert not vg.insert_depth_image(depth, np.array([0, 0, 0, 0, 0, 0, 1.0]))
    assert not vg.initialized


def test_find_frontiers():
    grid = -np.ones((10, 10), dtype=np.int8)
    grid[4:7, 4:7] = 0  # free island in unknown space
    f = find_frontiers(grid)
    # all border free cells are frontiers; interior (5,5) is not
    assert [5, 5] not in f.tolist()
    assert [4, 4] in f.tolist()
    assert len(f) == 8


def test_detect_objects_matching():
    vg = VoxelGrid(grid_size=20, grid_resolution=0.1, occupancy=False,
                   stride=1)
    depth = np.full((8, 8), 1.0)
    depth[:4] = np.nan
    vg.insert_depth_image(depth, np.array([0, 0, 0, 0, 0, 0, 1.0]))
    # object cloud sits near (0, -0.3, -1); GT at that point matches
    gt = {0: [[0.0, -0.3, -1.0]], 1: []}
    counts = detect_objects([vg, VoxelGrid(20, 0.1, False)], gt,
                            det_dist_thresh=1.0, cluster_eps=0.5)
    assert counts[0] >= 1 and counts[1] == 0


def test_frontier_exploration_on_fakesim():
    sim = FakeSim(aabb=(-4.0, 0.0, -4.0, 0.0, 3.0, 0.0), img_w=32, img_h=32)
    gt_locs = {i: [] for i in range(8)}
    det, occ = frontier_exploration(
        sim, np.array([-2.0, 1.5, -2.0]), num_steps=2, num_classes=8,
        gt_obj_locs=gt_locs, grid_size=20, grid_resolution=0.25,
        max_depth=8.0,
    )
    grid = occ.get_occupancy_grid()
    assert (grid == 1).sum() > 0  # saw walls
    assert (grid == 0).sum() > 0  # carved free space
    assert len(det) >= 1


def test_offline_eval_replay(tmp_path):
    # build a tiny saved trajectory with FakeSim + reference npz schema
    sim = FakeSim(aabb=(-4.0, 0.0, -4.0, 0.0, 3.0, 0.0), img_w=32, img_h=32)
    from apnerf_tpu.ops.rays import pose_matrix_from_quat

    poses, mats = [], []
    for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        q = [0, np.sin(ang / 2), 0, np.cos(ang / 2)]
        p = np.array([-2.0, 1.5, -2.0] + q)
        poses.append(p)
        mats.append(pose_matrix_from_quat(p[:3], p[3:]))
    rgbs, depths, sems = sim.sample_images_from_poses(poses)
    npz = tmp_path / "data0.npz"
    np.savez(npz, images=rgbs[..., :3], depths=depths, semantics=sems,
             camtoworlds=np.array(mats), K=sim.K,
             bootstrap_indices=np.array([]))

    # GT objects: the furniture boxes (classes 4..7) at their centers
    gt = {i: [] for i in range(8)}
    for b in sim.boxes:
        if b.sem >= 4:
            gt[b.sem - 1].append(((b.mn + b.mx) / 2).tolist())
    curve = run_eval(str(npz), gt, num_classes=8, num_steps=3,
                     warmup_frames=3, frames_per_step=3,
                     det_dist_thresh=1.5, max_depth=8.0)
    assert curve[0] == 0
    assert np.all(np.diff(curve) >= 0)  # monotone
    assert curve[-1] >= 1  # detected at least one furniture box


def test_load_gt_objects(tmp_path):
    p = tmp_path / "objects_test.json"
    json.dump(
        {"1": {"label": 2, "location": [1, 2, 3]},
         "2": {"label": 2, "location": [4, 5, 6]},
         "3": {"label": 0, "location": [0, 0, 0]}},
        open(p, "w"),
    )
    locs, nums = load_gt_objects(str(p), 4)
    assert nums[2] == 2 and nums[0] == 1 and nums[3] == 0
    assert locs[2] == [[1, 2, 3], [4, 5, 6]]
