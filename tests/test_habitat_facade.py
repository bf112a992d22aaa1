"""Tests for the pure-numpy parts of the Habitat facade — importable and
verifiable without habitat-sim (which this environment cannot install).
Oracles: quaternion algebra identities and the pose helpers already
tested elsewhere (ops/rays.pose_matrix_from_quat)."""

import numpy as np
import pytest

from apnerf_tpu.ops.rays import pose_matrix_from_quat
from apnerf_tpu.sim.habitat import (
    TOP_DOWN_CAMERA_QUAT,
    look_at_quaternion,
    pose7_to_state_quat,
)


def _quat_wxyz_to_matrix(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_pose7_normalizes_and_reorders():
    pose = np.array([1.0, 2.0, 3.0, 0.0, 2.0, 0.0, 0.0])  # unnormalized xyzw
    pos, q = pose7_to_state_quat(pose)
    np.testing.assert_allclose(pos, [1, 2, 3])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0)
    # xyzw (0,1,0,0)*2 → wxyz (0, 0, 1, 0)
    np.testing.assert_allclose(q, [0, 0, 1, 0], atol=1e-12)


def test_pose7_matches_pose_matrix_rotation():
    rng = np.random.RandomState(3)
    for _ in range(5):
        quat_xyzw = rng.randn(4)
        pose = np.concatenate([rng.randn(3), quat_xyzw])
        _, q_wxyz = pose7_to_state_quat(pose)
        R_a = _quat_wxyz_to_matrix(q_wxyz)
        R_b = pose_matrix_from_quat(pose[:3], quat_xyzw)[:3, :3]
        np.testing.assert_allclose(R_a, R_b, atol=1e-9)


def test_pose7_rejects_zero_quaternion():
    with pytest.raises(ValueError):
        pose7_to_state_quat(np.zeros(7))


def test_look_at_points_camera_at_target():
    rng = np.random.RandomState(0)
    for _ in range(10):
        eye = rng.randn(3) * 2
        target = rng.randn(3) * 2
        if np.linalg.norm(eye - target) < 1e-3:
            continue
        q = look_at_quaternion(eye, target)
        R = _quat_wxyz_to_matrix(q)
        # camera -z axis must point from eye toward target
        fwd = R @ np.array([0.0, 0.0, -1.0])
        want = (target - eye) / np.linalg.norm(target - eye)
        np.testing.assert_allclose(fwd, want, atol=1e-9)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
        # up-ish: camera +y has non-negative world-y unless degenerate
        upy = (R @ np.array([0.0, 1.0, 0.0]))[1]
        assert upy > -1e-9


def test_top_down_quat_looks_straight_down():
    R = _quat_wxyz_to_matrix(TOP_DOWN_CAMERA_QUAT)
    fwd = R @ np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(fwd, [0.0, -1.0, 0.0], atol=1e-7)
