"""ReplaySim: recorded-trajectory playback through the active loop.

Records a FakeSim tour into the reference ``data<k>.npz`` schema
(``habitat_to_data.py:164-173``), then verifies (a) the facade serves the
exact recorded frames with snapped poses, and (b) the full
ActiveNeRFMapper loop runs end-to-end against the recording — the layer
that turns any cached reference trajectory into a drivable world.
"""

import numpy as np
import pytest

from apnerf_tpu.data.dataset import RayDataset
from apnerf_tpu.ops.rays import pose_matrix_from_quat
from apnerf_tpu.sim.fake import FakeSim
from apnerf_tpu.sim.replay import ReplaySim

from test_active_pipeline import AABB, tiny_pipeline_cfg


def _record_tour(tmp, n=14, img=32):
    """FakeSim tour around the room center -> reference-schema npz."""
    sim = FakeSim(aabb=AABB, img_w=img, img_h=img)
    poses = []
    for i in range(n):
        ang = np.deg2rad(360.0 * i / n)
        pos = np.array(
            [-2.0 + 0.8 * np.cos(ang), 1.5, -2.0 + 0.8 * np.sin(ang)]
        )
        quat = np.array([0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)])
        poses.append(np.concatenate([pos, quat]))
    imgs, deps, sems = sim.sample_images_from_poses(poses)
    mats = np.array([pose_matrix_from_quat(p[:3], p[3:]) for p in poses])
    ds = RayDataset(
        training=True, save_fp=str(tmp), width=img, height=img,
        max_images=n,
    )
    ds.update_data(imgs[..., :3], deps, sems, mats)
    return ds.save(), np.array(poses)


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rec")
    return _record_tour(tmp)


def test_replay_serves_recorded_frames(recording):
    npz, poses = recording
    rs = ReplaySim(npz)
    data = np.load(npz)
    # exact recorded poses -> exact recorded frames
    imgs, deps, sems = rs.sample_images_from_poses(poses[3:6])
    np.testing.assert_array_equal(imgs[..., :3], data["images"][3:6])
    np.testing.assert_array_equal(deps, data["depths"][3:6])
    np.testing.assert_array_equal(sems, data["semantics"][3:6])
    assert rs.last_match_err.max() < 1e-6
    # perturbed poses snap to the nearest recorded camera
    noisy = poses[7].copy()
    noisy[:3] += [0.05, -0.03, 0.04]
    snapped = rs.snap_poses([noisy])[0]
    np.testing.assert_allclose(snapped[:3], poses[7, :3], atol=1e-9)
    c2w_snap = pose_matrix_from_quat(snapped[:3], snapped[3:])
    c2w_rec = pose_matrix_from_quat(poses[7, :3], poses[7, 3:])
    np.testing.assert_allclose(c2w_snap, c2w_rec, atol=1e-7)
    imgs2, _, _ = rs.sample_images_from_poses([noisy])
    np.testing.assert_array_equal(imgs2[0][..., :3], data["images"][7])


def test_replay_facade_surface(recording):
    npz, poses = recording
    rs = ReplaySim(npz)
    assert rs.num_semantic_classes >= 2
    assert rs.check_navigability(poses[0, :3])
    assert not rs.check_navigability(poses[0, :3] + np.array([9.0, 0, 0]))
    path = rs.sample_path(poses[0, :3])
    assert path.shape[0] >= 2 and path.shape[1] == 3
    tpv = rs.render_tpv(poses[:2])
    assert len(tpv) == 2 and tpv[0].shape[-1] == 3
    tour = rs.tour_poses(5)
    assert tour.shape == (5, 7)
    est = rs.aabb_estimate()
    assert np.all(est[:3] < est[3:])
    rs.set_quad_state(poses[0])
    uv = rs.get_2d_point(poses[0, :3] - np.array([0, 0, 1.0]))
    assert uv.shape == (2,)


@pytest.mark.slow
def test_mapper_runs_on_replay(recording, tmp_path):
    """Full active loop against the recording: every supervised pose is a
    recorded camera, planning + retraining complete, metrics finite."""
    from apnerf_tpu.active.mapper import ActiveNeRFMapper

    npz, poses = recording
    rs = ReplaySim(npz, nav_radius=2.0)
    cfg = tiny_pipeline_cfg(tmp_path)
    cfg.img_w = cfg.img_h = rs.img_w
    cfg.test_loc = (tuple(poses[0, :3]), tuple(poses[5, :3]))
    cfg.global_origin = tuple(poses[0])
    m = ActiveNeRFMapper(
        cfg, rs, save_path=str(tmp_path / "out"), seed=3,
        eval_scale=0.25, unc_scale=0.25, max_samples_unc=16,
        checkpoint_every=10_000,
    )
    m.initialization(initial_samples=6)
    # supervision poses are recorded cameras, not the requested ring
    got = np.asarray(m.train_dataset.camtoworlds[: m.train_dataset.size])
    rec = np.array([pose_matrix_from_quat(p[:3], p[3:]) for p in poses])
    for c2w in got:
        assert min(np.abs(rec - c2w).max(axis=(1, 2))) < 1e-5
    m.nerf_training(10, initial_train=True, planning_step=-1)
    steps = m.planning(1, training_steps_per_step=6)
    assert steps >= 1
    errs = np.asarray(m.errors_hist, dtype=float)
    assert np.isfinite(errs).all()
    # the flown trajectory also supervised only at recorded cameras
    got2 = np.asarray(m.train_dataset.camtoworlds[: m.train_dataset.size])
    for c2w in got2:
        assert min(np.abs(rec - c2w).max(axis=(1, 2))) < 1e-5
