"""FakeSim tests: rendering sanity and facade behavior."""

import numpy as np

from apnerf_tpu.sim.fake import Box, FakeSim


def _sim():
    return FakeSim(aabb=(-4.0, 0.0, -4.0, 0.0, 3.0, 0.0), img_w=48, img_h=48)


def test_render_shapes_and_types():
    sim = _sim()
    pose = np.array([-2.0, 1.5, -2.0, 0, 0, 0, 1.0])
    rgbs, depths, sems = sim.sample_images_from_poses([pose, pose])
    assert rgbs.shape == (2, 48, 48, 4) and rgbs.dtype == np.uint8
    assert depths.shape == (2, 48, 48) and depths.dtype == np.float32
    assert sems.shape == (2, 48, 48)
    # identical poses → identical renders (deterministic)
    np.testing.assert_array_equal(rgbs[0], rgbs[1])


def test_depth_geometry():
    """Camera at room center looking down -z: the -z wall is 2 m away;
    center-pixel depth must be ~2 m (inner wall face at z=-4)."""
    sim = _sim()
    pose = np.array([-2.0, 1.5, -2.0, 0, 0, 0, 1.0])
    _, depth, sem = sim.sample_images_from_poses([pose])
    c = depth[0, 24, 24]
    assert abs(c - 2.0) < 0.1
    assert sem[0, 24, 24] == 3  # wall class


def test_semantics_floor_visible_when_looking_down():
    sim = _sim()
    # look straight down: quaternion for -90° about x
    q = [np.sin(-np.pi / 4), 0, 0, np.cos(-np.pi / 4)]
    pose = np.array([-2.0, 1.5, -2.0] + q)
    _, depth, sem = sim.sample_images_from_poses([pose])
    assert sem[0, 24, 24] == 1  # floor
    assert abs(depth[0, 24, 24] - 1.5) < 0.05


def test_views_consistency_multi_view():
    """The same world point must produce consistent depth from two
    distances (view-consistent geometry — what the NeRF will learn)."""
    sim = _sim()
    p1 = np.array([-2.0, 1.5, -1.0, 0, 0, 0, 1.0])
    p2 = np.array([-2.0, 1.5, -2.0, 0, 0, 0, 1.0])
    _, d1, _ = sim.sample_images_from_poses([p1])
    _, d2, _ = sim.sample_images_from_poses([p2])
    assert abs((d1[0, 24, 24] - d2[0, 24, 24]) - 1.0) < 0.05


def test_navigability_and_path():
    sim = _sim()
    assert sim.check_navigability(np.array([[-2.0, 1.5, -2.0]]))
    assert not sim.check_navigability(np.array([[10.0, 1.5, -2.0]]))
    path = sim.sample_path(np.array([-2.0, 1.5, -2.0]))
    assert path.shape[1] == 3 and len(path) >= 2


def test_tpv_renders():
    sim = _sim()
    poses = np.tile(np.array([-2.0, 1.0, -2.0, 0, 0, 0, 1.0]), (3, 1))
    tpv = sim.render_tpv(poses)
    top = sim.render_top_tpv(poses)
    assert len(tpv) == 3 and tpv[0].shape == (48, 48, 3)
    assert len(top) == 3 and top[0].shape == (48, 48, 3)
    # top-down view must mostly see the floor class region colors
    _, _, sem = sim.sample_images_from_poses(
        [np.concatenate([[-2.0, 2.9, -2.0],
                         [np.sin(-np.pi / 4), 0, 0, np.cos(-np.pi / 4)]])]
    )
    assert (sem == 1).mean() > 0.2


def test_custom_boxes_semantics():
    boxes = [Box([-1, 0, -1], [0, 1, 0], [1, 0, 0], 7)]
    sim = FakeSim(aabb=(-4, 0, -4, 0, 3, 0), img_w=32, img_h=32, boxes=boxes)
    assert sim.num_semantic_classes == 8
    pose = np.array([-0.5, 0.5, 1.5, 0, 0, 0, 1.0])
    rgb, depth, sem = sim.sample_images_from_poses([pose])
    assert sem[0, 16, 16] == 7
    assert abs(depth[0, 16, 16] - 1.5) < 0.1


def test_hard_room_scene():
    """hard_room (sim/fake.py): the adversarial quality-anchor scene —
    dense textured clutter, deterministic, many semantic classes, and
    textures that default_room does not have."""
    from apnerf_tpu.sim.fake import hard_room

    aabb = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)
    sim = FakeSim(aabb=aabb, img_w=64, img_h=64, boxes=hard_room(aabb))
    assert sim.num_semantic_classes > 20
    pose = np.array([-4.0, 1.5, -4.0, 0, 0, 0, 1.0])
    r1, d1, s1 = sim.render_pose(pose)
    r2, d2, s2 = sim.render_pose(pose)
    np.testing.assert_array_equal(r1, r2)  # deterministic
    assert len(np.unique(s1)) >= 5  # clutter visible
    assert np.isfinite(d1).all()
    # checkerboard texture: many distinct shades on textured surfaces
    smooth = FakeSim(aabb=aabb, img_w=64, img_h=64)
    rs, _, _ = smooth.render_pose(pose)
    assert len(np.unique(r1[..., 0])) > len(np.unique(rs[..., 0]))
