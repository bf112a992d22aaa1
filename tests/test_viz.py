"""Visualization tests (panel composition, colorization, voxel mosaics,
video stitching)."""

import os

import numpy as np

from apnerf_tpu.viz.render_views import (
    colorize_depth,
    colorize_semantics,
    save_frames,
    side_by_side,
    stitch_video,
    voxel_slices,
)


def test_colorize_depth():
    d = np.linspace(0, 10, 64).reshape(8, 8)
    img = colorize_depth(d, max_depth=10)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_colorize_semantics_deterministic():
    sem = np.arange(16).reshape(4, 4) % 5
    a = colorize_semantics(sem, 5)
    b = colorize_semantics(sem, 5)
    np.testing.assert_array_equal(a, b)
    assert (a[0, 0] == 0).all()  # class 0 is black


def test_side_by_side():
    p1 = np.zeros((8, 8, 3), dtype=np.uint8)
    p2 = np.ones((8, 6), dtype=np.float32)  # grayscale float
    out = side_by_side([p1, p2], pad=2)
    assert out.shape == (8, 8 + 2 + 6, 3)
    assert out.dtype == np.uint8


def test_voxel_slices():
    b = np.zeros((8, 4, 8), dtype=bool)
    b[2, 2, 3] = True
    m = voxel_slices(b, axis=1, max_slices=4)
    assert m.ndim == 2 and m.max() == 255


def test_stitch_and_save(tmp_path):
    frames = [
        (np.random.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(4)
    ]
    gif = stitch_video(frames, str(tmp_path / "v.gif"), fps=4)
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
    paths = save_frames(frames, str(tmp_path / "frames"))
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)


def test_render_comparison_with_mapper(tmp_path):
    """Comparison panels through a real (tiny) mapper."""
    from tests.test_active_pipeline import AABB, tiny_pipeline_cfg
    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.sim.fake import FakeSim
    from apnerf_tpu.viz.render_views import render_comparison

    cfg = tiny_pipeline_cfg(tmp_path)
    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    m = ActiveNeRFMapper(cfg, sim, save_path=str(tmp_path / "out"), seed=0)
    m.initialization(initial_samples=4)
    poses = np.array([[-2.0, 1.5, -2.0, 0, 0, 0, 1.0]])
    frames = render_comparison(m, poses, scale=0.25)
    assert len(frames) == 1
    f = frames[0]
    assert f.dtype == np.uint8 and f.ndim == 3 and f.shape[2] == 3
    # six panels wide (gt/pred x rgb/depth/sem)
    assert f.shape[1] > 6 * 10


def test_interactive_viewer_scripted(tmp_path):
    """The interactive viewer (⇔ vis_nerf_habitat.py) drives headlessly:
    keys move the camera, frames render and land in out_dir, x quits."""
    import numpy as np

    import tests.test_active_pipeline as tap
    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.sim.fake import FakeSim
    from apnerf_tpu.viz.interactive import InteractiveViewer

    cfg = tap.tiny_pipeline_cfg(tmp_path)
    sim = FakeSim(aabb=tap.AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    m = ActiveNeRFMapper(cfg, sim, save_path=str(tmp_path / "v"), seed=0)
    m.initialization(initial_samples=3)
    viewer = InteractiveViewer(m, out_dir=str(tmp_path / "frames"),
                               scale=0.25)
    pos0 = viewer.pos.copy()
    frames = viewer.run_scripted("wqx")
    assert len(frames) == 2  # w and q render; x quits
    assert not np.allclose(viewer.pos, pos0)  # w moved the camera
    assert abs(viewer.yaw) > 0  # q yawed
    import os

    files = sorted(os.listdir(tmp_path / "frames"))
    assert len(files) == 2
    f = frames[0]
    assert f.ndim == 3 and f.shape[-1] == 3 and f.dtype == np.uint8
    # 4 panels: GT | rgb | depth | sem
    oh = int(cfg.img_h * 0.25)
    assert f.shape[1] > 3 * int(cfg.img_w * 0.25)


def test_make_video_composes_run_layout(tmp_path):
    """compose_demo_frames reads the mapper's viz layout and builds
    paneled frames (⇔ make_demo.py)."""
    import numpy as np
    import imageio.v2 as imageio

    from apnerf_tpu.viz.make_video import compose_demo_frames

    viz = tmp_path / "viz"
    (viz / "top").mkdir(parents=True)
    for sub in ("gt_rgb", "pd_rgb", "gt_dep", "pd_dep", "gt_sem", "pd_sem"):
        (viz / "fpv" / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        imageio.imwrite(viz / f"{i}.png",
                        (rng.rand(16, 16, 3) * 255).astype(np.uint8))
        imageio.imwrite(viz / "top" / f"{i}.png",
                        (rng.rand(16, 16, 3) * 255).astype(np.uint8))
        for sub in ("gt_rgb", "pd_rgb", "gt_dep", "pd_dep", "gt_sem",
                    "pd_sem"):
            imageio.imwrite(viz / "fpv" / sub / f"{i}.png",
                            (rng.rand(8, 8, 3) * 255).astype(np.uint8))
    frames = compose_demo_frames(str(tmp_path))
    assert len(frames) == 3
    f = frames[0]
    # tpv + top + 3 stacked fpv columns
    assert f.shape[1] >= 16 * 2 + 8 * 3
    assert f.dtype == np.uint8
