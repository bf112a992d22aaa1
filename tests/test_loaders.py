"""Dataset loader tests with synthesized on-disk fixtures."""

import json
import os
import struct

import numpy as np
import pytest

from apnerf_tpu.data.colmap import (
    load_colmap_poses,
    qvec_to_rotmat,
    read_cameras_bin,
    read_images_bin,
)


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def _make_blender_subject(root, subject, split, n=3, with_time=False):
    d = os.path.join(root, subject)
    os.makedirs(os.path.join(d, split.replace("transforms_", "")), exist_ok=True)
    frames = []
    for i in range(n):
        rel = f"./{split}/r_{i}"
        img = (np.random.rand(8, 8, 4) * 255).astype(np.uint8)
        _write_png(os.path.join(d, f"{split}/r_{i}.png"), img)
        frame = {
            "file_path": rel,
            "transform_matrix": np.eye(4).tolist(),
        }
        if with_time:
            frame["time"] = i / max(n - 1, 1)
        frames.append(frame)
    meta = {"camera_angle_x": 0.8, "frames": frames}
    with open(os.path.join(d, f"transforms_{split}.json"), "w") as f:
        json.dump(meta, f)


def test_nerf_synthetic_loader(tmp_path):
    from apnerf_tpu.data.nerf_synthetic import load_subject, rays_for_pixels

    _make_blender_subject(str(tmp_path), "lego", "train", n=3)
    data = load_subject(str(tmp_path), "lego", "train")
    assert data.images.shape == (3, 8, 8, 4)
    assert data.camtoworlds.shape == (3, 4, 4)
    assert data.focal == pytest.approx(0.5 * 8 / np.tan(0.4))
    rays = rays_for_pixels(data, np.array([0, 1]), np.array([3, 4]),
                           np.array([2, 5]))
    assert rays.origins.shape == (2, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), 1.0, rtol=1e-5
    )


def test_dnerf_loader(tmp_path):
    from apnerf_tpu.data.dnerf_synthetic import load_dnerf_subject

    _make_blender_subject(str(tmp_path), "jump", "train", n=4, with_time=True)
    data = load_dnerf_subject(str(tmp_path), "jump", "train")
    assert data.times.shape == (4,)
    assert data.times[0] == 0.0 and data.times[-1] == 1.0


def _write_colmap_model(sparse_dir, n_images=4):
    os.makedirs(sparse_dir, exist_ok=True)
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 16, 12))  # PINHOLE 16x12
        f.write(struct.pack("<4d", 10.0, 10.0, 8.0, 6.0))
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # identity quat
            f.write(struct.pack("<3d", float(i), 0.0, 0.0))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points


def test_colmap_reader(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse)
    cams = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 16
    imgs = read_images_bin(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 4 and imgs[1].name == "img_000.png"
    np.testing.assert_allclose(
        qvec_to_rotmat(np.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-12
    )
    c2ws, K, names = load_colmap_poses(sparse)
    assert c2ws.shape == (4, 4, 4)
    assert K[0, 0] == 10.0
    assert names == sorted(names)
    # w2c translation (i, 0, 0) with identity R → c2w translation (-i, 0, 0)
    np.testing.assert_allclose(c2ws[2][:3, 3], [-2, 0, 0], atol=1e-9)
    # OpenGL flip applied: y and z axes negated
    np.testing.assert_allclose(c2ws[0][:3, :3], np.diag([1, -1, -1]),
                               atol=1e-12)


def test_360_loader(tmp_path):
    from apnerf_tpu.data.nerf_360 import load_360_scene

    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_model(sparse, n_images=6)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    for i in range(6):
        _write_png(str(img_dir / f"img_{i:03d}.png"),
                   (np.random.rand(12, 16, 3) * 255).astype(np.uint8))
    train = load_360_scene(str(tmp_path), factor=1, split="train",
                           test_every=3)
    test = load_360_scene(str(tmp_path), factor=1, split="test",
                          test_every=3)
    assert len(train.images) == 4 and len(test.images) == 2
    # normalized: camera centers inside the unit ball
    assert np.linalg.norm(train.camtoworlds[:, :3, 3], axis=1).max() <= 1 + 1e-6
