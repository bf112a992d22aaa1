"""Point-cloud-from-mesh tool tests (self-contained PLY I/O + sampling)."""

import numpy as np

from apnerf_tpu.eval.point_cloud import (
    build_point_cloud_from_mesh,
    read_ply,
    write_ply_points,
)


def _write_test_ply(path):
    """Two triangles with object ids 1 and 7, in habitat axes."""
    verts = [
        (0, 0, 0), (1, 0, 0), (0, 0, 1),   # face 0 (y=0 plane)
        (0, 1, 0), (1, 1, 0), (0, 1, 1),   # face 1 (y=1 plane)
    ]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            "element vertex 6\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 2\n"
            "property list uchar int vertex_indices\n"
            "property int object_id\n"
            "end_header\n"
        )
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write("3 0 1 2 1\n")
        f.write("3 3 4 5 7\n")


def test_read_ply_roundtrip(tmp_path):
    p = str(tmp_path / "mesh.ply")
    _write_test_ply(p)
    mesh = read_ply(p)
    assert mesh["vertices"].shape == (6, 3)
    np.testing.assert_array_equal(mesh["faces"], [[0, 1, 2], [3, 4, 5]])
    np.testing.assert_array_equal(mesh["object_ids"], [1, 7])


def test_build_point_cloud_axis_remap_and_colors(tmp_path):
    p = str(tmp_path / "mesh.ply")
    _write_test_ply(p)
    colors = {1: (1.0, 0.0, 0.0)}  # whitelist: only object 1
    out = str(tmp_path / "cloud.ply")
    pts, cols = build_point_cloud_from_mesh(
        p, colors, out_path=out, sampling_resolution=0.2
    )
    assert len(pts) > 3  # corners + surface samples
    # face 0 lives at habitat y=0 → world z = -y = 0; x=x; world y = z
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-9)
    assert pts[:, 0].min() >= -1e-9 and pts[:, 0].max() <= 1 + 1e-9
    np.testing.assert_array_equal(cols, np.tile([1.0, 0, 0], (len(pts), 1)))
    # object 7 skipped entirely (whitelist behavior)
    assert not np.any(np.abs(pts[:, 2] + 1.0) < 1e-6)
    # written file reads back
    cloud = read_ply(out)
    assert cloud["vertices"].shape == (len(pts), 3)


def test_points_lie_on_triangle_surface(tmp_path):
    p = str(tmp_path / "mesh.ply")
    _write_test_ply(p)
    pts, _ = build_point_cloud_from_mesh(
        p, {1: (0, 1, 0), 7: (0, 0, 1)}, sampling_resolution=0.15
    )
    # all points satisfy one of the two plane equations (world z = 0 or -1)
    z = pts[:, 2]
    assert np.all((np.abs(z) < 1e-9) | (np.abs(z + 1) < 1e-9))
    # barycentric containment on face 0: world (x, y) inside the triangle
    f0 = pts[np.abs(z) < 1e-9]
    assert np.all(f0[:, 0] + f0[:, 1] <= 1 + 1e-6)
