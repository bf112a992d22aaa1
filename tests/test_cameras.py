"""Lens un/distortion tests — distort→undistort roundtrips (the same
oracle strategy nerfacc's tests/test_camera.py uses against OpenCV)."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.cameras import (
    opencv_lens_distortion,
    opencv_lens_distortion_fisheye,
    opencv_lens_undistortion,
    opencv_lens_undistortion_fisheye,
)


def _grid_uv(n=21, lim=0.4):
    u, v = np.meshgrid(np.linspace(-lim, lim, n), np.linspace(-lim, lim, n))
    return jnp.asarray(np.stack([u, v], axis=-1).reshape(-1, 2), jnp.float32)


def test_undistortion_inverts_distortion():
    uv = _grid_uv()
    params = jnp.asarray([0.1, -0.05, 0.01, -0.01, 0.002, 0.0, 0.0, 0.0])
    distorted = opencv_lens_distortion(uv, params)
    recovered = opencv_lens_undistortion(distorted, params)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(uv), atol=1e-5)


def test_undistortion_param_padding():
    """N in {0, 1, 2, 4} params zero-pad to the 8-param model."""
    uv = _grid_uv(n=7)
    assert np.allclose(
        np.asarray(opencv_lens_undistortion(uv, jnp.zeros((0,)))), np.asarray(uv)
    )
    k1 = jnp.asarray([0.08])
    d = opencv_lens_distortion(uv, k1)
    r = opencv_lens_undistortion(d, k1)
    np.testing.assert_allclose(np.asarray(r), np.asarray(uv), atol=1e-5)
    # padded form agrees with explicit 8-param form
    k1_full = jnp.asarray([0.08, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(opencv_lens_undistortion(d, k1)),
        np.asarray(opencv_lens_undistortion(d, k1_full)),
        atol=1e-7,
    )


def test_zero_params_identity():
    uv = _grid_uv(n=5)
    z = jnp.zeros((8,))
    np.testing.assert_allclose(
        np.asarray(opencv_lens_distortion(uv, z)), np.asarray(uv), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(opencv_lens_undistortion(uv, z)), np.asarray(uv), atol=1e-7
    )


def test_fisheye_roundtrip():
    uv = _grid_uv(n=11, lim=0.3)
    params = jnp.asarray([0.05, -0.01, 0.002, -0.0005])
    d = opencv_lens_distortion_fisheye(uv, params)
    r = opencv_lens_undistortion_fisheye(d, params, iters=20)
    np.testing.assert_allclose(np.asarray(r), np.asarray(uv), atol=1e-4)


def test_undistortion_jits_and_vmaps():
    uv = _grid_uv(n=5)
    params = jnp.asarray([0.1, -0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    f = jax.jit(lambda uv: opencv_lens_undistortion(uv, params))
    out = f(uv)
    assert out.shape == uv.shape and np.isfinite(np.asarray(out)).all()
