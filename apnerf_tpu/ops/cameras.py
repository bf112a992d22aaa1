"""OpenCV lens distortion / undistortion (pinhole + fisheye).

Capability parity with the reference's camera ops
(``perception/nerfacc/nerfacc/cameras.py:13-211`` and the CUDA Newton
solver ``cuda/csrc/camera.cu:10-183`` / ``include/utils_camera.cuh``),
re-expressed as pure jnp: the per-pixel Newton iteration becomes a
fixed-count unrolled vector loop (static shapes, jit/vmap friendly; the
active pipeline itself is pinhole-only, so this is an offline-dataset
capability).

Parameter conventions (OpenCV):
  * pinhole: N ∈ {0, 1, 2, 4, 8} → {k1, k2, p1, p2, k3, k4, k5, k6},
    zero-padded.
  * fisheye: {k1, k2, k3, k4} (θ-polynomial model).
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_params(params: jnp.ndarray, n: int) -> jnp.ndarray:
    assert params.shape[-1] in (0, 1, 2, 4, 8), params.shape
    if params.shape[-1] < n:
        pad = [(0, 0)] * (params.ndim - 1) + [(0, n - params.shape[-1])]
        params = jnp.pad(params, pad)
    return params


def opencv_lens_distortion(uv: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Forward distortion of {k1, k2, p1, p2, k3, k4, k5, k6}
    (``cameras.py:74-91``). Serves as the oracle for the Newton inverse."""
    params = _pad_params(params, 8)
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    ratial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
    fx = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
    fy = 2 * p2 * u * v + p1 * (r2 + 2 * v * v)
    return jnp.stack([u * ratial + fx, v * ratial + fy], axis=-1)


def _residual_and_jacobian(x, y, xd, yd, params):
    """fx, fy and the 2x2 Jacobian of the distortion residual
    (``cameras.py:124-172`` / ``utils_camera.cuh``)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)
    r = x * x + y * y
    alpha = 1.0 + r * (k1 + r * (k2 + r * k3))
    beta = 1.0 + r * (k4 + r * (k5 + r * k6))
    d = alpha / beta
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
    alpha_r = k1 + r * (2.0 * k2 + r * (3.0 * k3))
    beta_r = k4 + r * (2.0 * k5 + r * (3.0 * k6))
    d_r = (alpha_r * beta - alpha * beta_r) / (beta * beta)
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r
    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def opencv_lens_undistortion(
    uv: jnp.ndarray,
    params: jnp.ndarray,
    eps: float = 1e-6,
    iters: int = 10,
) -> jnp.ndarray:
    """Newton-iterate the inverse distortion (``cameras.py:13-46``,
    ``camera.cu:10-82``). Fixed ``iters`` unrolled steps; degenerate
    Jacobians take a zero step like the reference."""
    if params.shape[-1] == 0:
        return uv
    params = _pad_params(params, 8)
    params = jnp.broadcast_to(params, uv.shape[:-1] + (8,))
    x0, y0 = uv[..., 0], uv[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, x0, y0, params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        ok = jnp.abs(denom) > eps
        safe = jnp.where(ok, denom, 1.0)
        x = x + jnp.where(ok, (fx * fy_y - fy * fx_y) / safe, 0.0)
        y = y + jnp.where(ok, (fy * fx_x - fx * fy_x) / safe, 0.0)
    return jnp.stack([x, y], axis=-1)


def opencv_lens_distortion_fisheye(
    uv: jnp.ndarray, params: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Fisheye θ-polynomial forward distortion (``cameras.py:94-120``)."""
    assert params.shape[-1] == 4
    k1, k2, k3, k4 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u * u + v * v)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / jnp.maximum(r, eps)
    return uv * scale[..., None]


def opencv_lens_undistortion_fisheye(
    uv: jnp.ndarray,
    params: jnp.ndarray,
    eps: float = 1e-6,
    iters: int = 10,
) -> jnp.ndarray:
    """Newton inverse of the fisheye model (``camera.cu:84-183``): solve
    θ from θ_d by 1-D Newton, then rescale."""
    assert params.shape[-1] == 4
    k1, k2, k3, k4 = jnp.moveaxis(
        jnp.broadcast_to(params, uv.shape[:-1] + (4,)), -1, 0
    )
    u, v = uv[..., 0], uv[..., 1]
    theta_d = jnp.sqrt(u * u + v * v)
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        poly = 1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = 3 * k1 * t2 + 5 * k2 * t2 * t2 + 7 * k3 * t2 ** 3 + 9 * k4 * t2 ** 4
        f = theta * poly - theta_d
        fp = poly + dpoly
        ok = jnp.abs(fp) > eps
        theta = theta - jnp.where(ok, f / jnp.where(ok, fp, 1.0), 0.0)
    scale = jnp.tan(theta) / jnp.maximum(theta_d, eps)
    return uv * scale[..., None]
