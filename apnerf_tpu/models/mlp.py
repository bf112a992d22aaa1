"""Vanilla / time-conditioned NeRF MLP fields.

Capability parity with ``perception/models/radiance_fields/mlp.py``:
  * ``SinusoidalEncoder`` (``mlp.py:168-203``): optional identity ++
    sin/cos of x scaled by 2^[min_deg, max_deg).
  * ``NerfMLP`` (``mlp.py:114-165``): 8×256 trunk with a skip connection at
    layer 4, sigma head, and a 1-hidden-layer (128) rgb head conditioned on
    the encoded view direction.
  * ``VanillaNeRFRadianceField`` (``mlp.py:206-246``): x encoder
    (identity + 10 freqs), dir encoder (4 freqs, no identity), relu
    density, sigmoid rgb.
  * ``TNeRFRadianceField`` (``mlp.py:248-317``): a warp MLP d(x, t) added
    to positions before the vanilla field.
  * ``NDRTNeRFRadianceField`` (``mlp.py:286-395``): invertible
    coupling-block deformation (NDR, arxiv 2206.15258) before the vanilla
    field.

These are the CPU-runnable "config 1" models of the rebuild and the
regression oracle for the NGP path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .nn import apply_mlp, init_mlp


def sinusoidal_encode(
    x: jnp.ndarray, min_deg: int, max_deg: int, use_identity: bool = True
) -> jnp.ndarray:
    """Positional encoding (``mlp.py:168-203``)."""
    if max_deg == min_deg:
        return x
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    enc = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if use_identity:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def _enc_dim(in_dim: int, min_deg: int, max_deg: int, use_identity: bool) -> int:
    return in_dim * (int(use_identity) + (max_deg - min_deg) * 2)


class VanillaNeRFConfig(NamedTuple):
    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    x_min_deg: int = 0
    x_max_deg: int = 10
    d_min_deg: int = 0
    d_max_deg: int = 4

    @property
    def x_enc_dim(self) -> int:
        return _enc_dim(3, self.x_min_deg, self.x_max_deg, True)

    @property
    def d_enc_dim(self) -> int:
        return _enc_dim(3, self.d_min_deg, self.d_max_deg, False)


def init_vanilla_nerf(key: jax.Array, cfg: VanillaNeRFConfig = VanillaNeRFConfig()):
    ks = jax.random.split(key, 5)
    width, depth, skip = cfg.net_width, cfg.net_depth, cfg.skip_layer
    trunk = {}
    in_dim = cfg.x_enc_dim
    kt = jax.random.split(ks[0], depth)
    for i in range(depth):
        d_in = in_dim if i == 0 else width
        if i > 0 and i % skip == 0:
            d_in += in_dim
        trunk[f"layer{i}"] = init_mlp(kt[i], [d_in, width])
    return {
        "trunk": trunk,
        "sigma": init_mlp(ks[1], [width, 1]),
        "bottleneck": init_mlp(ks[2], [width, width]),
        "rgb": init_mlp(
            ks[3],
            [width + cfg.d_enc_dim]
            + [cfg.net_width_condition] * cfg.net_depth_condition
            + [3],
        ),
    }


def _trunk(params: dict, cfg: VanillaNeRFConfig, xe: jnp.ndarray) -> jnp.ndarray:
    h = xe
    for i in range(cfg.net_depth):
        if i > 0 and i % cfg.skip_layer == 0:
            h = jnp.concatenate([h, xe], axis=-1)
        h = jax.nn.relu(apply_mlp(params["trunk"][f"layer{i}"], h))
    return h


def vanilla_query_density(
    params: dict, x: jnp.ndarray, cfg: VanillaNeRFConfig = VanillaNeRFConfig()
):
    xe = sinusoidal_encode(x, cfg.x_min_deg, cfg.x_max_deg, True)
    h = _trunk(params, cfg, xe)
    sigma = apply_mlp(params["sigma"], h)
    return jax.nn.relu(sigma)


def vanilla_forward(
    params: dict,
    x: jnp.ndarray,
    direction: Optional[jnp.ndarray] = None,
    cfg: VanillaNeRFConfig = VanillaNeRFConfig(),
):
    """→ (rgb, sigma) with relu density, sigmoid rgb (``mlp.py:206-246``)."""
    xe = sinusoidal_encode(x, cfg.x_min_deg, cfg.x_max_deg, True)
    h = _trunk(params, cfg, xe)
    raw_sigma = apply_mlp(params["sigma"], h)
    if direction is not None:
        de = sinusoidal_encode(direction, cfg.d_min_deg, cfg.d_max_deg, False)
        bottleneck = apply_mlp(params["bottleneck"], h)
        h = jnp.concatenate([bottleneck, de], axis=-1)
        raw_rgb = apply_mlp(params["rgb"], h)
    else:
        raw_rgb = apply_mlp(params["rgb"], h[..., : params["rgb"]["w0"].shape[0]])
    return jax.nn.sigmoid(raw_rgb), jax.nn.relu(raw_sigma)


class TNeRFConfig(NamedTuple):
    base: VanillaNeRFConfig = VanillaNeRFConfig()
    warp_depth: int = 4
    warp_width: int = 64
    xt_min_deg: int = 0
    xt_max_deg: int = 4


def init_tnerf(key: jax.Array, cfg: TNeRFConfig = TNeRFConfig()):
    k_warp, k_base = jax.random.split(key)
    in_dim = _enc_dim(4, cfg.xt_min_deg, cfg.xt_max_deg, True)
    return {
        "warp": init_mlp(
            k_warp, [in_dim] + [cfg.warp_width] * cfg.warp_depth + [3]
        ),
        "base": init_vanilla_nerf(k_base, cfg.base),
    }


def tnerf_forward(
    params: dict,
    x: jnp.ndarray,
    t: jnp.ndarray,
    direction: Optional[jnp.ndarray] = None,
    cfg: TNeRFConfig = TNeRFConfig(),
):
    """Time-warped NeRF (``mlp.py:248-317``): x' = x + d(x, t), except at
    t == 0 where the warp is identically zero."""
    xt = jnp.concatenate([x, jnp.broadcast_to(t, x[..., :1].shape)], axis=-1)
    enc = sinusoidal_encode(xt, cfg.xt_min_deg, cfg.xt_max_deg, True)
    dx = apply_mlp(params["warp"], enc, activation=jax.nn.relu)
    dx = jnp.where(jnp.broadcast_to(t, x[..., :1].shape) == 0.0, 0.0, dx)
    return vanilla_forward(params["base"], x + dx, direction, cfg.base)


def tnerf_query_density(
    params: dict,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg: TNeRFConfig = TNeRFConfig(),
):
    """Density-only query through the time warp
    (``mlp.py:273-277`` TNeRF.query_density)."""
    xt = jnp.concatenate([x, jnp.broadcast_to(t, x[..., :1].shape)], axis=-1)
    enc = sinusoidal_encode(xt, cfg.xt_min_deg, cfg.xt_max_deg, True)
    dx = apply_mlp(params["warp"], enc, activation=jax.nn.relu)
    dx = jnp.where(jnp.broadcast_to(t, x[..., :1].shape) == 0.0, 0.0, dx)
    return vanilla_query_density(params["base"], x + dx, cfg.base)


# ----------------------------------------------------------------------------
# NDR-TNeRF: invertible (coupling-block) deformation field
# (``mlp.py:286-395``; NDR, arxiv 2206.15258). Three coupling blocks, each
# lifting w by an MLP of (uv, t) then rigidly transforming uv by an SE(2)
# predicted from (w, t), with an axis rotation between blocks.
# ----------------------------------------------------------------------------


class NDRTNeRFConfig(NamedTuple):
    base: VanillaNeRFConfig = VanillaNeRFConfig()
    n_blocks: int = 3
    width: int = 128
    time_feat: int = 64
    t_min_deg: int = 0
    t_max_deg: int = 4
    uv_min_deg: int = 0
    uv_max_deg: int = 4


def _near_zero_output(params: dict, key: jax.Array) -> dict:
    """Match the reference warp MLPs' output init U(0, 1e-4)
    (``mlp.py:260,306,319``) so the warp starts near the identity."""
    n_layers = len(params) // 2
    last = n_layers - 1
    w = params[f"w{last}"]
    params[f"w{last}"] = jax.random.uniform(key, w.shape, maxval=1e-4)
    return params


def init_ndr_tnerf(key: jax.Array, cfg: NDRTNeRFConfig = NDRTNeRFConfig()):
    ks = jax.random.split(key, cfg.n_blocks * 4 + 1)
    t_dim = _enc_dim(1, cfg.t_min_deg, cfg.t_max_deg, True)
    uv_dim = _enc_dim(2, cfg.uv_min_deg, cfg.uv_max_deg, True)
    w_dim = _enc_dim(1, cfg.uv_min_deg, cfg.uv_max_deg, True)
    blocks = []
    for i in range(cfg.n_blocks):
        k1, k2, k3, k4 = ks[i * 4 : i * 4 + 4]
        blocks.append(
            {
                # depth-2 lift MLP: (enc(uv), time_feat) -> dw
                "warp1": _near_zero_output(
                    init_mlp(
                        k1,
                        [uv_dim + cfg.time_feat, cfg.width, cfg.width, 1],
                    ),
                    jax.random.fold_in(k1, 1),
                ),
                # depth-1 SE(2) MLP: (enc(w), time_feat) -> (theta, t_uv)
                "warp2": _near_zero_output(
                    init_mlp(
                        k2, [w_dim + cfg.time_feat, cfg.width, 3]
                    ),
                    jax.random.fold_in(k2, 1),
                ),
                "time1": init_mlp(k3, [t_dim, cfg.time_feat]),
                "time2": init_mlp(k4, [t_dim, cfg.time_feat]),
            }
        )
    return {
        "blocks": {str(i): b for i, b in enumerate(blocks)},
        "base": init_vanilla_nerf(ks[-1], cfg.base),
    }


def _ndr_block(block: dict, x: jnp.ndarray, t_enc: jnp.ndarray,
               cfg: NDRTNeRFConfig) -> jnp.ndarray:
    uv, w = x[..., :2], x[..., 2:]
    tf1 = apply_mlp(block["time1"], t_enc)
    dw = apply_mlp(
        block["warp1"],
        jnp.concatenate(
            [sinusoidal_encode(uv, cfg.uv_min_deg, cfg.uv_max_deg, True), tf1],
            axis=-1,
        ),
        activation=jax.nn.relu,
    )
    w = w + dw
    tf2 = apply_mlp(block["time2"], t_enc)
    rt = apply_mlp(
        block["warp2"],
        jnp.concatenate(
            [sinusoidal_encode(w, cfg.uv_min_deg, cfg.uv_max_deg, True), tf2],
            axis=-1,
        ),
        activation=jax.nn.relu,
    )
    theta, trans = rt[..., 0], rt[..., 1:]
    c, s = jnp.cos(theta), jnp.sin(theta)
    duv = uv - trans
    # R(θ)^T-style 2D rotation, matching _euler2rot_2dinv (mlp.py:384-395)
    uv = jnp.stack(
        [c * duv[..., 0] + s * duv[..., 1],
         -s * duv[..., 0] + c * duv[..., 1]],
        axis=-1,
    )
    return jnp.concatenate([uv, w], axis=-1)


def ndr_warp(params: dict, x: jnp.ndarray, t: jnp.ndarray,
             cfg: NDRTNeRFConfig = NDRTNeRFConfig()) -> jnp.ndarray:
    """Invertible deformation: 3 coupling blocks with axis rolls between
    them (``mlp.py:357-365``)."""
    t_ = jnp.broadcast_to(t, x[..., :1].shape)
    t_enc = sinusoidal_encode(t_, cfg.t_min_deg, cfg.t_max_deg, True)
    x = _ndr_block(params["blocks"]["0"], x, t_enc, cfg)
    x = x[..., jnp.array([1, 2, 0])]
    x = _ndr_block(params["blocks"]["1"], x, t_enc, cfg)
    x = x[..., jnp.array([2, 0, 1])]
    x = _ndr_block(params["blocks"]["2"], x, t_enc, cfg)
    return x


def ndr_tnerf_forward(
    params: dict,
    x: jnp.ndarray,
    t: jnp.ndarray,
    direction: Optional[jnp.ndarray] = None,
    cfg: NDRTNeRFConfig = NDRTNeRFConfig(),
):
    """NDR-warped vanilla NeRF → (rgb, sigma) (``mlp.py:366-383``)."""
    return vanilla_forward(
        params["base"], ndr_warp(params, x, t, cfg), direction, cfg.base
    )
