"""Standalone example trainers (library form).

Capability parity with the reference's example scripts
(``perception/models/train_ngp_nerf_occ.py``, ``train_ngp_nerf_prop.py``,
``train_mlp_nerf.py``, ``train_mlp_tnerf.py`` — themselves copies of the
nerfacc examples): single-field NeRF training on an offline dataset with
occupancy-grid or proposal-net sampling. Exposed as functions so tests can
run them on synthetic data and users can script them; thin CLIs live in
``scripts/``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import mlp as mlpmod
from ..models import ngp as ngpmod
from ..models.propnet import prop_loss, propnet_sampling
from ..ops.grid_march import candidate_lattice
from ..ops.occupancy import init_occ_grid, maybe_update_occ_grid
from ..ops.volrend import render_outputs, render_weight_from_density
from ..render.renderer import render_train
from ..utils.metrics import psnr


def make_ngp_occ_trainer(
    aabb,
    grid_resolution=(128, 128, 128),
    render_step_size: float = 5e-3,
    cone_angle: float = 0.0,
    near_plane: float = 0.0,
    alpha_thre: float = 0.0,
    max_samples: int = 128,
    n_candidates: int = 1024,
    lr: float = 1e-2,
    ngp_kwargs: Optional[Dict] = None,
    seed: int = 42,
):
    """NGP + occupancy grid trainer (⇔ ``train_ngp_nerf_occ.py``).

    Returns (state dict, step_fn, render_fn). step_fn takes a ray batch
    (origins, viewdirs, pixels [R, 3], bkgd [3]) and returns (state, loss).
    """
    cfg = ngpmod.NGPConfig(aabb=tuple(float(v) for v in aabb),
                           **(ngp_kwargs or {}))
    key = jax.random.PRNGKey(seed)
    params = ngpmod.init_ngp(key, cfg)
    occ = init_occ_grid(aabb, grid_resolution)
    opt = optax.adam(lr, eps=1e-15)
    lattice = jnp.asarray(
        candidate_lattice(n_candidates, near_plane, render_step_size,
                          cone_angle)
    )
    state = {"params": params, "opt": opt.init(params), "occ": occ,
             "step": jnp.asarray(0)}

    @jax.jit
    def step_fn(state, origins, viewdirs, pixels, bkgd, key):
        params, occ = state["params"], state["occ"]

        def occ_eval(x):
            return ngpmod.query_density(params, cfg, x) * render_step_size

        occ = maybe_update_occ_grid(occ, occ_eval, key, state["step"],
                                    jnp.asarray(1e-2))

        def loss_fn(p):
            def field(pos, dirs):
                return ngpmod.forward(p, cfg, pos, dirs)

            out = render_train(field, origins, viewdirs, occ, lattice,
                               max_samples, bkgd, alpha_thre=alpha_thre,
                               occ_mean=jnp.mean(occ.occs))
            return jnp.mean(optax.huber_loss(out["rgb"], pixels)), out

        (loss, _out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = opt.update(grads, state["opt"])
        params = optax.apply_updates(params, updates)
        return (
            {"params": params, "opt": opt_state, "occ": occ,
             "step": state["step"] + 1},
            loss,
        )

    @jax.jit
    def render_fn(state, origins, viewdirs, bkgd):
        def field(pos, dirs):
            return ngpmod.forward(state["params"], cfg, pos, dirs)

        from ..render.renderer import render_rays

        return render_rays(field, origins, viewdirs, state["occ"], lattice,
                           max_samples, render_bkgd=bkgd,
                           alpha_thre=alpha_thre,
                           occ_mean=jnp.mean(state["occ"].occs))

    return state, step_fn, render_fn


def make_mlp_occ_trainer(
    aabb,
    grid_resolution=(64, 64, 64),
    render_step_size: float = 5e-3,
    max_samples: int = 128,
    n_candidates: int = 512,
    lr: float = 5e-4,
    mlp_cfg: Optional[mlpmod.VanillaNeRFConfig] = None,
    seed: int = 42,
):
    """Vanilla MLP NeRF + occ grid (⇔ ``train_mlp_nerf.py``)."""
    cfg = mlp_cfg or mlpmod.VanillaNeRFConfig()
    params = mlpmod.init_vanilla_nerf(jax.random.PRNGKey(seed), cfg)
    occ = init_occ_grid(aabb, grid_resolution)
    opt = optax.adam(lr)
    lattice = jnp.asarray(
        candidate_lattice(n_candidates, 0.0, render_step_size, 0.0)
    )
    state = {"params": params, "opt": opt.init(params), "occ": occ,
             "step": jnp.asarray(0)}

    @jax.jit
    def step_fn(state, origins, viewdirs, pixels, bkgd, key):
        params, occ = state["params"], state["occ"]

        def occ_eval(x):
            return mlpmod.vanilla_query_density(params, x, cfg) * render_step_size

        occ = maybe_update_occ_grid(occ, occ_eval, key, state["step"],
                                    jnp.asarray(1e-2))

        def loss_fn(p):
            def field(pos, dirs):
                return mlpmod.vanilla_forward(p, pos, dirs, cfg)

            out = render_train(field, origins, viewdirs, occ, lattice,
                               max_samples, bkgd, alpha_thre=0.0,
                               occ_mean=jnp.mean(occ.occs))
            return jnp.mean((out["rgb"] - pixels) ** 2), out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, state["opt"])
        params = optax.apply_updates(params, updates)
        return (
            {"params": params, "opt": opt_state, "occ": occ,
             "step": state["step"] + 1},
            loss,
        )

    return state, step_fn


def make_ngp_prop_trainer(
    aabb,
    num_samples: int = 48,
    prop_samples=(64,),
    near_plane: float = 0.2,
    far_plane: float = 1e3,
    sampling_type: str = "lindisp",
    lr: float = 1e-2,
    ngp_kwargs: Optional[Dict] = None,
    prop_kwargs: Optional[Dict] = None,
    seed: int = 42,
):
    """NGP + proposal networks (⇔ ``train_ngp_nerf_prop.py``):
    joint training of the radiance field and one proposal density field
    with the mipnerf360 PDF matching loss."""
    cfg = ngpmod.NGPConfig(aabb=tuple(float(v) for v in aabb),
                           **(ngp_kwargs or {}))
    pcfg = ngpmod.NGPDensityConfig(aabb=tuple(float(v) for v in aabb),
                                   **(prop_kwargs or {}))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "field": ngpmod.init_ngp(k1, cfg),
        "prop": ngpmod.init_ngp_density(k2, pcfg),
    }
    opt = optax.adam(lr, eps=1e-15)
    state = {"params": params, "opt": opt.init(params),
             "step": jnp.asarray(0)}

    @jax.jit
    def step_fn(state, origins, viewdirs, pixels, bkgd, key):
        def loss_fn(p):
            def prop_sigma(t0, t1):
                tm = 0.5 * (t0 + t1)
                pos = origins[:, None, :] + tm[..., None] * viewdirs[:, None, :]
                return ngpmod.query_density_field(p["prop"], pcfg, pos)[..., 0]

            t0, t1, levels = propnet_sampling(
                key, [prop_sigma], list(prop_samples), num_samples,
                origins, viewdirs, near_plane, far_plane,
                sampling_type=sampling_type, stratified=True,
            )
            tm = 0.5 * (t0 + t1)
            pos = origins[:, None, :] + tm[..., None] * viewdirs[:, None, :]
            dirs = jnp.broadcast_to(viewdirs[:, None, :], pos.shape)
            rgb, sigma = ngpmod.forward(p["field"], cfg, pos, dirs)[:2]
            weights, _, _ = render_weight_from_density(t0, t1, sigma[..., 0])
            out = render_outputs(weights, t0, t1, rgb, render_bkgd=bkgd)
            l_rgb = jnp.mean(optax.huber_loss(out["rgb"], pixels))
            l_prop = prop_loss(levels, t0, t1, weights)
            return l_rgb + l_prop, out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = opt.update(grads, state["opt"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt": opt_state, "step": state["step"] + 1},
            loss,
        )

    return state, step_fn


def make_tnerf_occ_trainer(
    aabb,
    grid_resolution=(64, 64, 64),
    render_step_size: float = 5e-3,
    max_samples: int = 128,
    n_candidates: int = 512,
    lr: float = 5e-4,
    tnerf_cfg: Optional[mlpmod.TNeRFConfig] = None,
    seed: int = 42,
):
    """Time-conditioned T-NeRF + occ grid (⇔ the reference's
    ``perception/models/train_mlp_tnerf.py``, which trains
    ``TNeRFRadianceField`` on D-NeRF scenes: time-warped field, occ grid
    updated with densities at randomly drawn timestamps —
    ``mlp.py:264-272`` query_opacity draws random t per cell).

    step_fn takes (state, origins, viewdirs, pixels, timestamps [R], bkgd,
    key) — timestamps per ray, as the D-NeRF loader provides.
    """
    cfg = tnerf_cfg or mlpmod.TNeRFConfig()
    params = mlpmod.init_tnerf(jax.random.PRNGKey(seed), cfg)
    occ = init_occ_grid(aabb, grid_resolution)
    opt = optax.adam(lr)
    lattice = jnp.asarray(
        candidate_lattice(n_candidates, 0.0, render_step_size, 0.0)
    )
    state = {"params": params, "opt": opt.init(params), "occ": occ,
             "step": jnp.asarray(0)}

    @jax.jit
    def step_fn(state, origins, viewdirs, pixels, timestamps, bkgd, key):
        params, occ = state["params"], state["occ"]
        k_occ, k_t = jax.random.split(key)

        def occ_eval(x):
            # random timestamp per queried cell (mlp.py:264-272)
            t = jax.random.uniform(k_t, x.shape[:-1] + (1,))
            return mlpmod.tnerf_query_density(params, x, t, cfg) * (
                render_step_size
            )

        occ = maybe_update_occ_grid(occ, occ_eval, k_occ, state["step"],
                                    jnp.asarray(1e-2))

        def loss_fn(p):
            def field(pos, dirs):
                # per-ray timestamp broadcast over samples
                t = jnp.broadcast_to(
                    timestamps[:, None, None], pos.shape[:-1] + (1,)
                )
                return mlpmod.tnerf_forward(p, pos, t, dirs, cfg)

            out = render_train(field, origins, viewdirs, occ, lattice,
                               max_samples, bkgd, alpha_thre=0.0,
                               occ_mean=jnp.mean(occ.occs))
            return jnp.mean((out["rgb"] - pixels) ** 2), out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, state["opt"])
        params = optax.apply_updates(params, updates)
        return (
            {"params": params, "opt": opt_state, "occ": occ,
             "step": state["step"] + 1},
            loss,
        )

    return state, step_fn
