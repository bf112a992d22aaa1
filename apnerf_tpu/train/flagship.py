"""Flagship TPU train path: spectral field + proposal sampling.

Same step semantics as ``train/step.py`` (ensemble vmap, 3-term loss,
NaN-guarded Adam, occupancy EMA on cadence for the planner) with the two
hot components swapped for their TPU-native equivalents:

  * field: ``models/spectral.py`` (learned Fourier spectrum + MLP; no
    hash-table gathers),
  * sampler: ``render/prop_renderer.py`` (proposal MLP + gather-free
    inverse-CDF; no occupancy-lattice gathers).

The occupancy grid is still EMA-updated every ``occ_every_n`` steps from
the spectral density so ``planning`` keeps consuming the same binaries —
it is simply no longer in the per-step sampling path. Loss gains the
mipnerf360 proposal-matching term (reference capability:
``perception/nerfacc/nerfacc/estimators/prop_net.py:136-180``).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from ..config import PipelineConfig
from ..models import spectral
from ..ops.occupancy import init_occ_grid, update_occ_grid
from ..render.prop_renderer import render_rays_prop
from .schedule import cyclic_lr
from .step import EnsembleState, make_optimizer
from .phase import make_train_phase


def default_spectral_schedule(cfg: PipelineConfig):
    """Cyclic LR anchored at cfg.spectral_lr — spectral fields train best
    above the hash grid's 1e-3 (FakeSim 640^2 sweep at 2000 steps:
    PSNR 22.4 @ 6e-3 vs 20.0 @ 3e-3 vs ~16 @ 1e-3,
    scripts/quality_sweep.py)."""
    return cyclic_lr(
        cfg.spectral_lr / 10.0, cfg.spectral_lr,
        max(cfg.training_steps // 4, 1),
        gamma=cfg.spectral_lr_gamma,
    )


def make_spectral_config(cfg: PipelineConfig) -> spectral.SpectralConfig:
    return spectral.SpectralConfig(
        aabb=tuple(float(v) for v in cfg.aabb),
        neurons=cfg.spectral_neurons,
        layers=cfg.spectral_layers,
        geo_feat_dim=cfg.geo_feat_dim,
        n_levels=cfg.n_levels,
        freqs_per_level=cfg.spectral_freqs_per_level,
        base_freq=float(cfg.base_resolution),
        max_freq=float(cfg.max_resolution),
        num_semantic_classes=cfg.num_semantic_classes,
        fused=cfg.fused_field,
    )


def make_prop_config(cfg: PipelineConfig) -> spectral.SpectralDensityConfig:
    return spectral.SpectralDensityConfig(
        aabb=tuple(float(v) for v in cfg.aabb),
        neurons=cfg.prop_neurons,
        layers=cfg.prop_layers,
        max_freq=float(min(cfg.max_resolution, 256)),
        fused=cfg.fused_field,
    )


def init_flagship_ensemble(
    key: jax.Array, cfg: PipelineConfig, schedule: Optional[Callable] = None
) -> EnsembleState:
    """Stacked ensemble state with params = {"main": ..., "prop": ...}."""
    s_cfg = make_spectral_config(cfg)
    p_cfg = make_prop_config(cfg)
    opt = make_optimizer(cfg, schedule or default_spectral_schedule(cfg))
    keys = jax.random.split(key, cfg.n_ensembles)

    def one(k):
        k1, k2 = jax.random.split(k)
        params = {
            "main": spectral.init_spectral(k1, s_cfg),
            "prop": spectral.init_spectral_density(k2, p_cfg),
        }
        return params, opt.init(params), init_occ_grid(
            cfg.aabb, cfg.main_grid_resolution
        )

    params, opt_state, occ = jax.vmap(one)(keys)
    return EnsembleState(
        params=params, opt_state=opt_state, occ=occ, step=jnp.asarray(0)
    )


def make_flagship_member_core(
    cfg: PipelineConfig, schedule: Optional[Callable] = None,
    grad_reduce: Optional[Callable] = None,
):
    """One member's flagship train logic; same signature as
    ``step.make_member_core`` so ``phase.make_train_phase`` and the
    sharded path can consume it unchanged.

    ``grad_reduce``: optional collective applied to the raw gradients
    before the NaN guard and Adam — the shard_map data-parallel phase
    passes ``lambda g: jax.lax.pmean(g, "data")`` so every data replica
    updates from the identical global-mean gradient (the NaN guard then
    agrees across replicas by construction: NaN propagates through
    pmean)."""
    s_cfg = make_spectral_config(cfg)
    p_cfg = make_prop_config(cfg)
    opt = make_optimizer(cfg, schedule or default_spectral_schedule(cfg))
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)

    def _fused_loss_and_grads(params, batch, k_samp):
        """Combined-kernel train step: sampling forward, then ONE Pallas
        pass for render+loss+backward (``spectral.forward_packed_lossgrad``
        — the r4 trace showed the separate fwd kernel was pure recompute,
        3.27 ms/step). Proposal-net grads flow only through the
        mipnerf360 matching loss over level-0 weights (exactly the
        autodiff path: final t's are detached, final weights detached in
        prop_loss), and level-0 edges are prop-param-independent — so the
        level weights are recomputed differentiably at the fixed edges."""
        from ..models.propnet import prop_loss
        from ..ops.volrend import render_weight_from_density
        from ..render.prop_renderer import prop_sample_intervals

        def _sample(pp):
            t0, t1, _, pos, miss, levels = prop_sample_intervals(
                lambda p_: spectral.query_density_field(pp, p_cfg, p_),
                batch.origins, batch.viewdirs, aabb, k_samp,
                num_samples=cfg.max_samples_train,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane, stratified=True,
            )
            t_edges0, w_prop = levels[0]
            aux = (t0, t1, pos, miss, jax.lax.stop_gradient(t_edges0))
            return w_prop, aux

        if os.environ.get("APNERF_PROP_REUSE", "0") == "1":
            # reuse the sampling forward for the prop grads: record a vjp
            # through propnet_sampling's own level-0 weights instead of
            # re-evaluating the prop MLP at the same midpoints (plfn below
            # runs the identical ops a second time; r5 probe)
            w_prop, pullback, (t0, t1, pos, miss, t_edges0) = jax.vjp(
                _sample, params["prop"], has_aux=True
            )
        else:
            w_prop, (t0, t1, pos, miss, t_edges0) = _sample(params["prop"])
            pullback = None
        lossrows, weights, main_grads = spectral.forward_packed_lossgrad(
            params["main"], s_cfg, pos, batch.viewdirs, t0, t1, miss,
            batch.pixels, batch.depth, batch.sem, batch.color_bkgd,
        )
        R = batch.origins.shape[0]
        l_rgb = jnp.sum(lossrows[0]) / (3.0 * R)
        l_dep = jnp.sum(lossrows[1]) / R
        l_sem = jnp.sum(lossrows[2]) / R

        if pullback is not None:
            def ploss_of_w(wp):
                return prop_loss(
                    [(t_edges0, wp)], t0, t1, weights, use_onehot=True
                )

            p_loss, dw = jax.value_and_grad(ploss_of_w)(w_prop)
            (prop_grads,) = pullback(dw)
        else:
            te0, te1 = t_edges0[..., :-1], t_edges0[..., 1:]
            tm0 = 0.5 * (te0 + te1)
            pos0 = (
                batch.origins[:, None, :]
                + tm0[..., None] * batch.viewdirs[:, None, :]
            )

            def plfn(pp):
                sig = spectral.query_density_field(pp, p_cfg, pos0)[..., 0]
                wp, _, _ = render_weight_from_density(te0, te1, sig)
                return prop_loss(
                    [(t_edges0, wp)], t0, t1, weights, use_onehot=True
                )

            p_loss, prop_grads = jax.value_and_grad(plfn)(params["prop"])
        loss = (
            l_rgb * 10.0 + l_dep / 5.0 + l_sem / 2.0
            + cfg.prop_loss_weight * p_loss
        )
        n_samples = jnp.sum(~miss) * cfg.max_samples_train
        grads = {"main": main_grads, "prop": prop_grads}
        return loss, (l_rgb, l_dep, l_sem, n_samples), grads

    def member_core(params, opt_state, occ, batch, k_occ, step, occ_thre):
        # The occupancy grid is NOT updated in the scan body: the flagship
        # sampler never reads it (proposal sampling), only the planner
        # does, between phases. r2 kept the reference's every-16-steps
        # lax.cond inside the scan and the trace showed it costing
        # ~2 ms/step (the cond's carry copy + a searchsorted while-loop,
        # scripts/profile_trace.py) — the update now runs once per chunk
        # via ``make_flagship_occ_update``. ``occ`` passes through so the
        # state layout (and checkpoints) stay identical.
        _, k_samp = jax.random.split(k_occ)

        def finish(loss, aux, grads):
            """NaN-guarded Adam step shared by both train branches.

            The guard is reduction-only: no ravel_pytree concat and no
            nan_to_num sanitize copy of the full gradient (2 avoidable
            full-gradient HBM round-trips per step). A non-finite grad
            leaf poisons updates/new_opt_state/new_params, but ``keep``
            below discards ALL of them when ``bad`` — jnp.where selects
            the clean old value elementwise, so no NaN survives."""
            bad = ~jax.tree_util.tree_reduce(
                lambda acc, leaf: acc & jnp.all(jnp.isfinite(leaf)),
                grads, jnp.bool_(True),
            )
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(bad, b, a), new, old
            )
            return (
                keep(new_params, params),
                keep(new_opt_state, opt_state),
                occ,
                loss,
                aux[0], aux[1], aux[2], aux[3],
                bad,
            )

        if spectral.use_packed_lossgrad(
            s_cfg, params["main"], batch.origins.shape[0],
            cfg.max_samples_train,
        ):
            loss, aux, grads = _fused_loss_and_grads(params, batch, k_samp)
            if grad_reduce is not None:
                grads = grad_reduce(grads)
            return finish(loss, aux, grads)

        def loss_fn(p):
            # whole-field kernel fast path (encode+trunk+heads in ONE
            # Pallas kernel, packed [4+C, N] output — deletes the
            # field→heads XLA glue, docs/PERFORMANCE.md r4c):
            n_rows = batch.origins.shape[0] * cfg.max_samples_train
            packed = spectral.use_packed_field(s_cfg, p["main"], n_rows)
            # fused field+volrend kernel (ops/pallas/fused_field_volrend):
            # per-sample field values never leave VMEM, outputs are
            # per-RAY accumulations — supersedes the packed path when the
            # shapes admit the lane-aligned layout.
            packed_vr = spectral.use_packed_volrend(
                s_cfg, p["main"], batch.origins.shape[0],
                cfg.max_samples_train,
            )
            # semantic-head reassociation (models/spectral.py
            # query_semantic_hidden): accumulate the narrow bf16 hidden,
            # apply the final linear after — exact math, no [N, C] f32
            # logits in HBM. APNERF_SEM_REASSOC=0 restores the plain path.
            reassoc = (
                not packed
                and os.environ.get("APNERF_SEM_REASSOC", "0") == "1"
            )

            def field_fn(pos, dirs):
                return spectral.forward(
                    p["main"], s_cfg, pos, dirs, sem_hidden=reassoc
                )

            def field_packed_fn(pos, rays_d):
                return spectral.forward_packed(p["main"], s_cfg, pos, rays_d)

            def field_packed_vr_fn(pos, rays_d, t0, t1, miss):
                return spectral.forward_packed_volrend(
                    p["main"], s_cfg, pos, rays_d, t0, t1, miss
                )

            def prop_density_fn(pos):
                return spectral.query_density_field(p["prop"], p_cfg, pos)

            out, p_loss = render_rays_prop(
                field_fn, prop_density_fn,
                batch.origins, batch.viewdirs, aabb, k_samp,
                num_samples=cfg.max_samples_train,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane,
                render_bkgd=batch.color_bkgd,
                stratified=True,
                sem_final=(
                    spectral.semantic_final(p["main"]) if reassoc else None
                ),
                field_packed_fn=field_packed_fn if packed else None,
                field_packed_vr_fn=(
                    field_packed_vr_fn if packed_vr else None
                ),
            )
            l_rgb = jnp.mean(optax.huber_loss(out["rgb"], batch.pixels))
            l_dep = jnp.mean(optax.huber_loss(out["depth"][:, 0], batch.depth))
            l_sem = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    out["sem"], batch.sem
                )
            )
            loss = (
                l_rgb * 10.0 + l_dep / 5.0 + l_sem / 2.0
                + cfg.prop_loss_weight * p_loss
            )
            return loss, (l_rgb, l_dep, l_sem, out["n_samples"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if grad_reduce is not None:
            grads = grad_reduce(grads)
        return finish(loss, aux, grads)

    return member_core


def make_flagship_train_phase(
    cfg: PipelineConfig, schedule: Optional[Callable] = None,
    batch_constraint=None,
):
    """lax.scan multi-step phase over the flagship member core (same
    signature as ``phase.make_train_phase``). Pair with
    ``make_flagship_occ_update`` called once per chunk — the phase itself
    leaves the occupancy grid untouched (see member_core)."""
    return make_train_phase(
        cfg, schedule=schedule, batch_constraint=batch_constraint,
        member_core=make_flagship_member_core(cfg, schedule),
    )


def make_flagship_occ_update(cfg: PipelineConfig):
    """Chunk-cadence occupancy EMA + re-binarization for the flagship path
    (reference semantics: ``occ_grid.py:241-437``; cadence deviation —
    once per scan chunk (~25 steps) instead of every 16 — documented in
    docs/PERFORMANCE.md; the only consumer is the planner, which reads the
    binaries between phases).

    Returns ``occ_update_fn(state, key, occ_thre) -> state`` (jitted,
    works on ens-sharded state too)."""
    s_cfg = make_spectral_config(cfg)

    @jax.jit
    def occ_update_fn(state: EnsembleState, key: jax.Array, occ_thre):
        keys = jax.random.split(key, cfg.n_ensembles)

        def one(params, occ, k):
            def occ_eval_fn(x):
                return (
                    spectral.query_density(params["main"], s_cfg, x)
                    * cfg.render_step_size
                )

            return update_occ_grid(
                occ, occ_eval_fn, k, state.step, occ_thre,
                ema_decay=cfg.occ_ema_decay,
                warmup_steps=cfg.occ_warmup_steps,
            )

        occ = jax.vmap(one)(state.params, state.occ, keys)
        return state._replace(occ=occ)

    return occ_update_fn
