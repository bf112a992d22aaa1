"""The jitted ensemble train step.

TPU-native re-design of the reference training inner loop
(``scripts/pipeline.py:354-664``): the per-member Python loop
(``:398-412``) becomes a ``vmap`` over a stacked ensemble state, and the
whole step — occupancy EMA update, grid-march sampling, field eval,
3-term loss, NaN-guarded Adam update, cyclic LR — compiles into one XLA
program. No GradScaler: bf16/f32 on TPU has fp32 range, so the reference's
``torch.cuda.amp.GradScaler(2**10)`` (``pipeline.py:181``) has no
equivalent and the NaN-step skip (``pipeline.py:520-529``) becomes a
pure-functional ``jnp.where`` on the update.

Loss (``pipeline.py:507-511``):
    10 * SmoothL1(rgb) + SmoothL1(depth)/5 + CrossEntropy(sem)/2
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from ..config import PipelineConfig
from ..data.dataset import fetch_rays
from ..models import ngp
from ..ops.grid_march import candidate_lattice
from ..ops.occupancy import OccGridState, init_occ_grid, maybe_update_occ_grid
from ..render.renderer import render_train
from .schedule import cyclic_lr


class EnsembleState(NamedTuple):
    """Stacked per-member training state (leading axis = ensemble)."""

    params: dict  # each leaf [E, ...]
    opt_state: tuple
    occ: OccGridState  # leaves [E, ...]
    step: jnp.ndarray  # [] int32 — shared step counter


class TrainStepOutput(NamedTuple):
    state: EnsembleState
    loss: jnp.ndarray  # [E]
    loss_rgb: jnp.ndarray  # [E]
    loss_dep: jnp.ndarray  # [E]
    loss_sem: jnp.ndarray  # [E]
    n_samples: jnp.ndarray  # [E]
    skipped: jnp.ndarray  # [E] bool — NaN-grad steps


def make_ngp_config(cfg: PipelineConfig) -> ngp.NGPConfig:
    """Field config from the pipeline config (``pipeline.py:167-172``:
    aabb from the estimator's level-0 aabb, neurons/layers from YAML)."""
    return ngp.NGPConfig(
        aabb=tuple(float(v) for v in cfg.aabb),
        neurons=cfg.main_neurons,
        layers=cfg.main_layer,
        geo_feat_dim=cfg.geo_feat_dim,
        n_levels=cfg.n_levels,
        n_features=cfg.n_features,
        log2_hashmap_size=cfg.log2_hashmap_size,
        base_resolution=cfg.base_resolution,
        max_resolution=cfg.max_resolution,
        num_semantic_classes=cfg.num_semantic_classes,
    )


def make_optimizer(cfg: PipelineConfig, schedule: Optional[Callable] = None):
    """Adam(lr=1e-3, eps=1e-15, weight_decay) + cyclic LR
    (``pipeline.py:173-198``)."""
    if schedule is None:
        schedule = cyclic_lr(cfg.lr_base, cfg.lr, max(cfg.training_steps // 4, 1))
    if cfg.weight_decay > 0:
        return optax.adamw(
            schedule, eps=cfg.adam_eps, weight_decay=cfg.weight_decay
        )
    if getattr(cfg, "spectral_spectrum_wd", 0.0) > 0:
        # decoupled weight decay on the learnable SPECTRUM only (the
        # flagship's params["main"]["W"/"phase"]) — high-frequency bands
        # that keep growing speckle unobserved regions; the MLPs and the
        # proposal field are untouched (scripts/psnr_probe.py)
        def spectrum_mask(params):
            def walk(tree, inside):
                return {
                    k: (walk(v, inside or k == "main")
                        if isinstance(v, dict)
                        else inside and k in ("W", "phase"))
                    for k, v in tree.items()
                }

            return walk(params, False)

        return optax.chain(
            optax.scale_by_adam(eps=cfg.adam_eps),
            optax.add_decayed_weights(
                cfg.spectral_spectrum_wd, mask=spectrum_mask
            ),
            optax.scale_by_learning_rate(schedule),
        )
    return optax.adam(schedule, eps=cfg.adam_eps)


def init_ensemble(
    key: jax.Array, cfg: PipelineConfig, schedule: Optional[Callable] = None
) -> EnsembleState:
    ngp_cfg = make_ngp_config(cfg)
    opt = make_optimizer(cfg, schedule)
    keys = jax.random.split(key, cfg.n_ensembles)

    def one(k):
        params = ngp.init_ngp(k, ngp_cfg)
        return params, opt.init(params), init_occ_grid(
            cfg.aabb, cfg.main_grid_resolution
        )

    params, opt_state, occ = jax.vmap(one)(keys)
    return EnsembleState(
        params=params, opt_state=opt_state, occ=occ, step=jnp.asarray(0)
    )


def reset_opt_state(state: EnsembleState, cfg: PipelineConfig, schedule) -> EnsembleState:
    """Fresh optimizer bookkeeping for a new schedule (the reference swaps
    schedulers for the final refit, ``pipeline.py:359-369``)."""
    opt = make_optimizer(cfg, schedule)
    opt_state = jax.vmap(opt.init)(state.params)
    return state._replace(opt_state=opt_state, step=jnp.asarray(0))


def make_member_core(cfg: PipelineConfig, schedule: Optional[Callable] = None):
    """One ensemble member's full train logic given a pre-fetched ray batch.

    Split out from the fetch so the sharded path
    (``apnerf_tpu/parallel/sharding.py``) can constrain the [E, R] batch
    layout between fetch and compute.
    """
    ngp_cfg = make_ngp_config(cfg)
    opt = make_optimizer(cfg, schedule)
    lattice = jnp.asarray(
        candidate_lattice(
            cfg.n_candidates, cfg.near_plane, cfg.render_step_size, cfg.cone_angle
        )
    )

    def member_core(params, opt_state, occ, batch, k_occ, step, occ_thre):
        # occupancy EMA update (pipeline.py:447-470 → occ_grid.py:241-437);
        # occ_eval_fn = density * render_step_size (pipeline.py:375-378)
        def occ_eval_fn(x):
            return ngp.query_density(params, ngp_cfg, x) * cfg.render_step_size

        occ = maybe_update_occ_grid(
            occ, occ_eval_fn, k_occ, step, occ_thre,
            every_n=cfg.occ_every_n,
            ema_decay=cfg.occ_ema_decay,
            warmup_steps=cfg.occ_warmup_steps,
        )
        occ_mean = jnp.mean(occ.occs)

        def loss_fn(p):
            def field_fn(pos, dirs):
                return ngp.forward(p, ngp_cfg, pos, dirs)

            out = render_train(
                field_fn, batch.origins, batch.viewdirs, occ, lattice,
                cfg.max_samples_train, batch.color_bkgd,
                alpha_thre=cfg.alpha_thre, occ_mean=occ_mean,
            )
            l_rgb = jnp.mean(optax.huber_loss(out["rgb"], batch.pixels))
            l_dep = jnp.mean(optax.huber_loss(out["depth"][:, 0], batch.depth))
            l_sem = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    out["sem"], batch.sem
                )
            )
            loss = l_rgb * 10.0 + l_dep / 5.0 + l_sem / 2.0
            return loss, (l_rgb, l_dep, l_sem, out["n_samples"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # NaN-grad step skipping (pipeline.py:518-532): leave params AND
        # optimizer state untouched (the reference also skips the scheduler
        # tick; here LR is indexed by the shared step counter — documented
        # deviation, identical when no step is ever skipped).
        # Reduction-only guard (no ravel_pytree concat, no nan_to_num
        # sanitize copy): a non-finite leaf poisons the whole update, but
        # ``keep`` discards every poisoned output when ``bad``.
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

    return member_core


def fetch_ensemble_batch(cfg: PipelineConfig, images, depths, semantics,
                         camtoworlds, K, image_idx, key):
    """Per-member ray batches stacked on a leading ensemble axis
    → RayBatch leaves [E, R, ...]."""
    keys = jax.random.split(key, cfg.n_ensembles)
    return jax.vmap(
        lambda idx, k: fetch_rays(
            images, depths, semantics, camtoworlds, K, idx, k,
            cfg.num_rays, training=True,
        )
    )(image_idx, keys)


def make_train_step(cfg: PipelineConfig, schedule: Optional[Callable] = None,
                    batch_constraint: Optional[Callable] = None):
    """Build the jitted train step.

    Returned signature:
        step_fn(state, images, depths, semantics, camtoworlds, K,
                image_idx [E], key, occ_thre []) -> TrainStepOutput

    ``batch_constraint`` (optional) maps the stacked RayBatch through
    ``lax.with_sharding_constraint`` in the multi-chip path.
    """
    member_core = make_member_core(cfg, schedule)

    @jax.jit
    def step_fn(
        state: EnsembleState,
        images, depths, semantics, camtoworlds, K,
        image_idx: jnp.ndarray,  # [E]
        key: jax.Array,
        occ_thre: jnp.ndarray,  # []
    ) -> TrainStepOutput:
        k_fetch, k_occ = jax.random.split(key)
        batch = fetch_ensemble_batch(
            cfg, images, depths, semantics, camtoworlds, K, image_idx, k_fetch
        )
        if batch_constraint is not None:
            batch = batch_constraint(batch)
        occ_keys = jax.random.split(k_occ, cfg.n_ensembles)
        vstep = jax.vmap(member_core, in_axes=(0, 0, 0, 0, 0, None, None))
        (params, opt_state, occ, loss, l_rgb, l_dep, l_sem, n_samp, bad) = vstep(
            state.params, state.opt_state, state.occ, batch, occ_keys,
            state.step, occ_thre,
        )
        new_state = EnsembleState(
            params=params, opt_state=opt_state, occ=occ, step=state.step + 1
        )
        return TrainStepOutput(
            state=new_state, loss=loss, loss_rgb=l_rgb, loss_dep=l_dep,
            loss_sem=l_sem, n_samples=n_samp, skipped=bad,
        )

    return step_fn
