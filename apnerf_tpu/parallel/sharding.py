"""Sharded (multi-chip) training step.

Builds the same jitted train step as ``apnerf_tpu/train/step.py`` but with
explicit sharding: ensemble state over the ``ens`` mesh axis, ray batches
additionally over ``data``. XLA inserts the gradient all-reduce over
``data`` (psum over ICI) automatically from the loss-mean structure —
the TPU-native replacement for the reference's... nothing: the reference
has no distributed path at all (SURVEY.md §2.5), this is new capability.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..config import PipelineConfig
from ..train.step import EnsembleState, make_train_step
from .mesh import batch_sharding, shard_ensemble_state


def make_sharded_train_step(
    cfg: PipelineConfig, mesh: Mesh, schedule=None
):
    """Train step with a with_sharding_constraint pinning the [E, R]
    ray batch to ("ens", "data")."""
    bsh = batch_sharding(mesh)

    def constrain(batch):
        return jax.tree.map(
            lambda x: (
                jax.lax.with_sharding_constraint(x, bsh)
                if x.ndim >= 2
                else jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("ens"))
                )
            ),
            batch,
        )

    return make_train_step(cfg, schedule=schedule, batch_constraint=constrain)


def make_sharded_flagship_phase(cfg: PipelineConfig, mesh: Mesh, schedule=None):
    """Multi-step flagship phase (spectral + proposal,
    ``train/flagship.py``) with the same (ens, data) batch constraint —
    the sharded form of the production train path."""
    from ..train.flagship import make_flagship_train_phase

    bsh = batch_sharding(mesh)

    def constrain(batch):
        return jax.tree.map(
            lambda x: (
                jax.lax.with_sharding_constraint(x, bsh)
                if x.ndim >= 2
                else jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("ens"))
                )
            ),
            batch,
        )

    return make_flagship_train_phase(
        cfg, schedule=schedule, batch_constraint=constrain
    )


def make_sharded_candidate_renderer(
    cfg: PipelineConfig, mesh: Mesh, max_samples: int,
    with_variance: bool = True,
):
    """Ensemble render of candidate-trajectory views with the RAY axis
    sharded over ``data`` and members over ``ens`` — the second hot load
    of the system (20 traj × 40 views × 64² rays × 2 members per planning
    step, reference ``pipeline.py:666-798``) as a multi-chip program
    (SURVEY.md §2.5: "shard ... the view axis of candidate-trajectory
    rendering").

    Returns render(params, origins [V, P, 3], viewdirs, bkgd, key=None) →
    outs dict with leaves [E, V, P, ...] (flagship spectral+prop path).
    ``key`` seeds the sampler (stratified jitter stays off by default —
    test-mode rendering — but scoring can now be keyed without a plumbing
    change); None keeps the deterministic PRNGKey(0) behavior.
    """
    import jax.numpy as jnp

    from ..models import spectral
    from ..render.prop_renderer import render_rays_prop
    from ..train.flagship import make_prop_config, make_spectral_config

    s_cfg = make_spectral_config(cfg)
    p_cfg = make_prop_config(cfg)
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
    ray_sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def _render(params, origins, viewdirs, bkgd, key):
        V, Pr, _ = origins.shape
        ro = jax.lax.with_sharding_constraint(
            origins.reshape(V * Pr, 3), ray_sh
        )
        rd = jax.lax.with_sharding_constraint(
            viewdirs.reshape(V * Pr, 3), ray_sh
        )

        def member(p):
            outs, _ = render_rays_prop(
                lambda pos, dirs: spectral.forward(p["main"], s_cfg, pos, dirs),
                lambda pos: spectral.query_density_field(p["prop"], p_cfg, pos),
                ro, rd, aabb, key,
                num_samples=max_samples,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane, render_bkgd=bkgd,
                stratified=False, with_variance=with_variance,
            )
            return outs

        outs = jax.vmap(member)(params)
        return jax.tree.map(
            lambda x: x.reshape((x.shape[0], V, Pr) + x.shape[2:])
            if x.ndim >= 2 else x,
            outs,
        )

    def render(params, origins, viewdirs, bkgd, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return _render(params, origins, viewdirs, bkgd, key)

    return render


def place_training(state: EnsembleState, dataset, mesh: Mesh):
    """Place state (ens-sharded) and the observation store (replicated)."""
    state = shard_ensemble_state(state, mesh)
    rep = NamedSharding(mesh, P())
    for name in ("images", "depths", "semantics", "camtoworlds", "K"):
        setattr(dataset, name, jax.device_put(getattr(dataset, name), rep))
    return state, dataset
