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


def place_training(state: EnsembleState, dataset, mesh: Mesh):
    """Place state (ens-sharded) and the observation store (replicated)."""
    state = shard_ensemble_state(state, mesh)
    rep = NamedSharding(mesh, P())
    for name in ("images", "depths", "semantics", "camtoworlds", "K"):
        setattr(dataset, name, jax.device_put(getattr(dataset, name), rep))
    return state, dataset
