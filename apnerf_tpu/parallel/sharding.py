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


def _ens_data_constraint(mesh: Mesh):
    """Batch constraint pinning [E, R, ...] leaves to ("ens", "data")
    and [E]-leading scalars-per-member to ("ens",)."""
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

    return constrain


def make_sharded_train_step(
    cfg: PipelineConfig, mesh: Mesh, schedule=None
):
    """Train step with a with_sharding_constraint pinning the [E, R]
    ray batch to ("ens", "data")."""
    return make_train_step(
        cfg, schedule=schedule, batch_constraint=_ens_data_constraint(mesh)
    )


def make_sharded_occ_phase(cfg: PipelineConfig, mesh: Mesh, schedule=None):
    """Multi-step occ-path phase (hash NGP + occupancy-lattice marching,
    ``train/phase.py``) with the (ens, data) batch constraint — mesh mode
    for the reference-parity path. GSPMD shards the ray-dependent chain
    over ``data`` and all-reduces the hash-table gradients over ICI; the
    in-scan occupancy EMA (whose sampled cell evaluations are not
    ray-dependent) stays member-local under P("ens")."""
    from ..train.phase import make_train_phase

    return make_train_phase(
        cfg, schedule=schedule, batch_constraint=_ens_data_constraint(mesh)
    )


def make_sharded_flagship_phase(cfg: PipelineConfig, mesh: Mesh, schedule=None):
    """Multi-step flagship phase (spectral + proposal,
    ``train/flagship.py``) with the same (ens, data) batch constraint —
    the sharded form of the production train path."""
    from ..train.flagship import make_flagship_train_phase

    return make_flagship_train_phase(
        cfg, schedule=schedule,
        batch_constraint=_ens_data_constraint(mesh),
    )


def make_shardmap_flagship_phase(cfg: PipelineConfig, mesh: Mesh, schedule=None):
    """Flagship multi-step phase under ``shard_map``: members over ``ens``,
    rays over ``data``, explicit ``pmean`` gradient all-reduce over ICI —
    the manual-collective twin of ``make_sharded_flagship_phase``.

    Why shard_map instead of GSPMD sharding constraints: the program
    inside shard_map is per-device, so the fused Pallas field kernel
    (``ops/pallas/fused_mlp.fused_spectral_field`` — embarrassingly
    data-parallel over rays, no cross-chip traffic inside the kernel)
    runs unchanged on each device's local rays; GSPMD has no partitioning
    rule for ``pallas_call`` and previously forced mesh mode onto the
    slower XLA chain (r3 ``mapper.py:129-135``).

    Parity contract with ``train/phase.make_train_phase``: identical
    per-member image picks, identical global pixel indices (each data
    shard gathers its contiguous slice — ``data/dataset.fetch_rays``
    ``shard=``), loss = pmean of local ray means = the global mean."""
    import os

    import jax.numpy as jnp

    from ..data.dataset import fetch_rays
    from ..train.flagship import make_flagship_member_core
    from ..train.phase import _sample_pool_index

    E = cfg.n_ensembles
    n_ens, n_data = mesh.shape["ens"], mesh.shape["data"]
    if E % n_ens != 0:
        raise ValueError(f"n_ensembles {E} % mesh ens axis {n_ens} != 0")
    if cfg.num_rays % n_data != 0:
        raise ValueError(f"num_rays {cfg.num_rays} % data axis {n_data} != 0")
    E_l = E // n_ens
    member_core = make_flagship_member_core(
        cfg, schedule, grad_reduce=lambda g: jax.lax.pmean(g, "data"),
    )

    def body(state, images, depths, semantics, camtoworlds, K,
             pools, counts, size, keys, occ_thre, recent_bias):
        ei = jax.lax.axis_index("ens")
        di = jax.lax.axis_index("data")

        def slice_members(ks):
            # same per-GLOBAL-member keys as the unsharded phase
            return jax.lax.dynamic_slice_in_dim(ks, ei * E_l, E_l)

        def one_step(st, key):
            k_pick, k_fetch, k_occ = jax.random.split(key, 3)
            pick_keys = slice_members(jax.random.split(k_pick, E))
            image_idx = jax.vmap(
                lambda p, c, k: _sample_pool_index(
                    p, c, k, recent_bias, size, cfg.sample_disc
                )
            )(pools, counts, pick_keys)
            fetch_keys = slice_members(jax.random.split(k_fetch, E))
            batch = jax.vmap(
                lambda idx, k: fetch_rays(
                    images, depths, semantics, camtoworlds, K, idx, k,
                    cfg.num_rays, training=True, shard=(di, n_data),
                )
            )(image_idx, fetch_keys)
            occ_keys = slice_members(jax.random.split(k_occ, E))
            vstep = jax.vmap(member_core, in_axes=(0, 0, 0, 0, 0, None, None))
            params, opt_state, occ, loss, *_rest = vstep(
                st.params, st.opt_state, st.occ, batch, occ_keys,
                st.step, occ_thre,
            )
            loss = jax.lax.pmean(loss, "data")
            new_st = EnsembleState(
                params=params, opt_state=opt_state, occ=occ,
                step=st.step + 1,
            )
            return new_st, loss

        return jax.lax.scan(
            one_step, state, keys,
            unroll=int(os.environ.get("APNERF_SCAN_UNROLL", "1")),
        )

    @jax.jit
    def phase_fn(state, images, depths, semantics, camtoworlds, K,
                 pools, counts, size, keys, occ_thre, recent_bias):
        def leaf_spec(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == E:
                return P("ens")
            return P()

        state_spec = jax.tree.map(leaf_spec, state)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(state_spec, P(), P(), P(), P(), P(),
                      P("ens"), P("ens"), P(), P(), P(), P()),
            out_specs=(state_spec, P(None, "ens")),
            check_vma=False,
        )
        return f(state, images, depths, semantics, camtoworlds, K,
                 pools, counts, size, keys, occ_thre, recent_bias)

    return phase_fn


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
        import os as _os

        reassoc = _os.environ.get("APNERF_SEM_REASSOC", "0") == "1"
        V, Pr, _ = origins.shape
        ro = jax.lax.with_sharding_constraint(
            origins.reshape(V * Pr, 3), ray_sh
        )
        rd = jax.lax.with_sharding_constraint(
            viewdirs.reshape(V * Pr, 3), ray_sh
        )

        def member(p):
            outs, _ = render_rays_prop(
                lambda pos, dirs: spectral.forward(
                    p["main"], s_cfg, pos, dirs, sem_hidden=reassoc
                ),
                lambda pos: spectral.query_density_field(p["prop"], p_cfg, pos),
                ro, rd, aabb, key,
                num_samples=max_samples,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane, render_bkgd=bkgd,
                stratified=False, with_variance=with_variance,
                sem_final=(
                    spectral.semantic_final(p["main"]) if reassoc else None
                ),
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
