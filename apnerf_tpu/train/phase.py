"""Multi-step training phases: a whole block of optimizer steps as ONE
XLA program.

The reference dispatches ~15 CUDA kernels per member per step from Python
(``scripts/pipeline.py:382-532``). On TPU — especially through a remote
runtime — per-step dispatch dominates; here ``lax.scan`` rolls
``steps_per_call`` full ensemble steps (occupancy update cadence included)
into one compiled program, and the bootstrap image sampling moves in-jit:

  * member 0 draws uniformly from all ``size`` images;
  * member m>0 draws from its padded bootstrap pool (inverse-CDF over the
    valid prefix), matching ``habitat_to_data.py:178-182``;
  * the 50% recent-data bias during planning (``pipeline.py:421-434``)
    becomes a per-step coin + masked redraw.

The host only supplies (pools, counts, size) once per phase.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import os
import jax.numpy as jnp

from ..config import PipelineConfig
from ..data.dataset import RayDataset, fetch_rays
from .step import EnsembleState, make_member_core


def pools_from_dataset(ds: RayDataset) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padded bootstrap pools [E, P_CAP] + counts [E] for in-jit sampling.
    Member 0's pool is the identity (all images)."""
    import numpy as np

    cap = max(ds.max_images, int(ds.max_images * ds.boot_scale) + 1)
    pools = np.zeros((ds.num_models, cap), dtype=np.int32)
    counts = np.zeros((ds.num_models,), dtype=np.int32)
    pools[0, : ds.size] = np.arange(ds.size)
    counts[0] = ds.size
    for m in range(1, ds.num_models):
        p = ds.bootstrap(m)
        n = min(len(p), cap)
        pools[m, :n] = p[:n]
        counts[m] = n
    return jnp.asarray(pools), jnp.asarray(counts)


def _sample_pool_index(
    pool: jnp.ndarray,  # [P]
    count: jnp.ndarray,  # []
    key: jax.Array,
    recent_bias: jnp.ndarray,  # [] bool
    size: jnp.ndarray,  # [] total images
    sample_disc: int,
) -> jnp.ndarray:
    """One training-image index from a member's pool (in-jit equivalent of
    RayDataset.sample_image_indices)."""
    k_coin, k_pick = jax.random.split(key)
    P = pool.shape[0]
    valid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0] < count
    recent = valid & (pool >= size - sample_disc)
    use_recent = (
        recent_bias
        & (jax.random.uniform(k_coin) < 0.5)
        & jnp.any(recent)
    )
    mask = jnp.where(use_recent, recent, valid).astype(jnp.float32)
    cdf = jnp.cumsum(mask)
    u = jax.random.uniform(k_pick) * cdf[-1]
    pos = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, P - 1)
    return pool[pos]


def make_train_phase(cfg: PipelineConfig, schedule=None,
                     batch_constraint=None, member_core=None):
    """Returns phase_fn(state, images, depths, semantics, camtoworlds, K,
    pools, counts, size, key, occ_thre, recent_bias) -> (state, losses)

    with losses [steps_per_call, E]; steps_per_call is baked at trace time
    from key's leading dim: pass key of shape [steps_per_call, 2].

    ``member_core`` defaults to the occ-grid NGP core; the flagship
    (spectral + proposal) path passes its own core with the same
    signature (train/flagship.py).
    """
    if member_core is None:
        member_core = make_member_core(cfg, schedule)

    @jax.jit
    def phase_fn(
        state: EnsembleState,
        images, depths, semantics, camtoworlds, K,
        pools, counts,          # [E, P], [E]
        size,                   # [] int32
        keys,                   # [steps, key] — one key per step
        occ_thre,               # []
        recent_bias,            # [] bool
    ):
        E = cfg.n_ensembles

        def one_step(state, key):
            k_pick, k_fetch, k_occ = jax.random.split(key, 3)
            pick_keys = jax.random.split(k_pick, E)
            image_idx = jax.vmap(
                lambda p, c, k: _sample_pool_index(
                    p, c, k, recent_bias, size, cfg.sample_disc
                )
            )(pools, counts, pick_keys)

            fetch_keys = jax.random.split(k_fetch, E)
            batch = jax.vmap(
                lambda idx, k: fetch_rays(
                    images, depths, semantics, camtoworlds, K, idx, k,
                    cfg.num_rays, training=True,
                )
            )(image_idx, fetch_keys)
            if batch_constraint is not None:
                batch = batch_constraint(batch)

            occ_keys = jax.random.split(k_occ, E)
            vstep = jax.vmap(member_core, in_axes=(0, 0, 0, 0, 0, None, None))
            (params, opt_state, occ, loss, *_rest) = vstep(
                state.params, state.opt_state, state.occ, batch, occ_keys,
                state.step, occ_thre,
            )
            new_state = EnsembleState(
                params=params, opt_state=opt_state, occ=occ,
                step=state.step + 1,
            )
            return new_state, loss

        state, losses = jax.lax.scan(
            one_step, state, keys,
            unroll=int(os.environ.get("APNERF_SCAN_UNROLL", "1")),
        )
        return state, losses

    return phase_fn
