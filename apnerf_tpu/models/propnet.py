"""Proposal-network estimator (importance sampling through density fields).

Capability parity with nerfacc's ``PropNetEstimator``
(``perception/nerfacc/nerfacc/estimators/prop_net.py:17-313``), used by the
reference's prop-net example trainer (``perception/models/
train_ngp_nerf_prop.py``). Dense [R, S] formulation:

  * ``sampling``: iterate (uniform-or-lindisp warped) edges → proposal
    density → weights → ``importance_sampling`` for the next round
    (``prop_net.py:61-134``).
  * ``compute_prop_loss``: the PDF matching loss ``lossfun_outer`` between
    the final NeRF weights and each proposal's weights
    (``prop_net.py:136-180, 270-313``).
  * transform warps ``_transform_stot`` (``prop_net.py:230-248``).

Functional: proposal params are trained jointly by whatever optimizer the
caller uses; no requires_grad caching is needed under JAX autodiff.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.pdf import (
    importance_sampling,
    importance_sampling_onehot,
    searchsorted,
)
from ..ops.volrend import render_weight_from_density


def transform_stot(
    transform_type: str, s_vals: jnp.ndarray, t_min, t_max
) -> jnp.ndarray:
    """s in [0,1] → t, 'uniform' or 'lindisp' (``prop_net.py:230-248``)."""
    t_min = jnp.asarray(t_min)[..., None]
    t_max = jnp.asarray(t_max)[..., None]
    if transform_type == "uniform":
        return s_vals * (t_max - t_min) + t_min
    if transform_type == "lindisp":
        inv = s_vals / jnp.clip(t_max, min=1e-10) + (1 - s_vals) / jnp.clip(
            t_min, min=1e-10
        )
        return 1.0 / jnp.clip(inv, min=1e-10)
    raise ValueError(transform_type)


def propnet_sampling(
    key: jax.Array,
    prop_sigma_fns: Sequence[Callable],  # each: positions [R,S,3]-free; takes (t0,t1) edges? see below
    prop_samples: Sequence[int],
    num_samples: int,
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    near_plane: float,
    far_plane: float,
    sampling_type: str = "lindisp",
    stratified: bool = False,
    use_onehot: bool = False,
):
    """Hierarchical proposal sampling (``prop_net.py:61-134``).

    Each prop_sigma_fn maps (t_starts [R,S], t_ends [R,S]) → sigmas [R,S].
    Returns (t_starts, t_ends [R, num_samples], per-level (edges, weights)
    for the prop loss).

    ``near_plane``/``far_plane`` may be scalars or per-ray [R] arrays
    (e.g. from ``ray_aabb_intersect``). ``use_onehot=True`` routes the
    inverse-CDF through the gather-free compare+reduce path
    (``ops/pdf.sample_from_weighted_onehot``) — the TPU production route.
    """
    R = rays_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(near_plane, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(far_plane, jnp.float32), (R,))

    # initial uniform-in-s edges
    n0 = prop_samples[0] if prop_sigma_fns else num_samples
    s_edges = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n0 + 1), (R, n0 + 1))
    level_outputs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    resample = importance_sampling_onehot if use_onehot else importance_sampling

    for i, (fn, n_next) in enumerate(
        zip(prop_sigma_fns, list(prop_samples[1:]) + [num_samples])
    ):
        t_edges = transform_stot(sampling_type, s_edges, t_min, t_max)
        t0, t1 = t_edges[..., :-1], t_edges[..., 1:]
        sigmas = fn(t0, t1)
        weights, _, _ = render_weight_from_density(t0, t1, sigmas)
        level_outputs.append((t_edges, weights))
        key, sub = jax.random.split(key)
        s_edges, _ = resample(
            s_edges, weights, n_next, key=sub, stratified=stratified
        )

    t_edges = transform_stot(sampling_type, s_edges, t_min, t_max)
    return t_edges[..., :-1], t_edges[..., 1:], level_outputs


def _outer(
    t0: jnp.ndarray, t1: jnp.ndarray, y: jnp.ndarray,
    t0_env: jnp.ndarray, t1_env: jnp.ndarray, y_env: jnp.ndarray,
    use_onehot: bool = False,
) -> jnp.ndarray:
    """Sum of y mass inside each envelope bin (mipnerf360 ``lossfun_outer``
    inner op, ``prop_net.py:250-287``). ``use_onehot`` routes index lookup
    through the gather-free compare+reduce path (identical outputs)."""
    from ..ops.pdf import searchsorted_onehot, take_onehot

    cy = jnp.concatenate(
        [jnp.zeros_like(y[..., :1]), jnp.cumsum(y, axis=-1)], axis=-1
    )
    ss = searchsorted_onehot if use_onehot else searchsorted
    idx_lo_l, _ = ss(t1, t0_env)
    _, idx_hi_r = ss(t0, t1_env)
    if use_onehot:
        take = take_onehot
    else:
        take = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=-1)
    cy_lo = take(cy, idx_lo_l)
    cy_hi = take(cy, jnp.clip(idx_hi_r, 0, y.shape[-1]))
    return jnp.clip(cy_hi - cy_lo, min=0.0)


def prop_loss(
    level_outputs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    final_edges_t0: jnp.ndarray,  # [R, S]
    final_edges_t1: jnp.ndarray,
    final_weights: jnp.ndarray,  # [R, S]
    use_onehot: bool = False,
) -> jnp.ndarray:
    """PDF matching loss (``prop_net.py:136-180``): each proposal's
    envelope must upper-bound the final NeRF weights."""
    w = jax.lax.stop_gradient(final_weights)
    t0 = jax.lax.stop_gradient(final_edges_t0)
    t1 = jax.lax.stop_gradient(final_edges_t1)
    loss = 0.0
    for t_edges, w_prop in level_outputs:
        # proposal mass covering each final bin → [R, S_final]
        w_outer = _outer(
            t_edges[..., :-1], t_edges[..., 1:], w_prop, t0, t1, w,
            use_onehot=use_onehot,
        )
        # clip((w - w_outer)^2 / (w + eps)) per mipnerf360
        loss = loss + jnp.mean(
            jnp.clip(w - w_outer, min=0.0) ** 2 / (w + 1e-7)
        )
    return loss
