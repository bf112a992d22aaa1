"""Inverse-CDF importance sampling over ray intervals.

TPU-native replacement for nerfacc's ``pdf.py`` (``searchsorted``,
``importance_sampling``, ``pdf.cu:84-456``): on the dense
[n_rays, n_bins] layout the per-segment flattened searchsorted becomes a
plain vmapped ``jnp.searchsorted`` and the CUDA resampling kernels become
pure jnp.

Semantics matched (file:line into /root/reference):
  * ``searchsorted`` (``perception/nerfacc/nerfacc/pdf.py:13-62``):
    for each query, indices (left, right) into the sorted key row such
    that keys[left] <= q < keys[right], clamped to the row.
  * ``importance_sampling`` (``pdf.py:65-178``): resample n_intervals
    per ray proportionally to interval weights via the inverse CDF,
    optionally stratified.
  * ``_sample_from_weighted`` reference behavior (``pdf.py:181-219``):
    padded uniform spacing in [pad, 1-pad], CDF clamped to its own mass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def searchsorted(
    sorted_keys: jnp.ndarray,  # [R, K]
    queries: jnp.ndarray,  # [R, Q]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (ids_left, ids_right), each [R, Q] (``pdf.py:13-62``)."""
    right = jax.vmap(
        lambda k, q: jnp.searchsorted(k, q, side="right")
    )(sorted_keys, queries)
    right = jnp.clip(right, 0, sorted_keys.shape[-1] - 1)
    left = jnp.clip(right - 1, 0, sorted_keys.shape[-1] - 1)
    return left, right


def sample_from_weighted(
    bins: jnp.ndarray,  # [R, B+1] interval edges
    weights: jnp.ndarray,  # [R, B]
    n_samples: int,
    key: jax.Array = None,
    stratified: bool = False,
    vmin: float = -jnp.inf,
    vmax: float = jnp.inf,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-CDF draw of sorted sample positions per ray → (samples
    [R, S], cdf edges [R, B+1]) (``pdf.py:181-219``)."""
    R, B = weights.shape
    pdf = weights / jnp.clip(
        jnp.sum(weights, axis=-1, keepdims=True), min=eps
    )
    cdf = jnp.concatenate(
        [jnp.zeros((R, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1
    )  # [R, B+1]
    if stratified and key is not None:
        pad = 1.0 / (2 * n_samples)
        u0 = jnp.linspace(pad, 1.0 - pad, n_samples)
        jitter = (
            jax.random.uniform(key, (R, n_samples)) - 0.5
        ) / n_samples
        u = u0[None, :] + jitter
    else:
        pad = 1.0 / (2 * n_samples)
        u = jnp.broadcast_to(
            jnp.linspace(pad, 1.0 - pad, n_samples), (R, n_samples)
        )
    u = u * cdf[:, -1:]  # clamp to available mass
    left, right = searchsorted(cdf, u)
    take = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=-1)
    cdf_l, cdf_r = take(cdf, left), take(cdf, right)
    bin_l, bin_r = take(bins, left), take(bins, right)
    frac = jnp.clip(
        (u - cdf_l) / jnp.where(cdf_r - cdf_l > eps, cdf_r - cdf_l, 1.0),
        0.0, 1.0,
    )
    samples = bin_l + frac * (bin_r - bin_l)
    return jnp.clip(samples, vmin, vmax), cdf


def searchsorted_onehot(
    sorted_keys: jnp.ndarray,  # [R, K]
    queries: jnp.ndarray,  # [R, Q]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free :func:`searchsorted`: identical (left, right) outputs
    computed as compare+count (VPU) instead of a vmapped binary search —
    row gathers cost ~7-11 ns each on the v5e regardless of table size
    (scripts/profile_honest2.py). Intended for small K (≤ a few hundred)."""
    K = sorted_keys.shape[-1]
    count = jnp.sum(
        (sorted_keys[:, None, :] <= queries[:, :, None]).astype(jnp.int32),
        axis=-1,
    )  # [R, Q] = searchsorted(side="right")
    right = jnp.clip(count, 0, K - 1)
    left = jnp.clip(right - 1, 0, K - 1)
    return left, right


def take_onehot(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather-free take_along_axis(arr [R,K], idx [R,Q], axis=-1) via a
    one-hot masked reduction. Exact in f32; O(R·Q·K) VPU work — use for
    small K."""
    K = arr.shape[-1]
    onehot = (
        idx[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    )
    return jnp.sum(jnp.where(onehot, arr[:, None, :], 0.0), axis=-1)


def sample_from_weighted_onehot(
    bins: jnp.ndarray,  # [R, B+1] interval edges
    weights: jnp.ndarray,  # [R, B]
    n_samples: int,
    key: jax.Array = None,
    stratified: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Gather-free inverse-CDF draw → sorted samples [R, S].

    Same math as :func:`sample_from_weighted`, but the bin lookup is a
    one-hot compare + masked reduction instead of searchsorted +
    take_along_axis. Honest v5e measurement (scripts/profile_honest2.py):
    XLA row gathers cost ~7-11 ns each regardless of table size, so the
    6-round binary search over [R, S] rows costs ~13 ms at production
    size, while the [R, S, B] compare+reduce is pure VPU (~1 ms at B=64).
    Exact in f32 (no MXU one-hot matmul — that would round through bf16).
    """
    R, B = weights.shape
    pdf = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), min=eps)
    cdf = jnp.concatenate(
        [jnp.zeros((R, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1
    )  # [R, B+1]
    pad = 1.0 / (2 * n_samples)
    if stratified and key is not None:
        u0 = jnp.linspace(pad, 1.0 - pad, n_samples)
        u = u0[None, :] + (
            jax.random.uniform(key, (R, n_samples)) - 0.5
        ) / n_samples
    else:
        u = jnp.broadcast_to(
            jnp.linspace(pad, 1.0 - pad, n_samples), (R, n_samples)
        )
    u = u * cdf[:, -1:]  # [R, S]

    # one-hot interval membership [R, S, B]:
    # bin b is selected iff cdf[b] <= u < cdf[b+1] (last bin closed above)
    cdf_lo = cdf[:, None, :-1]  # [R, 1, B]
    cdf_hi = cdf[:, None, 1:]
    uu = u[:, :, None]
    hit = (uu >= cdf_lo) & (uu < cdf_hi)
    # closed last bin: if u lands at/after the final cdf value
    last = jnp.zeros((B,), bool).at[B - 1].set(True)
    hit = hit | ((uu >= cdf[:, None, -1:]) & last[None, None, :])
    hitf = hit.astype(u.dtype)

    def pick(row_vals):  # [R, B] -> [R, S]
        return jnp.sum(hitf * row_vals[:, None, :], axis=-1)

    cdf_l = pick(cdf[:, :-1])
    cdf_r = pick(cdf[:, 1:])
    bin_l = pick(bins[:, :-1])
    bin_r = pick(bins[:, 1:])
    frac = jnp.clip(
        (u - cdf_l) / jnp.where(cdf_r - cdf_l > eps, cdf_r - cdf_l, 1.0),
        0.0, 1.0,
    )
    return bin_l + frac * (bin_r - bin_l)


def importance_sampling_onehot(
    t_edges: jnp.ndarray,  # [R, B+1]
    weights: jnp.ndarray,  # [R, B]
    n_intervals: int,
    key: jax.Array = None,
    stratified: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free :func:`importance_sampling` → (edges [R, S+1],
    midpoints [R, S]).

    No sort: the uniform positions u are non-decreasing per row (linspace
    + jitter bounded by half the spacing) and the CDF is monotone, so the
    inverse-CDF samples are already sorted — a [R, S] sort here measured
    as pure waste on the v5e."""
    edges = sample_from_weighted_onehot(
        t_edges, weights, n_intervals + 1, key=key, stratified=stratified
    )
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
    return edges, mids


def importance_sampling(
    t_edges: jnp.ndarray,  # [R, B+1] interval edges
    weights: jnp.ndarray,  # [R, B] per-interval weights
    n_intervals: int,
    key: jax.Array = None,
    stratified: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample n_intervals per ray → (new edges [R, n_intervals+1],
    midpoints [R, n_intervals]) (``pdf.py:65-178``)."""
    edges, _ = sample_from_weighted(
        t_edges, weights, n_intervals + 1, key=key, stratified=stratified,
        vmin=t_edges[..., :1].min(), vmax=t_edges[..., -1:].max(),
    )
    edges = jnp.sort(edges, axis=-1)
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
    return edges, mids
