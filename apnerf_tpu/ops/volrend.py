"""Dense volume rendering on ``[n_rays, n_samples]`` buffers.

TPU-native replacement for the reference's packed-sample volume rendering
runtime (vendored nerfacc ``volrend.py``, ``scan.py``, ``pack.py`` and the
CUDA segmented scans in ``cuda/csrc/scan.cu``): with samples padded to a
static per-ray width and a validity mask, every segmented scan becomes a
plain per-row ``cumsum``/``cumprod`` that XLA maps straight onto the VPU,
and every ``index_add_`` accumulation becomes a masked row reduction.

Semantics matched (file:line into /root/reference):
  * transmittance from density:  T_i = exp(-sum_{j<i} sigma_j dt_j)
    (``perception/nerfacc/nerfacc/volrend.py:164-267``)
  * weights from density:        w_i = T_i (1 - exp(-sigma_i dt_i))
    (``volrend.py:270-365``)
  * visibility filtering:        alpha_i >= alpha_thre and T_i > early_stop_eps
    (``volrend.py:368-483``); dropping a sample == treating sigma_i = 0,
    which is exactly what the mask does here.
  * accumulation + background compositing and opacity-normalized depth
    (``volrend.py:486-576``; ``perception/models/utils.py:362-461``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def exclusive_sum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive cumulative sum along ``axis``.

    Dense replacement for nerfacc's packed ``exclusive_sum``
    (``scan.py:57-99`` / ``scan.cu``): with one ray per row, segment
    boundaries coincide with row boundaries for free.
    """
    csum = jnp.cumsum(x, axis=axis)
    return csum - x


def exclusive_prod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive cumulative product along ``axis`` (``scan.py:142-275``)."""
    cprod = jnp.cumprod(x, axis=axis)
    # Shift right by one; safe (no division) for zeros in x.
    return jnp.concatenate(
        [
            jnp.ones_like(jnp.take(cprod, jnp.array([0]), axis=axis)),
            jax.lax.slice_in_dim(cprod, 0, x.shape[axis] - 1, axis=axis),
        ],
        axis=axis,
    )


def render_transmittance_from_density(
    t_starts: jnp.ndarray,  # [R, S]
    t_ends: jnp.ndarray,  # [R, S]
    sigmas: jnp.ndarray,  # [R, S]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (trans, alphas), each [R, S] (``volrend.py:164-229``)."""
    sigmas_dt = sigmas * (t_ends - t_starts)
    alphas = 1.0 - jnp.exp(-sigmas_dt)
    trans = jnp.exp(-exclusive_sum(sigmas_dt, axis=-1))
    return trans, alphas


def render_weight_from_density(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    sigmas: jnp.ndarray,
    prefix_trans: Optional[jnp.ndarray] = None,  # [R] or [R, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (weights, trans, alphas), each [R, S] (``volrend.py:270-365``).

    ``prefix_trans`` supports chunked marching (the test-renderer loop at
    ``perception/models/utils.py:707-714`` passes 1 - opacity_so_far).
    """
    trans, alphas = render_transmittance_from_density(t_starts, t_ends, sigmas)
    if prefix_trans is not None:
        prefix_trans = jnp.reshape(prefix_trans, (-1, 1))
        trans = trans * prefix_trans
    weights = trans * alphas
    return weights, trans, alphas


def render_transmittance_from_alpha(
    alphas: jnp.ndarray, prefix_trans: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """T_i = prod_{j<i} (1 - alpha_j) (``volrend.py:164-213``)."""
    trans = exclusive_prod(1.0 - alphas, axis=-1)
    if prefix_trans is not None:
        trans = trans * jnp.reshape(prefix_trans, (-1, 1))
    return trans


def render_weight_from_alpha(
    alphas: jnp.ndarray, prefix_trans: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(weights, trans) from alphas (``volrend.py:270-310``)."""
    trans = render_transmittance_from_alpha(alphas, prefix_trans)
    return trans * alphas, trans


def render_visibility_from_alpha(
    alphas: jnp.ndarray,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
) -> jnp.ndarray:
    """Boolean visibility mask from alphas (``volrend.py:368-422``).

    As in nerfacc: samples failing the alpha test do not attenuate the
    transmittance used for the early-stop test.
    """
    vis_alpha = alphas >= alpha_thre
    alphas_kept = jnp.where(vis_alpha, alphas, 0.0)
    trans = exclusive_prod(1.0 - alphas_kept, axis=-1)
    return vis_alpha & (trans > early_stop_eps)


def render_visibility_from_density(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    sigmas: jnp.ndarray,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
) -> jnp.ndarray:
    """Boolean visibility mask [R, S] (``volrend.py:425-483``).

    A sample survives iff its alpha clears ``alpha_thre`` AND the
    transmittance *computed over surviving earlier samples* stays above
    ``early_stop_eps``. As in nerfacc, the transmittance test uses
    alpha-thresholded sigmas (invisible samples don't attenuate).
    """
    sigmas_dt = sigmas * (t_ends - t_starts)
    alphas = 1.0 - jnp.exp(-sigmas_dt)
    vis_alpha = alphas >= alpha_thre
    sigmas_dt_kept = jnp.where(vis_alpha, sigmas_dt, 0.0)
    trans = jnp.exp(-exclusive_sum(sigmas_dt_kept, axis=-1))
    return vis_alpha & (trans > early_stop_eps)


def accumulate_along_rays(
    weights: jnp.ndarray,  # [R, S]
    values: Optional[jnp.ndarray] = None,  # [R, S, C] or None
) -> jnp.ndarray:
    """Sum_i w_i * v_i per ray → [R, C] (or [R, 1] opacity when values is
    None). Dense replacement for nerfacc ``accumulate_along_rays``
    (``volrend.py:486-550``)."""
    if values is None:
        return jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("rs,rsc->rc", weights, values)


def render_outputs(
    weights: jnp.ndarray,  # [R, S]
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    rgbs: jnp.ndarray,  # [R, S, 3]
    sems: Optional[jnp.ndarray] = None,  # [R, S, C] logits, or [R, S, H]
    render_bkgd: Optional[jnp.ndarray] = None,  # [3]
    sem_final: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (W, b)
) -> Dict[str, jnp.ndarray]:
    """Accumulate colors/opacity/depth(/semantics) with the reference's
    conventions (``perception/models/utils.py:438-461``): depth is the
    opacity-normalized expected midpoint distance; background is composited
    onto color only.

    ``sem_final=(W [H, C], b [C])``: ``sems`` is the semantic head's last
    HIDDEN activation (bf16, ``models/nn.apply_mlp_hidden``); the final
    linear layer is applied AFTER accumulation — exact reassociation
    (Σ_s w·(h·W + b) = (Σ_s w·h)·W + b·Σ_s w), so the wide [R, S, C] f32
    per-sample logits tensor never materializes (r4 trace: ~2 ms/step of
    relayout copies at production size)."""
    colors = accumulate_along_rays(weights, rgbs)
    opacities = accumulate_along_rays(weights, None)
    t_mid = ((t_starts + t_ends) * 0.5)[..., None]
    depths = accumulate_along_rays(weights, t_mid)
    eps = jnp.finfo(rgbs.dtype).eps
    depths = depths / jnp.clip(opacities, min=eps)
    out = {"rgb": colors, "opacity": opacities, "depth": depths}
    if sems is not None:
        if sem_final is not None:
            W, b = sem_final
            acc_h = jnp.einsum(
                "rs,rsh->rh", weights.astype(sems.dtype), sems,
                preferred_element_type=jnp.float32,
            )
            out["sem"] = (
                jnp.dot(
                    acc_h.astype(sems.dtype), W.astype(sems.dtype),
                    preferred_element_type=jnp.float32,
                )
                + b * opacities
            )
        else:
            # (an APNERF_BF16_SEM bf16-accumulation variant was measured
            # on the v5e 2026-08-17: 1.546x vs 1.548x — no gain, deleted)
            out["sem"] = accumulate_along_rays(weights, sems)
    if render_bkgd is not None:
        out["rgb"] = out["rgb"] + render_bkgd * (1.0 - opacities)
    return out


def render_variance(
    weights: jnp.ndarray,  # [R, S]
    values: jnp.ndarray,  # [R, S, C]
    mean: jnp.ndarray,  # [R, C] — the (unnormalized) accumulated mean
) -> jnp.ndarray:
    """Per-ray weighted variance sum_i w_i (v_i - mean)^2 → [R, C].

    The reference accumulates this against a *running* mean inside its
    alive-ray loop (``perception/models/utils.py:984-999``), an
    approximation forced by its streaming layout. With dense samples we use
    the final accumulated mean — exact, and strictly a refinement of the
    same statistic.
    """
    diff = values - mean[:, None, :]
    return jnp.einsum("rs,rsc->rc", weights, diff * diff)
