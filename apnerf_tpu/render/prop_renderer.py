"""Proposal-network renderer — the TPU flagship sampling path.

Replaces occupancy-grid lattice marching in the *training/rendering hot
path* with hierarchical proposal sampling (the reference ships exactly
this alternative: ``perception/nerfacc/nerfacc/estimators/prop_net.py`` +
``perception/models/train_ngp_nerf_prop.py``; nerfacc's own benchmarks put
it at PSNR 31.76 vs 33.11 for occ-grid on NeRF-Synthetic,
``docs/.../ngp.rst:44-46``).

Why this is the TPU-native choice: the occupancy lattice tests R×K≈4.2M
grid cells per step and XLA random gathers cost ~7-11 ns per row on a v5e
(scripts/profile_honest2.py) — ~34 ms/member-step of pure pointer chasing.
Proposal sampling replaces all of it with a small density-MLP evaluation
(MXU matmuls) plus a gather-free inverse-CDF (compare+reduce, VPU): zero
random memory access in the entire train step. The occupancy grid itself
is still maintained (cheap, amortized) because the *planner* consumes its
binaries — it just no longer sits in the per-step sampling path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import os

from ..models.propnet import prop_loss, propnet_sampling
from ..ops import volrend
from ..ops.grid_march import ray_aabb_intersect


def _render_weights(t0, t1, sigmas):
    """Weights chain. APNERF_FUSED_VOLREND=1 routes through the fused
    Pallas kernel (``ops/pallas/volrend_pallas.py``, oracle-tested fwd+bwd)
    — measured 1.123x vs 1.147x baseline for the plain XLA chain on the
    v5e (XLA already fuses this elementwise+cumsum pattern well), so the
    XLA path is the default and the kernel stays available for platforms
    where it wins."""
    if os.environ.get("APNERF_FUSED_VOLREND", "0") == "1":
        from ..ops.pallas import fused_render_weights

        return fused_render_weights(t0, t1, sigmas)
    w, _, _ = volrend.render_weight_from_density(t0, t1, sigmas)
    return w


def prop_sample_intervals(
    prop_density_fn: Callable,  # (positions [R,Sp,3]) -> sigma [R,Sp,1]
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    aabb: jnp.ndarray,  # [6]
    key: jax.Array,
    num_samples: int,
    num_prop_samples: int = 64,
    near_plane: float = 0.1,
    far_plane: float = 1e10,
    stratified: bool = True,
    sampling_type: str = "uniform",
):
    """Front half of ``render_rays_prop``: aabb clip + one proposal round.

    Returns (t0, t1, t_mid, pos, miss, levels). t0/t1 are detached, as
    nerfacc's estimator samples under no_grad (``prop_net.py:61-134``);
    the proposal net learns only through ``prop_loss`` over ``levels``.
    Shared by the renderer and the fused loss+grad train path
    (``train/flagship.py``)."""
    t_min, t_max = ray_aabb_intersect(
        rays_o, rays_d, aabb, near_plane=near_plane, far_plane=far_plane
    )
    miss = t_min >= t_max
    t_lo = jnp.where(miss, near_plane, jnp.maximum(t_min, near_plane))
    t_hi = jnp.where(miss, near_plane * (1 + 1e-4), t_max)

    def prop_sigma_fn(t0, t1):
        t_mid = 0.5 * (t0 + t1)
        pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
        return prop_density_fn(pos)[..., 0]

    t0, t1, levels = propnet_sampling(
        key,
        [prop_sigma_fn],
        [num_prop_samples],
        num_samples,
        rays_o,
        rays_d,
        near_plane=t_lo,
        far_plane=t_hi,
        sampling_type=sampling_type,
        stratified=stratified,
        use_onehot=True,
    )
    t0 = jax.lax.stop_gradient(t0)
    t1 = jax.lax.stop_gradient(t1)
    t_mid = 0.5 * (t0 + t1)
    pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    return t0, t1, t_mid, pos, miss, levels


def render_rays_prop(
    field_fn: Callable,  # (positions [R,S,3], dirs [R,S,3]) -> (rgb, sigma[, sem])
    prop_density_fn: Callable,  # (positions [R,Sp,3]) -> sigma [R,Sp,1]
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    aabb: jnp.ndarray,  # [6]
    key: jax.Array,
    num_samples: int,
    num_prop_samples: int = 64,
    near_plane: float = 0.1,
    far_plane: float = 1e10,
    render_bkgd: Optional[jnp.ndarray] = None,
    stratified: bool = True,
    sampling_type: str = "uniform",
    with_variance: bool = False,
    sem_final: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    field_packed_fn: Optional[Callable] = None,
    field_packed_vr_fn: Optional[Callable] = None,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """One proposal round + main field render.

    Returns (outs dict like ``renderer.render_rays``, prop_loss_value).
    Rays that miss the aabb get a degenerate near≈far interval → zero
    weights → pure background (same contract as the occ path).

    ``sem_final=(W, b)``: ``field_fn`` returns the semantic head's last
    hidden activation instead of logits (``spectral.forward(...,
    sem_hidden=True)``); the final linear layer applies after
    accumulation (volrend.render_outputs reassociation).

    ``field_packed_fn``: the whole-field-kernel fast path
    (``spectral.forward_packed``) — ``(pos [R,S,3], rays_d [R,3]) →
    packed [4+C, R, S]`` (rgb/sigma/sem channel-major). When given it
    replaces ``field_fn`` and the per-channel accumulation collapses to
    ONE einsum over the packed rows; outputs are identical (same math,
    oracle-tested in tests/test_pallas_fused_field.py).
    """
    R = rays_o.shape[0]
    t0, t1, t_mid, pos, miss, levels = prop_sample_intervals(
        prop_density_fn, rays_o, rays_d, aabb, key,
        num_samples=num_samples, num_prop_samples=num_prop_samples,
        near_plane=near_plane, far_plane=far_plane,
        stratified=stratified, sampling_type=sampling_type,
    )

    if field_packed_vr_fn is not None and not with_variance:
        # fused field+volrend kernel: per-sample field values never leave
        # VMEM; the kernel returns per-RAY accumulations + the weights
        # row prop_loss consumes (detached). Background compositing and
        # the depth normalization stay out here (tiny [R, .] ops).
        acc, weights = field_packed_vr_fn(pos, rays_d, t0, t1, miss)
        accT = acc.T  # [R, 5+C]
        opacities = accT[:, 3:4]
        depths = accT[:, 4:5] / jnp.clip(
            opacities, min=jnp.finfo(acc.dtype).eps
        )
        rgb_acc = accT[:, 0:3]
        if render_bkgd is not None:
            rgb_acc = rgb_acc + render_bkgd * (1.0 - opacities)
        outs = {
            "rgb": rgb_acc,
            "opacity": opacities,
            "depth": depths,
            "sem": accT[:, 5:],
            "n_samples": jnp.sum(~miss) * num_samples,
        }
        p_loss = prop_loss(levels, t0, t1, weights, use_onehot=True)
        return outs, p_loss

    if field_packed_fn is not None:
        yT = field_packed_fn(pos, rays_d)  # [4+C, R, S]
        sigmas = yT[3] * (~miss[:, None])
        weights = _render_weights(t0, t1, sigmas)
        # all channels accumulate in one pass over the packed rows (the
        # weighted sigma row comes along for free and is discarded).
        # einsum, measured: the ~0.6 ms/step of reshape/copy the r4 trace
        # shows around the custom-call boundary is CHEAPER than the
        # multiply+reduce alternative (1.715× vs 1.679× bench A/B — the
        # [C,R,S]×[R,S] reduction runs on the MXU as a batched matvec)
        acc = jnp.einsum("rs,crs->rc", weights, yT)
        opacities = jnp.sum(weights, axis=-1, keepdims=True)
        depths = jnp.einsum("rs,rs->r", weights, t_mid)[:, None]
        depths = depths / jnp.clip(opacities, min=jnp.finfo(yT.dtype).eps)
        rgb_acc = acc[:, 0:3]
        if render_bkgd is not None:
            rgb_acc = rgb_acc + render_bkgd * (1.0 - opacities)
        outs = {
            "rgb": rgb_acc,
            "opacity": opacities,
            "depth": depths,
            "sem": acc[:, 4:],
            "n_samples": jnp.sum(~miss) * num_samples,
        }
        if with_variance:
            rgbs_rs = jnp.moveaxis(yT[0:3], 0, -1)  # [R, S, 3]
            outs["rgb_var"] = volrend.render_variance(
                weights, rgbs_rs, acc[:, 0:3]
            )
            outs["depth_var"] = volrend.render_variance(
                weights, t_mid[..., None], outs["depth"]
            )[..., 0:1]
        p_loss = prop_loss(levels, t0, t1, weights, use_onehot=True)
        return outs, p_loss

    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    out = field_fn(pos, dirs)
    if len(out) == 3:
        rgbs, sigmas, sems = out
    else:
        rgbs, sigmas = out
        sems = None
    sigmas = sigmas[..., 0] * (~miss[:, None])

    weights = _render_weights(t0, t1, sigmas)
    outs = volrend.render_outputs(
        weights, t0, t1, rgbs, sems=sems, render_bkgd=render_bkgd,
        sem_final=sem_final,
    )
    # NOTE: counts every sample on every aabb-hitting ray (the prop path
    # evaluates the field densely at all of them); the occ path's renderer
    # instead reports compacted *valid* samples. The two auxes measure the
    # work each path actually does and are NOT comparable across paths.
    outs["n_samples"] = jnp.sum(~miss) * num_samples
    if with_variance:
        outs["rgb_var"] = volrend.render_variance(
            weights, rgbs, volrend.accumulate_along_rays(weights, rgbs)
        )
        outs["depth_var"] = volrend.render_variance(
            weights, t_mid[..., None], outs["depth"]
        )[..., 0:1]
    p_loss = prop_loss(levels, t0, t1, weights, use_onehot=True)
    return outs, p_loss
