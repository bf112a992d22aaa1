"""Renderers: training, test, and probabilistic (uncertainty) passes.

TPU-native re-design of the reference renderer family
(``perception/models/utils.py``):

  * ``render_train`` ⇔ ``render_image_with_occgrid[_with_depth_guide]``
    (``utils.py:63-359``) + ``sem_rendering`` (``utils.py:362-461``).
    One dense pass: march → single field eval → visibility mask →
    weights → accumulation. The reference evaluates the field twice
    (sigma_fn inside ``OccGridEstimator.sampling`` for visibility, then
    again with grad inside ``sem_rendering``); here the visibility mask is
    computed from a stop-gradient view of the same densities — identical
    math, ~1.5× less field compute.
  * ``render_test`` ⇔ ``render_image_with_occgrid_test``
    (``utils.py:556-779``). The CUDA alive-ray iteration (≤64 samples/ray
    per round, termination planes, opacity early-stop) exists to bound
    *wasted* compute on a GPU; on TPU the single-shot dense pass with a
    larger static sample budget is both simpler and faster because the
    whole batch stays on the MXU. Early termination is a weights question,
    not a correctness one: samples behind an opaque surface get weight
    ≈ 0 from the same transmittance math.
  * ``render_probabilistic`` ⇔ ``render_probablistic_image_with_occgrid_test``
    (``utils.py:783-1032``): adds per-ray weighted variance of rgb and
    depth (``utils.py:984-999``) — computed here against the exact
    accumulated mean instead of the reference's streaming running mean.

All functions are jit/vmap-friendly and take the field as (params, apply
fns) so they vmap over ensemble members.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import volrend
from ..ops.grid_march import RaySegments, march_rays
from ..ops.occupancy import OccGridState


def _sample_positions(rays_o, rays_d, segs: RaySegments):
    t_mid = 0.5 * (segs.t_starts + segs.t_ends)  # [R, S]
    pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    return pos, t_mid


def render_rays(
    field_fn: Callable,  # (positions [R,S,3], dirs [R,S,3]) -> (rgb, sigma[, sem])
    rays_o: jnp.ndarray,  # [R, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    occ: OccGridState,
    lattice: jnp.ndarray,
    max_samples: int,
    render_bkgd: Optional[jnp.ndarray] = None,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 1e-4,
    occ_mean: Optional[jnp.ndarray] = None,
    near_planes: Optional[jnp.ndarray] = None,
    far_plane: float = 1e10,
    with_variance: bool = False,
    segments: Optional[RaySegments] = None,
) -> Dict[str, jnp.ndarray]:
    """Shared dense rendering pass. Returns dict with rgb/opacity/depth
    (+sem, +n_samples, and optionally rgb_var/depth_var).

    ``segments`` overrides the occupancy march with precomputed intervals
    (used by ablation/bisect tooling, scripts/bisect_occ_fault.py)."""
    segs = segments if segments is not None else march_rays(
        rays_o,
        rays_d,
        occ.binaries,
        occ.aabb,
        lattice,
        max_samples,
        near_planes=near_planes,
        far_plane=far_plane,
    )
    pos, t_mid = _sample_positions(rays_o, rays_d, segs)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)

    out = field_fn(pos, dirs)
    if len(out) == 3:
        rgbs, sigmas, sems = out
    else:
        rgbs, sigmas = out
        sems = None
    sigmas = sigmas[..., 0] * segs.valid  # [R, S]

    # Visibility filtering == OccGridEstimator.sampling's sigma_fn stage
    # (occ_grid.py:196-238): alpha_thre is clamped by the grid's mean
    # occupancy; removed samples are equivalent to sigma = 0.
    if alpha_thre > 0.0 or early_stop_eps > 0.0:
        thre = alpha_thre if occ_mean is None else jnp.minimum(alpha_thre, occ_mean)
        vis = volrend.render_visibility_from_density(
            segs.t_starts,
            segs.t_ends,
            jax.lax.stop_gradient(sigmas),
            early_stop_eps=early_stop_eps,
            alpha_thre=thre,
        )
        sigmas = sigmas * vis
        n_samples = jnp.sum(vis & segs.valid)
    else:
        n_samples = jnp.sum(segs.valid)

    weights, trans, alphas = volrend.render_weight_from_density(
        segs.t_starts, segs.t_ends, sigmas
    )
    outs = volrend.render_outputs(
        weights, segs.t_starts, segs.t_ends, rgbs, sems=sems, render_bkgd=render_bkgd
    )
    outs["n_samples"] = n_samples
    if with_variance:
        # Variance about the *unnormalized* accumulated mean, matching the
        # reference's statistic (utils.py:984-999) but exact.
        outs["rgb_var"] = volrend.render_variance(
            weights, rgbs, volrend.accumulate_along_rays(weights, rgbs)
        )
        depth_mean = outs["depth"]  # opacity-normalized, as accumulated
        outs["depth_var"] = volrend.render_variance(
            weights, t_mid[..., None], depth_mean
        )[..., 0:1]
    return outs


def render_train(
    field_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    occ: OccGridState,
    lattice: jnp.ndarray,
    max_samples: int,
    render_bkgd: jnp.ndarray,
    alpha_thre: float,
    occ_mean: jnp.ndarray,
    early_stop_eps: float = 1e-4,
    near_planes: Optional[jnp.ndarray] = None,
    segments: Optional[RaySegments] = None,
) -> Dict[str, jnp.ndarray]:
    """Training render (gradients flow through the field eval).

    The reference's ``_with_depth_guide`` variant carries a ``depth``
    argument whose filtering body is commented out upstream
    (``nerfacc/estimators/occ_grid.py:176-194``), i.e. it behaves
    identically to the plain renderer; we intentionally do not resurrect
    the dead filter.
    """
    return render_rays(
        field_fn,
        rays_o,
        rays_d,
        occ,
        lattice,
        max_samples,
        render_bkgd=render_bkgd,
        alpha_thre=alpha_thre,
        early_stop_eps=early_stop_eps,
        occ_mean=occ_mean,
        near_planes=near_planes,
        segments=segments,
    )


@partial(jax.jit, static_argnums=(0, 5, 7, 8))
def render_test(
    field_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    occ: OccGridState,
    lattice: jnp.ndarray,
    max_samples: int,
    render_bkgd: jnp.ndarray,
    alpha_thre: float,
    with_variance: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Inference render (``utils.py:556-779`` / ``:783-1032``)."""
    return render_rays(
        field_fn,
        rays_o,
        rays_d,
        occ,
        lattice,
        max_samples,
        render_bkgd=render_bkgd,
        alpha_thre=alpha_thre,
        occ_mean=jnp.mean(occ.occs),
        with_variance=with_variance,
    )
