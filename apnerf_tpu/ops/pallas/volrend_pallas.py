"""Fused transmittance→weights Pallas kernel with a custom VJP.

The per-ray weight computation (reference CUDA: segmented scans in
``perception/nerfacc/nerfacc/cuda/csrc/scan.cu:9-303`` feeding
``render_weight_from_density``, ``volrend.py:270-365``) is

    s_k     = sigma_k * (t1_k - t0_k)
    T_k     = exp(-sum_{i<k} s_i)          (transmittance)
    a_k     = 1 - exp(-s_k)                (alpha)
    w_k     = T_k * a_k

As XLA ops this is a chain of ~6 full passes over the [R, S] buffers
(multiply, cumsum, two exps, subtract, multiply) plus the same again,
reversed, in the backward. This kernel does each direction in ONE VMEM
pass per ray tile: the prefix sum is a Hillis–Steele scan over the lane
dimension built from ``pltpu.roll`` (log2(S) masked roll-adds), and the
backward uses the closed form

    dL/ds_j  = g_j * T_j * e_j  -  sum_{k>j} g_k w_k
    suffix_j = total(g*w) - inclusive_cumsum(g*w)_j

with dL/dsigma = dt * bracket and dL/ddt = sigma * bracket.

CPU/tests run the same kernel in interpreter mode; the public entry
falls back automatically off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256


def _lane_inclusive_cumsum(x):
    """Hillis–Steele inclusive prefix sum along the last (lane) dim."""
    S = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    shift = 1
    while shift < S:
        rolled = pltpu.roll(x, shift, len(x.shape) - 1)
        x = jnp.where(idx >= shift, x + rolled, x)
        shift *= 2
    return x


def _fwd_kernel(t0_ref, t1_ref, sig_ref, w_ref, trans_ref, alpha_ref):
    dt = t1_ref[:] - t0_ref[:]
    s = sig_ref[:] * dt
    incl = _lane_inclusive_cumsum(s)
    trans = jnp.exp(s - incl)  # exp(-(incl - s)) = exclusive-sum transmittance
    e = jnp.exp(-s)
    alpha = 1.0 - e
    w_ref[:] = trans * alpha
    trans_ref[:] = trans
    alpha_ref[:] = alpha


def _bwd_kernel(t0_ref, t1_ref, sig_ref, g_ref, dsig_ref, dt0_ref, dt1_ref):
    dt = t1_ref[:] - t0_ref[:]
    sig = sig_ref[:]
    s = sig * dt
    incl = _lane_inclusive_cumsum(s)
    trans = jnp.exp(s - incl)
    e = jnp.exp(-s)
    w = trans * (1.0 - e)
    g = g_ref[:]
    gw = g * w
    gw_incl = _lane_inclusive_cumsum(gw)
    total = jnp.sum(gw, axis=-1, keepdims=True)
    suffix = total - gw_incl  # sum over k > j
    bracket = g * trans * e - suffix
    dsig_ref[:] = dt * bracket
    ddt = sig * bracket
    dt0_ref[:] = -ddt
    dt1_ref[:] = ddt


def _tiles(R):
    tile = min(_TILE_R, R)
    while R % tile:
        tile //= 2
    return max(tile, 1)


def _call_fwd(t0, t1, sigmas, interpret):
    R, S = sigmas.shape
    tile = _tiles(R)
    spec = pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(R // tile,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, S), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
    )(t0, t1, sigmas)


def _call_bwd(t0, t1, sigmas, g, interpret):
    R, S = sigmas.shape
    tile = _tiles(R)
    spec = pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(R // tile,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, S), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
    )(t0, t1, sigmas, g)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


@jax.custom_vjp
def fused_render_weights(t0, t1, sigmas):
    """Volume-rendering weights [R, S] from interval edges and densities —
    single-pass Pallas kernel (see module docstring). Only the weights are
    differentiable outputs; cotangents flow to (t0, t1, sigmas)."""
    w, _, _ = _call_fwd(
        t0.astype(jnp.float32), t1.astype(jnp.float32),
        sigmas.astype(jnp.float32), _use_interpret(),
    )
    return w


def _frw_fwd(t0, t1, sigmas):
    w = fused_render_weights(t0, t1, sigmas)
    return w, (t0, t1, sigmas)


def _frw_bwd(res, g):
    t0, t1, sigmas = res
    dsig, dt0, dt1 = _call_bwd(
        t0.astype(jnp.float32), t1.astype(jnp.float32),
        sigmas.astype(jnp.float32), g.astype(jnp.float32), _use_interpret(),
    )
    # cotangents must carry the primal dtypes (fields may emit bf16)
    return (
        dt0.astype(t0.dtype), dt1.astype(t1.dtype), dsig.astype(sigmas.dtype)
    )


fused_render_weights.defvjp(_frw_fwd, _frw_bwd)
