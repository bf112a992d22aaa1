"""Fully-fused MLP Pallas kernel (forward + custom-VJP backward).

The TPU counterpart of tiny-cuda-nn's ``FullyFusedMLP``
(``perception/models/radiance_fields/ngp.py:123-169`` instantiates it for
the NGP base/heads): all hidden layers of a ReLU MLP execute in one kernel
with the weights resident in VMEM, so hidden activations never round-trip
through HBM. The backward pass recomputes the (cheap) forward per tile and
accumulates dW/db across the sequential Pallas grid — tile 0 zeroes the
accumulators, later tiles add into the same output block (the standard
Mosaic revisiting-output pattern).

Fixed topology: 3 hidden layers of width H and a linear output layer,
matching the flagship trunk ``[Din, H, H, H, Dout]``. bf16 matmuls with
f32 MXU accumulation; dW accumulators f32.

STATUS on this environment: the forward kernel compiles and runs on the
v5e; the backward kernel is rejected by the remote Mosaic compile helper
with an infrastructure error (``TPU_WORKER_HOSTNAMES`` unset in the
compile subprocess) for any kernel containing the full dot→mask→dot
backward chain — bisected down from the full kernel; individual dots,
19-operand kernels, and 2-dot kernels all compile (see /tmp bisect logs
referenced in docs/PERFORMANCE.md). The kernel is therefore validated
against the ``apply_mlp`` oracle in interpreter mode and not wired into
the default train path; on a standard TPU runtime it is expected to
compile as-is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 1024


def _dot(a, b):
    # Mosaic requires 32-bit matmul accumulators; inputs stay bf16
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """aᵀ @ b without materializing the transpose (contract dim 0 of
    both) — in-kernel transposes trip the remote Mosaic compiler here."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """a @ bᵀ (contract dim 1 of both)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(x_ref, w0, b0, w1, b1, w2, b2, w3, b3, y_ref):
    bf = jnp.bfloat16
    x = x_ref[:].astype(bf)
    h = jnp.maximum(_dot(x, w0[:].astype(bf)) + b0[:], 0).astype(bf)
    h = jnp.maximum(_dot(h, w1[:].astype(bf)) + b1[:], 0).astype(bf)
    h = jnp.maximum(_dot(h, w2[:].astype(bf)) + b2[:], 0).astype(bf)
    y_ref[:] = _dot(h, w3[:].astype(bf)) + b3[:]


def _bwd_kernel(
    x_ref, w0, b0, w1, b1, w2, b2, w3, b3, g_ref,
    dx_ref, dw0, db0, dw1, db1, dw2, db2, dw3, db3,
):
    # Per-tile dW/db contributions land in grid-indexed output blocks and
    # are reduced outside the kernel: the revisiting-accumulator pattern
    # trips this environment's remote Mosaic compiler.
    bf = jnp.bfloat16
    x = x_ref[:].astype(bf)
    # recompute forward, keeping activations in VMEM
    h0 = jnp.maximum(_dot(x, w0[:].astype(bf)) + b0[:], 0).astype(bf)
    h1 = jnp.maximum(_dot(h0, w1[:].astype(bf)) + b1[:], 0).astype(bf)
    h2 = jnp.maximum(_dot(h1, w2[:].astype(bf)) + b2[:], 0).astype(bf)

    g = g_ref[:].astype(bf)  # [Nt, Dout]
    dw3[0] = _dot_tn(h2, g)
    db3[0] = jnp.sum(g, axis=0, keepdims=True).astype(jnp.float32)
    gh = (_dot_nt(g, w3[:].astype(bf)) * (h2 > 0)).astype(bf)
    dw2[0] = _dot_tn(h1, gh)
    db2[0] = jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32)
    gh = (_dot_nt(gh, w2[:].astype(bf)) * (h1 > 0)).astype(bf)
    dw1[0] = _dot_tn(h0, gh)
    db1[0] = jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32)
    gh = (_dot_nt(gh, w1[:].astype(bf)) * (h0 > 0)).astype(bf)
    dw0[0] = _dot_tn(x, gh)
    db0[0] = jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32)
    dx_ref[:] = _dot_nt(gh, w0[:].astype(bf))


def _tile(N):
    t = min(_TILE_N, N)
    while N % t:
        t //= 2
    return max(t, 1)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _w_specs(shapes):
    """Whole-array VMEM blocks for the weight operands (same every tile)."""
    return [
        pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _call_fwd(x, weights):
    N, Din = x.shape
    Dout = weights[-2].shape[1]
    t = _tile(N)
    xspec = pl.BlockSpec((t, Din), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((t, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(N // t,),
        in_specs=[xspec] + _w_specs([w.shape for w in weights]),
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((N, Dout), jnp.float32),
        interpret=_use_interpret(),
    )(x, *weights)


def _call_bwd(x, weights, g):
    N, Din = x.shape
    Dout = weights[-2].shape[1]
    t = _tile(N)
    xspec = pl.BlockSpec((t, Din), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((t, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_shapes = [w.shape for w in weights]
    n_tiles = N // t
    # per-tile dW/db contribution blocks, reduced by the caller
    acc_specs = tuple(
        pl.BlockSpec(
            (1,) + s, functools.partial(lambda s_, i: (i,) + (0,) * len(s_), s),
            memory_space=pltpu.VMEM,
        )
        for s in w_shapes
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_tiles,) + s, jnp.float32) for s in w_shapes
    )
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles,),
        in_specs=[xspec] + _w_specs(w_shapes) + [gspec],
        out_specs=(xspec,) + acc_specs,
        out_shape=(jax.ShapeDtypeStruct((N, Din), jnp.float32),) + out_shapes,
        interpret=_use_interpret(),
    )(x, *weights, g)
    return (outs[0],) + tuple(o.sum(axis=0) for o in outs[1:])


def _norm_weights(params):
    """dict {w0,b0,..,w3,b3} → flat tuple with bias rows shaped [1, D]."""
    out = []
    for i in range(4):
        out.append(params[f"w{i}"])
        out.append(params[f"b{i}"].reshape(1, -1))
    return tuple(out)


@jax.custom_vjp
def fused_mlp_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = MLP(x) for the fixed [Din, H, H, H, Dout] ReLU topology.

    ``params`` is the plain dict pytree ``models/nn.init_mlp`` produces
    (4 layers). Forward output f32 (like ``apply_mlp``'s final layer);
    hidden compute bf16 with f32 MXU accumulation.
    """
    return _call_fwd(x.astype(jnp.float32), _norm_weights(params))


def _fma_fwd(params, x):
    return fused_mlp_apply(params, x), (params, x)


def _fma_bwd(res, g):
    params, x = res
    outs = _call_bwd(
        x.astype(jnp.float32), _norm_weights(params), g.astype(jnp.float32)
    )
    dx = outs[0].astype(x.dtype)
    grads = {}
    for i in range(4):
        w = params[f"w{i}"]
        b = params[f"b{i}"]
        grads[f"w{i}"] = outs[1 + 2 * i].astype(w.dtype)
        grads[f"b{i}"] = outs[2 + 2 * i].reshape(-1).astype(b.dtype)
    return grads, dx


fused_mlp_apply.defvjp(_fma_fwd, _fma_bwd)
