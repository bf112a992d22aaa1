"""Fully-fused MLP Pallas kernel (forward + custom-VJP backward).

The TPU counterpart of tiny-cuda-nn's ``FullyFusedMLP``
(``perception/models/radiance_fields/ngp.py:123-169`` instantiates it for
the NGP base/heads): all hidden layers of a ReLU MLP execute in one kernel
with the weights resident in VMEM, so hidden activations never round-trip
through HBM. The backward pass recomputes the (cheap) forward per tile and
accumulates dW/db across the sequential Pallas grid — tile 0 zeroes the
accumulators, later tiles add into the same output block (the standard
Mosaic revisiting-output pattern).

Topology: [Din, H, ..., H, Dout] ReLU chains of ANY depth — the kernel
factories (``_make_*_kernel``) unroll the layer loop at trace time from
the weight count (r4; previously fixed at 3 hidden layers). bf16 matmuls
with f32 MXU accumulation; dW accumulators f32.

STATUS (r3): forward AND backward compile and run on the v5e. The r2
"infrastructure error" was mis-bisected: the remote compile helper's HTTP
500 masked the real Mosaic diagnostic, "Target does not support this
comparison" — the backward's ReLU masks compared bf16 values (``h > 0``),
which this Mosaic target cannot lower. Comparing the f32 pre-activations
instead (see ``_bwd_kernel``) fixes the compile. Enabled in the spectral
trunk via ``APNERF_FUSED_MLP=1`` (``models/spectral.py``); benchmarked in
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid tile; overridable for tile-size sweeps (bench ablations)
_TILE_N = int(os.environ.get("APNERF_FUSED_TILE", "1024"))


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


def _make_fwd_kernel(n_layers: int):
    """Forward kernel for an [Din, H, ..., H, Dout] ReLU MLP with
    ``n_layers`` weight matrices (n_layers-1 hidden + linear out)."""

    def kernel(x_ref, *refs):
        ws, y_ref = refs[:-1], refs[-1]
        bf = jnp.bfloat16
        h = x_ref[:].astype(bf)
        for i in range(n_layers - 1):
            h = jnp.maximum(
                _dot(h, ws[2 * i][:].astype(bf)) + ws[2 * i + 1][:], 0
            ).astype(bf)
        y_ref[:] = _dot(h, ws[-2][:].astype(bf)) + ws[-1][:]

    return kernel


def _make_enc_fwd_kernel(n_layers: int):
    # The spectral features concat(cos p, sin p) @ w0 are computed as
    # cos(p) @ w0[:M] + sin(p) @ w0[M:] — identical math, no in-kernel
    # concatenate (concat hung this target's Mosaic compile).
    def kernel(p_ref, *refs):
        ws, y_ref = refs[:-1], refs[-1]
        bf = jnp.bfloat16
        proj = p_ref[:]
        M = proj.shape[-1]
        c = jnp.cos(proj).astype(bf)
        s = jnp.sin(proj).astype(bf)
        w0b = ws[0][:].astype(bf)
        h = jnp.maximum(
            _dot(c, w0b[:M]) + _dot(s, w0b[M:]) + ws[1][:], 0
        ).astype(bf)
        for i in range(1, n_layers - 1):
            h = jnp.maximum(
                _dot(h, ws[2 * i][:].astype(bf)) + ws[2 * i + 1][:], 0
            ).astype(bf)
        y_ref[:] = _dot(h, ws[-2][:].astype(bf)) + ws[-1][:]

    return kernel


def _make_enc_bwd_kernel(n_layers: int):
    # same revisiting-accumulator + f32-preactivation-mask design as
    # _make_bwd_kernel, plus the spectral feature chain: recompute cos/sin
    # from the saved phase angles, run the trunk backward to g_enc, and
    # emit dproj = cos*g_sin - sin*g_cos without any HBM intermediate. The
    # concat-free split-w0 form of the forward means dw0's two halves and
    # g_cos/g_sin are separate dots too.
    L = n_layers

    def kernel(p_ref, *refs):
        ws = refs[: 2 * L]
        g_ref = refs[2 * L]
        dp_ref = refs[2 * L + 1]
        grads = refs[2 * L + 2:]
        bf = jnp.bfloat16
        first = pl.program_id(0) == 0
        proj = p_ref[:]  # [Nt, M] f32
        M = proj.shape[-1]
        c = jnp.cos(proj)
        s = jnp.sin(proj)
        cb = c.astype(bf)
        sb = s.astype(bf)
        w0b = ws[0][:].astype(bf)
        a = [_dot(cb, w0b[:M]) + _dot(sb, w0b[M:]) + ws[1][:]]
        h = [jnp.maximum(a[0], 0).astype(bf)]
        for i in range(1, L - 1):
            ai = _dot(h[-1], ws[2 * i][:].astype(bf)) + ws[2 * i + 1][:]
            a.append(ai)
            h.append(jnp.maximum(ai, 0).astype(bf))

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[...] = jnp.zeros_like(ref)

            ref[...] += val

        g = g_ref[:].astype(bf)
        acc(grads[2 * (L - 1)], _dot_tn(h[-1], g))
        acc(
            grads[2 * (L - 1) + 1],
            jnp.sum(g, axis=0, keepdims=True).astype(jnp.float32),
        )
        gh = (_dot_nt(g, ws[2 * (L - 1)][:].astype(bf)) * (a[L - 2] > 0)
              ).astype(bf)
        for i in range(L - 2, 0, -1):
            acc(grads[2 * i], _dot_tn(h[i - 1], gh))
            acc(
                grads[2 * i + 1],
                jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32),
            )
            gh = (_dot_nt(gh, ws[2 * i][:].astype(bf)) * (a[i - 1] > 0)
                  ).astype(bf)
        dw0_c = _dot_tn(cb, gh)  # [M, H]
        dw0_s = _dot_tn(sb, gh)
        dw0 = grads[0]

        @pl.when(first)
        def _():
            dw0[...] = jnp.zeros_like(dw0)

        dw0[:M] += dw0_c
        dw0[M:] += dw0_s
        acc(grads[1], jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32))
        g_cos = _dot_nt(gh, w0b[:M])  # [Nt, M] f32
        g_sin = _dot_nt(gh, w0b[M:])
        dp_ref[:] = (c * g_sin - s * g_cos).astype(dp_ref.dtype)

    return kernel


def _make_bwd_kernel(n_layers: int):
    # dW/db use REVISITING accumulators: every tile maps to the same output
    # block; tile 0 initializes, later tiles add in place. The gradients
    # never leave VMEM until the grid finishes — per-tile contribution
    # buffers (the r2 design) wrote [n_tiles, 256, 256] f32 to HBM and ate
    # the entire fusion win.
    #
    # ReLU masks compare the f32 PRE-activations, not the bf16 activations:
    # this Mosaic target rejects bf16 comparisons ("Target does not support
    # this comparison" — the true cause of the r2 backward-compile failure,
    # mis-bisected then as remote-compile infra).
    L = n_layers

    def kernel(x_ref, *refs):
        ws = refs[: 2 * L]
        g_ref = refs[2 * L]
        dx_ref = refs[2 * L + 1]
        grads = refs[2 * L + 2:]
        bf = jnp.bfloat16
        first = pl.program_id(0) == 0
        x = x_ref[:].astype(bf)
        # recompute forward, keeping activations + f32 pre-acts in VMEM
        a = [_dot(x, ws[0][:].astype(bf)) + ws[1][:]]
        h = [jnp.maximum(a[0], 0).astype(bf)]
        for i in range(1, L - 1):
            ai = _dot(h[-1], ws[2 * i][:].astype(bf)) + ws[2 * i + 1][:]
            a.append(ai)
            h.append(jnp.maximum(ai, 0).astype(bf))

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[...] = jnp.zeros_like(ref)

            ref[...] += val

        g = g_ref[:].astype(bf)  # [Nt, Dout]
        acc(grads[2 * (L - 1)], _dot_tn(h[-1], g))
        acc(
            grads[2 * (L - 1) + 1],
            jnp.sum(g, axis=0, keepdims=True).astype(jnp.float32),
        )
        gh = (_dot_nt(g, ws[2 * (L - 1)][:].astype(bf)) * (a[L - 2] > 0)
              ).astype(bf)
        for i in range(L - 2, 0, -1):
            acc(grads[2 * i], _dot_tn(h[i - 1], gh))
            acc(
                grads[2 * i + 1],
                jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32),
            )
            gh = (_dot_nt(gh, ws[2 * i][:].astype(bf)) * (a[i - 1] > 0)
                  ).astype(bf)
        acc(grads[0], _dot_tn(x, gh))
        acc(grads[1], jnp.sum(gh, axis=0, keepdims=True).astype(jnp.float32))
        dx_ref[:] = _dot_nt(gh, ws[0][:].astype(bf)).astype(dx_ref.dtype)

    return kernel


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
        _make_fwd_kernel(len(weights) // 2),
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
    # revisiting dW/db accumulators: one block, every tile maps to it
    acc_specs = tuple(
        pl.BlockSpec(s, functools.partial(lambda nd, i: (0,) * nd, len(s)),
                     memory_space=pltpu.VMEM)
        for s in w_shapes
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(len(weights) // 2),
        grid=(n_tiles,),
        in_specs=[xspec] + _w_specs(w_shapes) + [gspec],
        out_specs=(xspec,) + acc_specs,
        # dx in x's dtype (bf16 for the flagship) — no f32 copy in HBM
        out_shape=(jax.ShapeDtypeStruct((N, Din), x.dtype),) + out_shapes,
        interpret=_use_interpret(),
    )(x, *weights, g)
    return outs


def _norm_weights(params):
    """dict {w0,b0,..} → flat tuple with bias rows shaped [1, D]."""
    out = []
    for i in range(len(params) // 2):
        out.append(params[f"w{i}"])
        out.append(params[f"b{i}"].reshape(1, -1))
    return tuple(out)


def _call_enc_fwd(proj, weights):
    N, M = proj.shape
    Dout = weights[-2].shape[1]
    t = _tile(N)
    pspec = pl.BlockSpec((t, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((t, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_enc_fwd_kernel(len(weights) // 2),
        grid=(N // t,),
        in_specs=[pspec] + _w_specs([w.shape for w in weights]),
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((N, Dout), jnp.float32),
        interpret=_use_interpret(),
    )(proj, *weights)


def _call_enc_bwd(proj, weights, g):
    N, M = proj.shape
    Dout = weights[-2].shape[1]
    t = _tile(N)
    pspec = pl.BlockSpec((t, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((t, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_shapes = [w.shape for w in weights]
    acc_specs = tuple(
        pl.BlockSpec(s, functools.partial(lambda nd, i: (0,) * nd, len(s)),
                     memory_space=pltpu.VMEM)
        for s in w_shapes
    )
    outs = pl.pallas_call(
        _make_enc_bwd_kernel(len(weights) // 2),
        grid=(N // t,),
        in_specs=[pspec] + _w_specs(w_shapes) + [gspec],
        out_specs=(pspec,) + acc_specs,
        # dproj in bf16: halves the read of every downstream reduction
        # (dW_spectrum, dphase) — gradient values, bf16 is plenty
        out_shape=(jax.ShapeDtypeStruct((N, M), jnp.bfloat16),)
        + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes),
        interpret=_use_interpret(),
    )(proj, *weights, g)
    return outs


_TWO_PI = 6.283185307179586


def _proj_math(W_spec, phase, u):
    """f32 phase angles via one [N,3]x[3,M] matmul (XLA lays this out
    well; the tiny K=3 dot does NOT belong in the kernel)."""
    return (
        jnp.dot(
            u.astype(jnp.bfloat16), W_spec.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * _TWO_PI
        + phase
    )


@jax.custom_vjp
def fused_spectral_field(
    W_spec: jnp.ndarray,  # [3, M] learnable spectrum
    phase: jnp.ndarray,  # [M]
    params: dict,  # n-layer MLP dict (init_mlp format), w0: [2M, H]
    u: jnp.ndarray,  # [N, 3] unit-cube coords
) -> jnp.ndarray:
    """The whole spectral field in one kernel: y = MLP(cos/sin(2π·u·W+φ))
    — the tcnn ``NetworkWithInputEncoding`` counterpart
    (``/root/reference/perception/models/radiance_fields/ngp.py:123-141``
    instantiates exactly this fusion for the hash encoding): spectral
    features and trunk activations never touch HBM. The backward emits
    dproj in bf16 INSIDE the VJP so the spectrum/phase reductions read
    half the bytes, then reduces to dW_spec/dphase/du with XLA dots.
    """
    return _call_enc_fwd(_proj_math(W_spec, phase, u), _norm_weights(params))


def _fsf_fwd(W_spec, phase, params, u):
    return fused_spectral_field(W_spec, phase, params, u), (
        W_spec, phase, params, u,
    )


def _fsf_bwd(res, g):
    W_spec, phase, params, u = res
    proj = _proj_math(W_spec, phase, u)  # CSEs with the forward's — fine
    outs = _call_enc_bwd(proj, _norm_weights(params), g.astype(jnp.float32))
    dproj = outs[0]  # bf16 [N, M]
    grads = {}
    for i in range(len(params) // 2):
        grads[f"w{i}"] = outs[1 + 2 * i].astype(params[f"w{i}"].dtype)
        grads[f"b{i}"] = outs[2 + 2 * i].reshape(-1).astype(
            params[f"b{i}"].dtype
        )
    dW = (
        jax.lax.dot_general(
            u.astype(jnp.bfloat16), dproj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * _TWO_PI
    ).astype(W_spec.dtype)
    dphase = jnp.sum(
        dproj, axis=tuple(range(dproj.ndim - 1)), dtype=jnp.float32
    ).astype(phase.dtype)
    du = (
        jax.lax.dot_general(
            dproj, W_spec.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * _TWO_PI
    ).astype(u.dtype)
    return dW, dphase, grads, du


fused_spectral_field.defvjp(_fsf_fwd, _fsf_bwd)


@jax.custom_vjp
def fused_mlp_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = MLP(x) for the fixed [Din, H, H, H, Dout] ReLU topology.

    ``params`` is the plain dict pytree ``models/nn.init_mlp`` produces
    (4 layers). Forward output f32 (like ``apply_mlp``'s final layer);
    hidden compute bf16 with f32 MXU accumulation. ``x`` may be bf16 (the
    flagship's spectral features) — it enters the kernel unconverted, so
    no [N, Din] f32 copy materializes in HBM.
    """
    return _call_fwd(x, _norm_weights(params))


def _fma_fwd(params, x):
    return fused_mlp_apply(params, x), (params, x)


def _fma_bwd(res, g):
    params, x = res
    outs = _call_bwd(x, _norm_weights(params), g.astype(jnp.float32))
    dx = outs[0].astype(x.dtype)
    grads = {}
    for i in range(len(params) // 2):
        w = params[f"w{i}"]
        b = params[f"b{i}"]
        grads[f"w{i}"] = outs[1 + 2 * i].astype(w.dtype)
        grads[f"b{i}"] = outs[2 + 2 * i].reshape(-1).astype(b.dtype)
    return grads, dx


fused_mlp_apply.defvjp(_fma_fwd, _fma_bwd)
