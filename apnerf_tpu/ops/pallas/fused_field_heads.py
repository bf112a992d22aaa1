"""Whole-field Pallas kernel: spectral encode + trunk + density/rgb/sem heads.

One kernel evaluates the ENTIRE flagship field per sample — the TPU
counterpart of tiny-cuda-nn evaluating ``NetworkWithInputEncoding`` plus
both head MLPs back-to-back on resident registers
(``/root/reference/perception/models/radiance_fields/ngp.py:123-169``
builds exactly this stack: hash encode → base MLP → rgb head (SH dirs ++
geo feature) → semantic head). The r4 production trace
(scripts/profile_trace.py) showed ~3.5 ms/step of pure XLA glue BETWEEN
the fused field kernel and the heads: [N, 16]-f32 field output padded to
128 lanes (268 MB/step), [N, 29] semantic-logit relayouts, [N, 64] head
activations round-tripping HBM. Fusing the heads in deletes all of it.

Layout: everything runs TRANSPOSED — operands/outputs are [channels, N]
with the big axis in lanes, so the packed output

    y = [ rgb (3 rows, sigmoid applied)
          sigma (1 row, trunc_exp(x-1) * in-aabb selector applied)
          semantic logits (num_classes rows) ]          # [4+C, N] f32

costs 4+C padded-to-8 sublanes instead of 128 padded lanes (a 6x cut in
the field-output HBM footprint), and every downstream channel extract is
a contiguous row slice. The renderer consumes y directly
(``render/prop_renderer.py`` packed path) and accumulates all channels
with one einsum.

Orientation mechanics: a row-form layer y = xW + b becomes
yT = Wt xT + b[:, None]; with native [in, out] weights that is
``_dot_tn(w, h)`` (contract dim 0 of both — no transposes materialize,
in-kernel transposes trip this target's Mosaic compile). Only the trunk's
final weight travels pre-transposed ([1+G, H]) so the backward's
raw/geo-split accumulator stores slice SUBLANES, never lanes.

Backward: the standard revisiting-accumulator design of
``fused_mlp._make_enc_bwd_kernel`` extended through both heads — the
incoming cotangent is the packed [4+C, t] block; sigmoid/trunc_exp
derivatives are recomputed in-kernel; head geo-feature cotangents merge
into the trunk backward; dW_spec/dphase/all-MLP grads accumulate in VMEM
across the sequential grid; duT streams per tile. ReLU masks compare f32
pre-activations (bf16 compares don't lower on this Mosaic target).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _TWO_PI, _dot, _dot_nt, _dot_tn, _tile, _use_interpret

# Split each grid tile into this many independent column chains — the
# chains share no data, so Mosaic's scheduler can overlap one chain's
# VPU work (cos/sin, converts, masks) with another's MXU dots instead of
# serializing a single dependency chain. Sweepable for bench ablations.
# v5e sweep (bench.py, 2026-08-17): 1 -> 1.715x, 2 -> 1.833x,
# 4 -> 1.848x, 8 -> 1.845x; default 4.
_SPLITS_ENV = int(os.environ.get("APNERF_FUSED_SPLITS", "4"))


def _n_splits(tile: int) -> int:
    n = _SPLITS_ENV
    while tile % (n * 128) and n > 1:  # keep whole-lane-register columns
        n //= 2
    return max(n, 1)


def _sum_lanes(x):
    """Row-wise sum over the lane (N) axis → [D, 1] f32."""
    return jnp.sum(x, axis=1, keepdims=True).astype(jnp.float32)


def _make_field_fwd_kernel(n_trunk: int, n_splits: int = 1):
    LT = n_trunk  # trunk weight-matrix count (last one arrives transposed)

    def kernel(ut_ref, sht_ref, wspec_ref, phase_ref, *refs):
        tw = refs[: 2 * LT]
        rw = refs[2 * LT : 2 * LT + 6]
        sw = refs[2 * LT + 6 : 2 * LT + 12]
        y_ref = refs[-1]
        bf = jnp.bfloat16
        t = ut_ref.shape[1]
        tc = t // n_splits
        # STAGE-INTERLEAVED over independent column chains: every stage
        # is a comprehension over chains, so in program order chain k+1's
        # MXU dot sits adjacent to chain k's VPU tail (bias+relu+convert)
        # and the scheduler can overlap them — a full-chain-at-a-time
        # layout puts ~60 instructions between independent ops.
        Z = range(n_splits)
        cols = [slice(k * tc, (k + 1) * tc) for k in Z]
        ut = [ut_ref[:, col] for col in cols]  # [3, tc] f32 each
        utb = [u.astype(bf) for u in ut]
        wsb = wspec_ref[:].astype(bf)
        proj = [
            _dot_tn(wsb, ub) * _TWO_PI + phase_ref[:] for ub in utb
        ]  # [M, tc] f32
        M = proj[0].shape[0]
        c = [jnp.cos(p).astype(bf) for p in proj]
        s = [jnp.sin(p).astype(bf) for p in proj]
        w0b = tw[0][:].astype(bf)  # [2M, H]
        h = [
            jnp.maximum(
                _dot_tn(w0b[:M], c[k]) + _dot_tn(w0b[M:], s[k]) + tw[1][:],
                0,
            ).astype(bf)
            for k in Z
        ]
        for i in range(1, LT - 1):
            wib = tw[2 * i][:].astype(bf)
            h = [
                jnp.maximum(_dot_tn(wib, hk) + tw[2 * i + 1][:], 0).astype(
                    bf
                )
                for hk in h
            ]
        # final trunk layer: weight pre-transposed [1+G, H]
        wLb = tw[2 * (LT - 1)][:].astype(bf)
        out = [_dot(wLb, hk) + tw[2 * LT - 1][:] for hk in h]
        raw = [o[0:1] for o in out]  # [1, tc] f32
        geo = [o[1:].astype(bf) for o in out]  # [G, tc]
        sel = [
            (
                (u[0:1] > 0.0) & (u[0:1] < 1.0)
                & (u[1:2] > 0.0) & (u[1:2] < 1.0)
                & (u[2:3] > 0.0) & (u[2:3] < 1.0)
            ).astype(jnp.float32)
            for u in ut
        ]
        sigma = [jnp.exp(raw[k] - 1.0) * sel[k] for k in Z]
        # rgb head: concat(SH, geo) @ r0 == r0[:16]T sh + r0[16:]T geo
        shb = [sht_ref[:, col].astype(bf) for col in cols]  # [16, tc]
        r0b = rw[0][:].astype(bf)  # [16+G, 64]
        h1 = [
            jnp.maximum(
                _dot_tn(r0b[:16], shb[k])
                + _dot_tn(r0b[16:], geo[k])
                + rw[1][:],
                0,
            ).astype(bf)
            for k in Z
        ]
        r2b = rw[2][:].astype(bf)
        h2 = [
            jnp.maximum(_dot_tn(r2b, hk) + rw[3][:], 0).astype(bf)
            for hk in h1
        ]
        r4b = rw[4][:].astype(bf)
        rgb = [
            1.0 / (1.0 + jnp.exp(-(_dot_tn(r4b, hk) + rw[5][:])))
            for hk in h2
        ]
        # semantic head
        s0b = sw[0][:].astype(bf)
        m1 = [
            jnp.maximum(_dot_tn(s0b, g) + sw[1][:], 0).astype(bf)
            for g in geo
        ]
        s2b = sw[2][:].astype(bf)
        m2 = [
            jnp.maximum(_dot_tn(s2b, mk_) + sw[3][:], 0).astype(bf)
            for mk_ in m1
        ]
        s4b = sw[4][:].astype(bf)
        sem = [_dot_tn(s4b, mk_) + sw[5][:] for mk_ in m2]  # [Csem, tc]
        for k in Z:
            y_ref[0:3, cols[k]] = rgb[k]
            y_ref[3:4, cols[k]] = sigma[k]
            y_ref[4:, cols[k]] = sem[k]

    return kernel


def _make_field_bwd_kernel(n_trunk: int, n_splits: int = 1):
    LT = n_trunk

    def kernel(ut_ref, sht_ref, wspec_ref, phase_ref, *refs):
        tw = refs[: 2 * LT]
        rw = refs[2 * LT : 2 * LT + 6]
        sw = refs[2 * LT + 6 : 2 * LT + 12]
        g_ref = refs[2 * LT + 12]
        dut_ref = refs[2 * LT + 13]
        dwspec_ref = refs[2 * LT + 14]
        dphase_ref = refs[2 * LT + 15]
        dtw = refs[2 * LT + 16 : 4 * LT + 16]
        drw = refs[4 * LT + 16 : 4 * LT + 22]
        dsw = refs[4 * LT + 22 : 4 * LT + 28]
        bf = jnp.bfloat16
        first = pl.program_id(0) == 0

        # Recompute + backward, STAGE-INTERLEAVED over independent column
        # chains (see the fwd kernel comment — adjacent independent ops
        # let the scheduler overlap one chain's VPU tail with another's
        # MXU dot). Per-chain grad contributions are summed pairwise as
        # they are produced (cheap small-matrix adds) into the flat list
        # ``v`` consumed by the accumulate tail below.
        #
        # ReLU masks are rounded to bf16 0/1 right after the f32 compare
        # (bf16 compares don't lower on this Mosaic target) and the f32
        # pre-acts die immediately — that plus keeping only the bf16
        # cos/sin halves the per-tile VMEM vs a keep-f32-preacts layout.
        t = ut_ref.shape[1]
        tc = t // n_splits  # factory arg pre-clamped by _n_splits
        Z = range(n_splits)
        csum = lambda vals: sum(vals[1:], vals[0])
        mkf = lambda pre: (pre > 0).astype(bf)  # ReLU mask, bf16 0/1
        cols = [slice(k * tc, (k + 1) * tc) for k in Z]
        ut = [ut_ref[:, col] for col in cols]
        utb = [u.astype(bf) for u in ut]
        wsb = wspec_ref[:].astype(bf)  # [3, M]
        proj = [_dot_tn(wsb, ub) * _TWO_PI + phase_ref[:] for ub in utb]
        M = proj[0].shape[0]
        cb = [jnp.cos(p).astype(bf) for p in proj]
        sb = [jnp.sin(p).astype(bf) for p in proj]
        w0b = tw[0][:].astype(bf)
        a0 = [
            _dot_tn(w0b[:M], cb[k]) + _dot_tn(w0b[M:], sb[k]) + tw[1][:]
            for k in Z
        ]
        mask = [[mkf(a)] for a in a0]  # mask[k][layer]
        h = [[jnp.maximum(a, 0).astype(bf)] for a in a0]  # h[k][layer]
        for i in range(1, LT - 1):
            wib = tw[2 * i][:].astype(bf)
            ai = [_dot_tn(wib, h[k][-1]) + tw[2 * i + 1][:] for k in Z]
            for k in Z:
                mask[k].append(mkf(ai[k]))
                h[k].append(jnp.maximum(ai[k], 0).astype(bf))
        wLb = tw[2 * (LT - 1)][:].astype(bf)  # [1+G, H] transposed
        out = [_dot(wLb, h[k][-1]) + tw[2 * LT - 1][:] for k in Z]
        raw = [o[0:1] for o in out]
        geo = [o[1:].astype(bf) for o in out]
        sel = [
            (
                (u[0:1] > 0.0) & (u[0:1] < 1.0)
                & (u[1:2] > 0.0) & (u[1:2] < 1.0)
                & (u[2:3] > 0.0) & (u[2:3] < 1.0)
            ).astype(jnp.float32)
            for u in ut
        ]
        shb = [sht_ref[:, col].astype(bf) for col in cols]
        r0b = rw[0][:].astype(bf)
        a1 = [
            _dot_tn(r0b[:16], shb[k]) + _dot_tn(r0b[16:], geo[k]) + rw[1][:]
            for k in Z
        ]
        mk1 = [mkf(a) for a in a1]
        h1 = [jnp.maximum(a, 0).astype(bf) for a in a1]
        r2b = rw[2][:].astype(bf)
        a2 = [_dot_tn(r2b, hk) + rw[3][:] for hk in h1]
        mk2 = [mkf(a) for a in a2]
        h2 = [jnp.maximum(a, 0).astype(bf) for a in a2]
        r4b = rw[4][:].astype(bf)
        rgb = [
            1.0 / (1.0 + jnp.exp(-(_dot_tn(r4b, hk) + rw[5][:])))
            for hk in h2
        ]
        s0b = sw[0][:].astype(bf)
        am1 = [_dot_tn(s0b, g_) + sw[1][:] for g_ in geo]
        mkm1 = [mkf(a) for a in am1]
        m1 = [jnp.maximum(a, 0).astype(bf) for a in am1]
        s2b = sw[2][:].astype(bf)
        am2 = [_dot_tn(s2b, mm) + sw[3][:] for mm in m1]
        mkm2 = [mkf(a) for a in am2]
        m2 = [jnp.maximum(a, 0).astype(bf) for a in am2]

        # ---- backward
        g = [g_ref[:, col] for col in cols]  # [4+Csem, tc] f32
        g_sem = [gk[4:] for gk in g]
        gsem_b = [gs.astype(bf) for gs in g_sem]
        s4b = sw[4][:].astype(bf)
        gm2 = [(_dot(s4b, gsem_b[k]) * mkm2[k]).astype(bf) for k in Z]
        gm1 = [(_dot(s2b, gm2[k]) * mkm1[k]).astype(bf) for k in Z]
        g_geo_sem = [_dot(s0b, gm) for gm in gm1]  # [G, tc] f32

        grgb_pre = [g[k][0:3] * rgb[k] * (1.0 - rgb[k]) for k in Z]
        gp_b = [gp.astype(bf) for gp in grgb_pre]
        gh2 = [(_dot(r4b, gp_b[k]) * mk2[k]).astype(bf) for k in Z]
        gh1 = [(_dot(r2b, gh2[k]) * mk1[k]).astype(bf) for k in Z]
        g_geo_rgb = [_dot(r0b[16:], gh) for gh in gh1]  # [G, tc] f32

        graw = [
            g[k][3:4] * jnp.exp(jnp.minimum(raw[k] - 1.0, 15.0)) * sel[k]
            for k in Z
        ]
        g_geo = [g_geo_sem[k] + g_geo_rgb[k] for k in Z]
        graw_b = [gr.astype(bf) for gr in graw]
        ggeo_b = [gg.astype(bf) for gg in g_geo]
        gh = [
            (
                (_dot_tn(wLb[0:1], graw_b[k]) + _dot_tn(wLb[1:], ggeo_b[k]))
                * mask[k][LT - 2]
            ).astype(bf)
            for k in Z
        ]
        mid = []  # (dwi, dbi) for layers LT-2 .. 1, summed across chains
        for i in range(LT - 2, 0, -1):
            mid.append(csum([_dot_nt(h[k][i - 1], gh[k]) for k in Z]))
            mid.append(csum([_sum_lanes(gh[k]) for k in Z]))
            wib = tw[2 * i][:].astype(bf)
            gh = [(_dot(wib, gh[k]) * mask[k][i - 1]).astype(bf) for k in Z]
        g_cos = [_dot(w0b[:M], ghk) for ghk in gh]  # [M, tc] f32
        g_sin = [_dot(w0b[M:], ghk) for ghk in gh]
        # dproj from the bf16 cos/sin pair (f32 via promotion) — same
        # rounding class as the XLA oracle, which casts dproj to bf16
        # before every consumer (_enc_bwd)
        dproj = [cb[k] * g_sin[k] - sb[k] * g_cos[k] for k in Z]
        dpb = [dp.astype(bf) for dp in dproj]
        for k in Z:
            dut_ref[:, cols[k]] = (_dot(wsb, dpb[k]) * _TWO_PI).astype(
                dut_ref.dtype
            )
        v = [
            csum([_dot_nt(utb[k], dpb[k]) for k in Z]) * _TWO_PI,  # dwspec
            csum([_sum_lanes(dproj[k]) for k in Z]),  # dphase
            csum([_dot_nt(cb[k], gh[k]) for k in Z]),  # dw0[:M]
            csum([_dot_nt(sb[k], gh[k]) for k in Z]),  # dw0[M:]
            csum([_sum_lanes(gh[k]) for k in Z]),  # db0
            *mid,  # middle trunk layers
            csum([_dot_nt(graw_b[k], h[k][-1]) for k in Z]),  # dwL[0:1]
            csum([_dot_nt(ggeo_b[k], h[k][-1]) for k in Z]),  # dwL[1:]
            csum([_sum_lanes(graw[k]) for k in Z]),  # dbL[0:1]
            csum([_sum_lanes(g_geo[k]) for k in Z]),  # dbL[1:]
            csum([_dot_nt(shb[k], gh1[k]) for k in Z]),  # dr0[:16]
            csum([_dot_nt(geo[k], gh1[k]) for k in Z]),  # dr0[16:]
            csum([_sum_lanes(gh1[k]) for k in Z]),  # drw1
            csum([_dot_nt(h1[k], gh2[k]) for k in Z]),  # drw2
            csum([_sum_lanes(gh2[k]) for k in Z]),  # drw3
            csum([_dot_nt(h2[k], gp_b[k]) for k in Z]),  # drw4
            csum([_sum_lanes(grgb_pre[k]) for k in Z]),  # drw5
            csum([_dot_nt(geo[k], gm1[k]) for k in Z]),  # dsw0
            csum([_sum_lanes(gm1[k]) for k in Z]),  # dsw1
            csum([_dot_nt(m1[k], gm2[k]) for k in Z]),  # dsw2
            csum([_sum_lanes(gm2[k]) for k in Z]),  # dsw3
            csum([_dot_nt(m2[k], gsem_b[k]) for k in Z]),  # dsw4
            csum([_sum_lanes(g_sem[k]) for k in Z]),  # dsw5
        ]

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[...] = jnp.zeros_like(ref)

            ref[...] += val

        def acc_split(ref, row_splits, vals):
            @pl.when(first)
            def _():
                ref[...] = jnp.zeros_like(ref)

            for rows, val in zip(row_splits, vals):
                ref[rows] += val

        M = wspec_ref.shape[1]
        acc(dwspec_ref, v[0])
        acc(dphase_ref, v[1])
        acc_split(dtw[0], (slice(0, M), slice(M, None)), (v[2], v[3]))
        acc(dtw[1], v[4])
        p = 5
        for i in range(LT - 2, 0, -1):
            acc(dtw[2 * i], v[p])
            acc(dtw[2 * i + 1], v[p + 1])
            p += 2
        acc_split(
            dtw[2 * (LT - 1)], (slice(0, 1), slice(1, None)), (v[p], v[p + 1])
        )
        acc_split(
            dtw[2 * LT - 1], (slice(0, 1), slice(1, None)), (v[p + 2], v[p + 3])
        )
        acc_split(
            drw[0], (slice(0, 16), slice(16, None)), (v[p + 4], v[p + 5])
        )
        acc(drw[1], v[p + 6])
        acc(drw[2], v[p + 7])
        acc(drw[3], v[p + 8])
        acc(drw[4], v[p + 9])
        acc(drw[5], v[p + 10])
        for j in range(6):
            acc(dsw[j], v[p + 11 + j])

    return kernel


def _whole(shapes):
    return [
        pl.BlockSpec(
            s,
            functools.partial(lambda nd, i: (0,) * nd, len(s)),
            memory_space=pltpu.VMEM,
        )
        for s in shapes
    ]


def _trunk_weights_t(params: dict):
    """mlp dict → flat tuple in kernel orientation: native [in, out]
    weights and [D, 1] bias columns, LAST weight transposed [Dout, H]."""
    L = len(params) // 2
    out = []
    for i in range(L):
        w = params[f"w{i}"]
        out.append(w.T if i == L - 1 else w)
        out.append(params[f"b{i}"].reshape(-1, 1))
    return tuple(out)


def _head_weights_t(params: dict):
    """Head mlp dict → native weights + [D, 1] bias columns (no transpose:
    head outputs are never split in the backward)."""
    out = []
    for i in range(len(params) // 2):
        out.append(params[f"w{i}"])
        out.append(params[f"b{i}"].reshape(-1, 1))
    return tuple(out)


def _call_field_fwd(ut, sht, wspec, phase2d, tws, rws, sws):
    N = ut.shape[1]
    c_out = 4 + sws[-2].shape[1]
    t = _tile(N)
    nspec = lambda d: pl.BlockSpec(
        (d, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    ws = list(tws) + list(rws) + list(sws)
    return pl.pallas_call(
        _make_field_fwd_kernel(len(tws) // 2, _n_splits(t)),
        grid=(N // t,),
        in_specs=[nspec(3), nspec(16)]
        + _whole([wspec.shape, phase2d.shape])
        + _whole([w.shape for w in ws]),
        out_specs=nspec(c_out),
        out_shape=jax.ShapeDtypeStruct((c_out, N), jnp.float32),
        interpret=_use_interpret(),
    )(ut, sht, wspec, phase2d, *ws)


def _call_field_bwd(ut, sht, wspec, phase2d, tws, rws, sws, g):
    N = ut.shape[1]
    M = wspec.shape[1]
    c_out = g.shape[0]
    t = _tile(N)
    nspec = lambda d: pl.BlockSpec(
        (d, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    ws = list(tws) + list(rws) + list(sws)
    acc_shapes = [(3, M), (M, 1)] + [w.shape for w in ws]
    outs = pl.pallas_call(
        _make_field_bwd_kernel(len(tws) // 2, _n_splits(t)),
        grid=(N // t,),
        in_specs=[nspec(3), nspec(16)]
        + _whole([wspec.shape, phase2d.shape])
        + _whole([w.shape for w in ws])
        + [nspec(c_out)],
        out_specs=(nspec(3),) + tuple(_whole(acc_shapes)),
        out_shape=(jax.ShapeDtypeStruct((3, N), ut.dtype),)
        + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in acc_shapes),
        interpret=_use_interpret(),
    )(ut, sht, wspec, phase2d, *ws, g)
    return outs


def _mlp_grads_from_flat(params: dict, flat, transposed_last: bool):
    """Flat kernel accumulator outputs → mlp grad dict (undo the [D, 1]
    bias columns and the final-weight transpose)."""
    L = len(params) // 2
    grads = {}
    for i in range(L):
        w = flat[2 * i]
        if transposed_last and i == L - 1:
            w = w.T
        grads[f"w{i}"] = w.astype(params[f"w{i}"].dtype)
        grads[f"b{i}"] = (
            flat[2 * i + 1].reshape(-1).astype(params[f"b{i}"].dtype)
        )
    return grads


@jax.custom_vjp
def fused_field_heads(
    W_spec: jnp.ndarray,  # [3, M] learnable spectrum
    phase: jnp.ndarray,  # [M]
    base: dict,  # trunk mlp dict, w0: [2M, H], out 1+G
    head: dict,  # rgb head mlp dict, w0: [16+G, 64], out 3
    sem: dict,  # semantic head mlp dict, w0: [G, 64], out Csem
    ut: jnp.ndarray,  # [3, N] unit-cube coords, transposed
    sht: jnp.ndarray,  # [16, N] SH-deg4 dir features, transposed
) -> jnp.ndarray:
    """→ packed [4+Csem, N] f32: rgb (sigmoid), sigma (trunc_exp(x-1) *
    in-aabb selector), semantic logits. See module docstring."""
    return _call_field_fwd(
        ut,
        sht,
        W_spec,
        phase.reshape(-1, 1),
        _trunk_weights_t(base),
        _head_weights_t(head),
        _head_weights_t(sem),
    )


def _ffh_fwd(W_spec, phase, base, head, sem, ut, sht):
    return fused_field_heads(W_spec, phase, base, head, sem, ut, sht), (
        W_spec, phase, base, head, sem, ut, sht,
    )


def _ffh_bwd(res, g):
    W_spec, phase, base, head, sem, ut, sht = res
    tws = _trunk_weights_t(base)
    outs = _call_field_bwd(
        ut, sht, W_spec, phase.reshape(-1, 1),
        tws, _head_weights_t(head), _head_weights_t(sem),
        g.astype(jnp.float32),
    )
    dut = outs[0].astype(ut.dtype)
    dW = outs[1].astype(W_spec.dtype)
    dphase = outs[2].reshape(-1).astype(phase.dtype)
    nt = len(tws)
    dbase = _mlp_grads_from_flat(base, outs[3 : 3 + nt], True)
    dhead = _mlp_grads_from_flat(head, outs[3 + nt : 9 + nt], False)
    dsem = _mlp_grads_from_flat(sem, outs[9 + nt : 15 + nt], False)
    # SH features are a fixed function of ray directions (no parameters
    # upstream need this); zeros here are DCE'd by XLA when unused.
    dsht = jnp.zeros_like(sht)
    return dW, dphase, dbase, dhead, dsem, dut, dsht


fused_field_heads.defvjp(_ffh_fwd, _ffh_bwd)
