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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _TWO_PI, _dot, _dot_nt, _dot_tn, _tile, _use_interpret


def _sum_lanes(x):
    """Row-wise sum over the lane (N) axis → [D, 1] f32."""
    return jnp.sum(x, axis=1, keepdims=True).astype(jnp.float32)


def _make_field_fwd_kernel(n_trunk: int):
    LT = n_trunk  # trunk weight-matrix count (last one arrives transposed)

    def kernel(ut_ref, sht_ref, wspec_ref, phase_ref, *refs):
        tw = refs[: 2 * LT]
        rw = refs[2 * LT : 2 * LT + 6]
        sw = refs[2 * LT + 6 : 2 * LT + 12]
        y_ref = refs[-1]
        bf = jnp.bfloat16
        ut = ut_ref[:]  # [3, t] f32
        utb = ut.astype(bf)
        proj = (
            _dot_tn(wspec_ref[:].astype(bf), utb) * _TWO_PI + phase_ref[:]
        )  # [M, t] f32
        M = proj.shape[0]
        c = jnp.cos(proj).astype(bf)
        s = jnp.sin(proj).astype(bf)
        w0b = tw[0][:].astype(bf)  # [2M, H]
        h = jnp.maximum(
            _dot_tn(w0b[:M], c) + _dot_tn(w0b[M:], s) + tw[1][:], 0
        ).astype(bf)
        for i in range(1, LT - 1):
            h = jnp.maximum(
                _dot_tn(tw[2 * i][:].astype(bf), h) + tw[2 * i + 1][:], 0
            ).astype(bf)
        # final trunk layer: weight pre-transposed [1+G, H]
        out = _dot(tw[2 * (LT - 1)][:].astype(bf), h) + tw[2 * LT - 1][:]
        raw = out[0:1]  # [1, t] f32
        geo = out[1:].astype(bf)  # [G, t]
        sel = (
            (ut[0:1] > 0.0) & (ut[0:1] < 1.0)
            & (ut[1:2] > 0.0) & (ut[1:2] < 1.0)
            & (ut[2:3] > 0.0) & (ut[2:3] < 1.0)
        ).astype(jnp.float32)
        sigma = jnp.exp(raw - 1.0) * sel
        # rgb head: concat(SH dirs, geo) @ r0 == r0[:16]T sh + r0[16:]T geo
        shb = sht_ref[:].astype(bf)  # [16, t]
        r0b = rw[0][:].astype(bf)  # [16+G, 64]
        h1 = jnp.maximum(
            _dot_tn(r0b[:16], shb) + _dot_tn(r0b[16:], geo) + rw[1][:], 0
        ).astype(bf)
        h2 = jnp.maximum(
            _dot_tn(rw[2][:].astype(bf), h1) + rw[3][:], 0
        ).astype(bf)
        rgb_pre = _dot_tn(rw[4][:].astype(bf), h2) + rw[5][:]  # [3, t] f32
        rgb = 1.0 / (1.0 + jnp.exp(-rgb_pre))
        # semantic head
        m1 = jnp.maximum(
            _dot_tn(sw[0][:].astype(bf), geo) + sw[1][:], 0
        ).astype(bf)
        m2 = jnp.maximum(
            _dot_tn(sw[2][:].astype(bf), m1) + sw[3][:], 0
        ).astype(bf)
        sem = _dot_tn(sw[4][:].astype(bf), m2) + sw[5][:]  # [Csem, t] f32
        y_ref[0:3, :] = rgb
        y_ref[3:4, :] = sigma
        y_ref[4:, :] = sem

    return kernel


def _make_field_bwd_kernel(n_trunk: int):
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

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[...] = jnp.zeros_like(ref)

            ref[...] += val

        # ---- recompute the forward. ReLU masks are rounded to bf16 0/1
        # right after the f32 compare (bf16 compares don't lower on this
        # Mosaic target) and the f32 pre-acts die immediately — that plus
        # keeping only the bf16 cos/sin halves the backward's per-tile
        # VMEM vs the keep-f32-preacts layout.
        ut = ut_ref[:]
        utb = ut.astype(bf)
        wsb = wspec_ref[:].astype(bf)  # [3, M]
        proj = _dot_tn(wsb, utb) * _TWO_PI + phase_ref[:]  # [M, t] f32
        M = proj.shape[0]
        cb = jnp.cos(proj).astype(bf)
        sb = jnp.sin(proj).astype(bf)
        mk = lambda pre: (pre > 0).astype(bf)  # ReLU mask, bf16 0/1
        w0b = tw[0][:].astype(bf)
        a0 = _dot_tn(w0b[:M], cb) + _dot_tn(w0b[M:], sb) + tw[1][:]
        mask = [mk(a0)]
        h = [jnp.maximum(a0, 0).astype(bf)]
        for i in range(1, LT - 1):
            ai = _dot_tn(tw[2 * i][:].astype(bf), h[-1]) + tw[2 * i + 1][:]
            mask.append(mk(ai))
            h.append(jnp.maximum(ai, 0).astype(bf))
        wLb = tw[2 * (LT - 1)][:].astype(bf)  # [1+G, H] transposed
        out = _dot(wLb, h[-1]) + tw[2 * LT - 1][:]
        raw = out[0:1]
        geo = out[1:].astype(bf)
        sel = (
            (ut[0:1] > 0.0) & (ut[0:1] < 1.0)
            & (ut[1:2] > 0.0) & (ut[1:2] < 1.0)
            & (ut[2:3] > 0.0) & (ut[2:3] < 1.0)
        ).astype(jnp.float32)
        shb = sht_ref[:].astype(bf)
        r0b = rw[0][:].astype(bf)
        a1 = _dot_tn(r0b[:16], shb) + _dot_tn(r0b[16:], geo) + rw[1][:]
        mk1 = mk(a1)
        h1 = jnp.maximum(a1, 0).astype(bf)
        a2 = _dot_tn(rw[2][:].astype(bf), h1) + rw[3][:]
        mk2 = mk(a2)
        h2 = jnp.maximum(a2, 0).astype(bf)
        rgb_pre = _dot_tn(rw[4][:].astype(bf), h2) + rw[5][:]
        rgb = 1.0 / (1.0 + jnp.exp(-rgb_pre))
        am1 = _dot_tn(sw[0][:].astype(bf), geo) + sw[1][:]
        mkm1 = mk(am1)
        m1 = jnp.maximum(am1, 0).astype(bf)
        am2 = _dot_tn(sw[2][:].astype(bf), m1) + sw[3][:]
        mkm2 = mk(am2)
        m2 = jnp.maximum(am2, 0).astype(bf)

        # ---- backward
        g = g_ref[:]  # [4+Csem, t] f32
        g_sem = g[4:]
        gsem_b = g_sem.astype(bf)
        acc(dsw[4], _dot_nt(m2, gsem_b))  # [64, Csem]
        acc(dsw[5], _sum_lanes(g_sem))
        gm2 = (_dot(sw[4][:].astype(bf), gsem_b) * mkm2).astype(bf)
        acc(dsw[2], _dot_nt(m1, gm2))
        acc(dsw[3], _sum_lanes(gm2))
        gm1 = (_dot(sw[2][:].astype(bf), gm2) * mkm1).astype(bf)
        acc(dsw[0], _dot_nt(geo, gm1))
        acc(dsw[1], _sum_lanes(gm1))
        g_geo_sem = _dot(sw[0][:].astype(bf), gm1)  # [G, t] f32

        grgb_pre = g[0:3] * rgb * (1.0 - rgb)  # f32 [3, t]
        gp_b = grgb_pre.astype(bf)
        acc(drw[4], _dot_nt(h2, gp_b))
        acc(drw[5], _sum_lanes(grgb_pre))
        gh2 = (_dot(rw[4][:].astype(bf), gp_b) * mk2).astype(bf)
        acc(drw[2], _dot_nt(h1, gh2))
        acc(drw[3], _sum_lanes(gh2))
        gh1 = (_dot(rw[2][:].astype(bf), gh2) * mk1).astype(bf)
        dr0 = drw[0]

        @pl.when(first)
        def _():
            dr0[...] = jnp.zeros_like(dr0)

        dr0[:16] += _dot_nt(shb, gh1)
        dr0[16:] += _dot_nt(geo, gh1)
        acc(drw[1], _sum_lanes(gh1))
        g_geo_rgb = _dot(r0b[16:], gh1)  # [G, t] f32

        graw = g[3:4] * jnp.exp(jnp.minimum(raw - 1.0, 15.0)) * sel
        g_geo = g_geo_sem + g_geo_rgb
        graw_b = graw.astype(bf)
        ggeo_b = g_geo.astype(bf)
        dwL = dtw[2 * (LT - 1)]  # [1+G, H]

        @pl.when(first)
        def _():
            dwL[...] = jnp.zeros_like(dwL)

        dwL[0:1] += _dot_nt(graw_b, h[-1])
        dwL[1:] += _dot_nt(ggeo_b, h[-1])
        dbL = dtw[2 * LT - 1]  # [1+G, 1]

        @pl.when(first)
        def _():
            dbL[...] = jnp.zeros_like(dbL)

        dbL[0:1] += _sum_lanes(graw)
        dbL[1:] += _sum_lanes(g_geo)
        gh = (
            (_dot_tn(wLb[0:1], graw_b) + _dot_tn(wLb[1:], ggeo_b))
            * mask[LT - 2]
        ).astype(bf)
        for i in range(LT - 2, 0, -1):
            acc(dtw[2 * i], _dot_nt(h[i - 1], gh))
            acc(dtw[2 * i + 1], _sum_lanes(gh))
            gh = (_dot(tw[2 * i][:].astype(bf), gh) * mask[i - 1]).astype(
                bf
            )
        dw0 = dtw[0]

        @pl.when(first)
        def _():
            dw0[...] = jnp.zeros_like(dw0)

        dw0[:M] += _dot_nt(cb, gh)
        dw0[M:] += _dot_nt(sb, gh)
        acc(dtw[1], _sum_lanes(gh))
        g_cos = _dot(w0b[:M], gh)  # [M, t] f32
        g_sin = _dot(w0b[M:], gh)
        # dproj from the bf16 cos/sin pair (f32 via promotion) — same
        # rounding class as the XLA oracle, which casts dproj to bf16
        # before every consumer (_enc_bwd); keeping only cb/sb is half
        # the VMEM of the f32 pair
        dproj = cb * g_sin - sb * g_cos  # f32, VMEM-only
        dpb = dproj.astype(bf)
        acc(dwspec_ref, _dot_nt(utb, dpb) * _TWO_PI)  # [3, M]
        acc(dphase_ref, _sum_lanes(dproj))  # [M, 1]
        dut_ref[:] = (_dot(wsb, dpb) * _TWO_PI).astype(dut_ref.dtype)

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
        _make_field_fwd_kernel(len(tws) // 2),
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
        _make_field_bwd_kernel(len(tws) // 2),
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
