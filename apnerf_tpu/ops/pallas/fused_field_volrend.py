"""Fused field + volume-rendering Pallas kernel: the whole train render.

Extends the whole-field kernel (``fused_field_heads``: spectral encode +
trunk + density/rgb/sem heads) THROUGH the volume-rendering accumulation,
so the per-sample field values never leave VMEM. The reference's train
step materializes per-sample rgb/sigma/sem and runs separate CUDA scans +
``index_add_`` accumulations (`/root/reference/perception/models/
utils.py:362-461`, nerfacc ``scan.cu``/``volrend.py:486-550``); the
fused_field_heads path already deleted the inter-kernel glue but still
wrote a packed [4+C, N] f32 field output — 69 MB/step that the r4
production trace shows costing ~0.65 ms/step of pure retiling
(``reshape.1370`` + the gradient-side inverse) plus the downstream XLA
weights/accumulate chain. This kernel's outputs are per-RAY:

    acc = [ rgb_acc (3 rows)     Σ_s w_s·rgb_s
            opacity (1 row)      Σ_s w_s
            depth_num (1 row)    Σ_s w_s·t_mid_s
            sem_acc (C rows) ]   Σ_s w_s·sem_s        # [5+C, R] f32
    weights                                           # [1, N] f32

(weights stream out only because ``prop_loss`` consumes them — detached,
``models/propnet.py:137``). Background compositing and the depth/opacity
division stay outside (tiny [R, ·] ops).

TPU mechanics — everything stays in the kernel's transposed [rows, cols]
orientation (no in-kernel reshapes, which don't lower on this Mosaic
target):

* Per-ray segments are lane-aligned: S (samples/ray) divides the column
  tile, so a ray's samples are contiguous lanes. The exclusive cumsum for
  transmittance runs as ONE small matmul with an iota-generated
  block-lower-triangular mask ``LT[m, n] = (m//S == n//S) & (m < n)`` —
  the segmented scan becomes an MXU op (f32; the mask FLOPs are ~0.1% of
  the tile's trunk FLOPs). The backward's reverse cumsum reuses the SAME
  mask with the contraction flipped (``_dot_nt``).
* Per-ray reductions use a ray-indicator matmul ``Grel[n, j] =
  (ray(n) == j)`` into a [rows, 128] block: the acc output block covers
  128 rays and is revisited for ``128·S/t`` consecutive grid steps
  (zeroed on first visit, accumulated in VMEM, written back by Pallas
  when the block index advances) — the same revisiting-accumulator
  pattern as the weight gradients. The backward broadcasts the per-ray
  cotangent back over lanes with the transposed indicator.
* The volrend backward is closed-form in-kernel: with a = σ·dt,
  T = exp(-excl_cumsum a), α = 1-exp(-a), w = T·α,
  da_s = dw_s·T_s·exp(-a_s) − Σ_{j>s} dw_j·w_j (reverse cumsum).

Ray validity (aabb miss) folds into dt (dt=0 ⇒ α=0 ⇒ w=0), exactly
matching the unfused ``sigmas * ~miss`` (``render/prop_renderer.py``).
Sampled t's are stop-gradiented by the renderer (as nerfacc's estimator
samples under no_grad, ``prop_net.py:61-134``), so dt/t_mid need no
cotangents.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_field_heads import (
    _head_weights_t,
    _mlp_grads_from_flat,
    _n_splits,
    _sum_lanes,
    _trunk_weights_t,
    _whole,
)
from .fused_mlp import _TWO_PI, _dot, _dot_nt, _dot_tn, _use_interpret

# rays per acc output block — one full lane register of per-ray values
_RAY_BLOCK = 128

# This kernel defaults to a LARGER tile than the plain field kernels
# (2048 vs fused_mlp's 1024): the r4 sweep measured 2.126x vs 1.974x at
# production size. Bigger tiles only fit scoped VMEM because the split
# chains stay 256 columns wide (splits = tile/256) — tile 2048 at 4
# splits (512-wide chains) exceeds the 16 MB scoped-vmem limit by 56 KB
# in the backward. Both knobs remain overridable.
_FVR_TILE = int(
    os.environ.get(
        "APNERF_FVR_TILE", os.environ.get("APNERF_FUSED_TILE", "2048")
    )
)
_CHAIN_COLS = 256


def _fvr_tile(N: int, S: int) -> int:
    # a tile may not span more than one 128-ray acc block (the out
    # blockspec revisits one block for (128*S)//t consecutive steps)
    t = min(_FVR_TILE, N, _RAY_BLOCK * S)
    while N % t:
        t //= 2
    return max(t, 1)


def _clamp_splits(t: int, S: int) -> int:
    """Chains must hold whole rays AND whole lane registers."""
    env = os.environ.get("APNERF_FUSED_SPLITS")
    n = int(env) if env else max(t // _CHAIN_COLS, 1)
    while n > 1 and (t % (n * 128) or (t // n) % S):
        n //= 2
    return max(n, 1)


def _lt_mask(tc: int, S: int):
    """Block-lower-triangular {0,1} bf16 [tc, tc]: 1 where (same ray) &
    (m < n).  excl_cumsum(a)[n] = Σ_m a[m]·LT[m,n]  (a @ LT);
    rev_excl_cumsum(v)[n] = Σ_m v[m]·LT[n,m]  (_dot_nt(v, LT)).
    bf16 because the mask is exact in any dtype and f32 MXU passes cost
    ~4x — the f32-valued operand goes through ``_dot_hl``."""
    r = jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 1)
    return ((r // S == c // S) & (r < c)).astype(jnp.bfloat16)


def _dot_hl(x, ltm, nt: bool = False):
    """f32 [1, tc] × {0,1}-mask matmul at the bf16 MXU rate, ~f32
    accurate: split x = hi + lo (bf16 halves, residual rounded once),
    run ONE bf16 pass with f32 accumulation — hi and lo stack into a
    [2, tc] operand (any row count ≤128 is one MXU pass, so the stack
    is free) and the halves re-add after.  Relative error ~2^-17 vs
    f32's 2^-24 — far below the kernel's bf16 rounding class, at 1/4
    the padded cost of one f32 MXU pass (r4i)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = _dot_nt if nt else _dot
    r = d(jnp.concatenate([hi, lo], axis=0), ltm)
    n = x.shape[0]  # hi rows [:n], lo rows [n:] — valid for any row count
    return r[:n] + r[n:]


def _grel(i, k, tc: int, S: int, spg: int, rays_per_tile: int):
    """Ray-indicator bf16 [tc, 128] for chain k of grid step i: Grel[n, j]
    = 1 iff column n belongs to ray j of the current 128-ray acc block."""
    base = (i % spg) * rays_per_tile + k * (tc // S)
    rr = base + jax.lax.broadcasted_iota(jnp.int32, (tc, _RAY_BLOCK), 0) // S
    jj = jax.lax.broadcasted_iota(jnp.int32, (tc, _RAY_BLOCK), 1)
    return (rr == jj).astype(jnp.bfloat16)


def _field_fwd_chains(ut_ref, shb, wspec_ref, phase_ref, tw, hw,
                      cols, with_preacts: bool):
    """Shared stage-interleaved field recompute over column chains (the
    fused_field_heads fwd math, except SH view features arrive
    pre-expanded per chain — bf16 [16, tc] lists built from the per-RAY
    block via the ray-indicator matmul — and the rgb+sem heads run as
    ONE block-combined 128-wide MLP, r4i). Returns per-chain lists; with
    ``with_preacts`` also the intermediates the backward needs.

    Block-combined head: both 64-wide heads pad every MXU dim to 128
    anyway, so running them separately costs 7 padded dots per direction
    where a single 128-wide MLP with block-structured weights (built
    OUTSIDE the kernel by ``_combine_head_weights``: rgb blocks in rows
    [:64], sem blocks in rows [64:], structural zeros elsewhere) does the
    identical math — same products, same f32 accumulation order per
    block — in 3. Input x = [SH(16); geo(G)]; output [3 rgb + C sem]."""
    bf = jnp.bfloat16
    LT = len(tw) // 2
    Z = range(len(cols))
    ut = [ut_ref[:, col] for col in cols]
    utb = [u.astype(bf) for u in ut]
    wsb = wspec_ref[:].astype(bf)
    proj = [_dot_tn(wsb, ub) * _TWO_PI + phase_ref[:] for ub in utb]
    M = proj[0].shape[0]
    cb = [jnp.cos(p).astype(bf) for p in proj]
    sb = [jnp.sin(p).astype(bf) for p in proj]
    w0b = tw[0][:].astype(bf)
    a0 = [_dot_tn(w0b[:M], cb[k]) + _dot_tn(w0b[M:], sb[k]) + tw[1][:]
          for k in Z]
    h = [[jnp.maximum(a, 0).astype(bf)] for a in a0]
    for i in range(1, LT - 1):
        wib = tw[2 * i][:].astype(bf)
        ai = [_dot_tn(wib, h[k][-1]) + tw[2 * i + 1][:] for k in Z]
        for k in Z:
            h[k].append(jnp.maximum(ai[k], 0).astype(bf))
    wLb = tw[2 * (LT - 1)][:].astype(bf)  # [1+G, H] pre-transposed
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
    sigma = [jnp.exp(raw[k] - 1.0) * sel[k] for k in Z]
    # block-combined head: x = [SH; geo] (bf16 concat at row 16 — the
    # bf16 sublane tile — so the concat is tile-aligned)
    x = [jnp.concatenate([shb[k], geo[k]], axis=0) for k in Z]
    w1b = hw[0][:].astype(bf)
    ac1 = [_dot_tn(w1b, xk) + hw[1][:] for xk in x]
    hc1 = [jnp.maximum(a, 0).astype(bf) for a in ac1]
    w2b = hw[2][:].astype(bf)
    ac2 = [_dot_tn(w2b, hk) + hw[3][:] for hk in hc1]
    hc2 = [jnp.maximum(a, 0).astype(bf) for a in ac2]
    w3b = hw[4][:].astype(bf)
    outh = [_dot_tn(w3b, hk) + hw[5][:] for hk in hc2]  # [3+C, tc] f32
    rgb = [1.0 / (1.0 + jnp.exp(-o[0:3])) for o in outh]
    sem = [o[3:] for o in outh]  # [Csem, tc] f32
    fwd = dict(rgb=rgb, sigma=sigma, sem=sem)
    if not with_preacts:
        return fwd
    # VMEM-diet contract (r4g): the dict deliberately does NOT carry the
    # ReLU masks or the head activations — ``_field_bwd_v`` recomputes
    # masks from recomputed f32 pre-activations ((h>0) ⟺ (a>0), exact;
    # bf16 compares don't lower on this Mosaic target) and re-runs the
    # cheap head dots, so the forward's copies die before the volrend
    # section instead of living across the whole kernel. At tile 2048
    # that was ~4 MB of the combined kernel's 5.3 MB scoped-VMEM overage.
    fwd.update(
        utb=utb, cb=cb, sb=sb, M=M, h=h, raw=raw, geo=geo,
        sel=sel, shb=shb,
        w0b=w0b, wLb=wLb, w1b=w1b, w2b=w2b, w3b=w3b,
        wsb=wsb, tw=tw, hb1=hw[1][:], hb3=hw[3][:],
    )
    return fwd


def _volrend_chains(sigma, dt_ref, cols, ltm):
    """Per-chain transmittance weights: a=σ·dt, T=exp(-excl_cumsum a),
    α=1-exp(-a), w=T·α — matches ops/volrend.render_weight_from_density
    (exclusive-sum formulation, `volrend.py:164-229`)."""
    a = [sigma[k] * dt_ref[:, col] for k, col in enumerate(cols)]
    Tr = [jnp.exp(-_dot_hl(ak, ltm)) for ak in a]
    al = [1.0 - jnp.exp(-ak) for ak in a]
    w = [Tr[k] * al[k] for k in range(len(cols))]
    return a, Tr, al, w


def _make_fvr_fwd_kernel(n_trunk: int, S: int, spg: int,
                         rays_per_tile: int, n_splits: int):
    LT = n_trunk

    def kernel(ut_ref, sht_ref, dt_ref, tm_ref, wspec_ref, phase_ref,
               *refs):
        tw = refs[: 2 * LT]
        hw = refs[2 * LT : 2 * LT + 6]
        acc_ref, w_ref = refs[-2], refs[-1]
        bf = jnp.bfloat16
        i = pl.program_id(0)
        t = ut_ref.shape[1]
        tc = t // n_splits
        Z = range(n_splits)
        cols = [slice(k * tc, (k + 1) * tc) for k in Z]
        # ray-indicator blocks double as the SH expander: sht arrives
        # per-RAY [16, 128] (not per-sample [16, N] — that broadcast was
        # ~100 MB/step of HBM traffic) and fans out over lanes with one
        # [16,128]x[128,tc] MXU dot per chain.
        gr = [_grel(i, k, tc, S, spg, rays_per_tile) for k in Z]
        shtb = sht_ref[:].astype(bf)
        shb = [_dot_nt(shtb, gr[k]).astype(bf) for k in Z]
        f = _field_fwd_chains(ut_ref, shb, wspec_ref, phase_ref,
                              tw, hw, cols, with_preacts=False)
        ltm = _lt_mask(tc, S)
        _, _, _, w = _volrend_chains(f["sigma"], dt_ref, cols, ltm)
        for k in Z:
            w_ref[:, cols[k]] = w[k]
        # per-ray accumulation into the revisited 128-ray block. All
        # channels STACK into one [5+C, tc] operand per chain (rows pad
        # to 128 on the MXU either way, so four separate dots cost 4x
        # the passes of one stacked dot — r4i). Products round to bf16
        # for the indicator matmul (f32 MXU passes would cost ~4x); the
        # 128-term ray sums still accumulate in f32.
        accs = [
            _dot(
                jnp.concatenate(
                    [
                        f["rgb"][k] * w[k],
                        w[k],
                        w[k] * tm_ref[:, cols[k]],
                        f["sem"][k] * w[k],
                    ],
                    axis=0,
                ).astype(bf),
                gr[k],
            )
            for k in Z
        ]

        @pl.when(i % spg == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for k in Z:
            acc_ref[...] += accs[k]

    return kernel


def _field_bwd_v(f, dsig, g_rgb, g_sem, LT, Z, dut_ref=None, cols=None):
    """Shared field backward: from per-sample cotangents {g_rgb, dsig,
    g_sem} (per-chain [·, tc] lists) through the block-combined head +
    trunk + encode to the flat parameter-gradient list ``v`` consumed by
    ``_acc_param_grads``.  Writes duT per chain when ``dut_ref`` is given
    (the lossgrad kernel skips it: sampled positions are stop-gradiented
    upstream, so XLA discards duT there anyway).

    The combined head backward runs 3 padded dots per chain where the
    split heads ran 6, and its input cotangent g_x[16:] delivers
    d(geo) from BOTH heads in one matmul. Cross-block entries of the
    combined dW accumulators (e.g. SH→sem-hidden) are structurally
    meaningless and sliced away outside the kernel."""
    bf = jnp.bfloat16
    csum = lambda vals: sum(vals[1:], vals[0])
    raw, sel, geo = f["raw"], f["sel"], f["geo"]
    rgb, h, shb = f["rgb"], f["h"], f["shb"]
    # VMEM diet (r4g): recompute the head activations + their masks here
    # instead of retaining them from the forward — the forward's copies
    # die before the volrend section, and the masks come straight from
    # the recomputed f32 pre-activations. Trunk masks recompute from the
    # KEPT h via an f32 convert ((h>0) ⟺ (a>0), exact; bf16 compares
    # don't lower on this Mosaic target).
    mkh = lambda hx: (hx.astype(jnp.float32) > 0).astype(bf)
    w1b, w2b, w3b = f["w1b"], f["w2b"], f["w3b"]
    x = [jnp.concatenate([shb[k], geo[k]], axis=0) for k in Z]
    ac1 = [_dot_tn(w1b, xk) + f["hb1"] for xk in x]
    mk1 = [(a > 0).astype(bf) for a in ac1]
    hc1 = [jnp.maximum(a, 0).astype(bf) for a in ac1]
    ac2 = [_dot_tn(w2b, hk) + f["hb3"] for hk in hc1]
    mk2 = [(a > 0).astype(bf) for a in ac2]
    hc2 = [jnp.maximum(a, 0).astype(bf) for a in ac2]

    # head output cotangent, stacked [3+C, tc]: sigmoid'(rgb) rows then
    # the raw semantic-logit rows
    grgb_pre = [g_rgb[k] * rgb[k] * (1.0 - rgb[k]) for k in Z]
    gout = [
        jnp.concatenate([grgb_pre[k], g_sem[k]], axis=0) for k in Z
    ]
    goutb = [g.astype(bf) for g in gout]
    ghc2 = [(_dot(w3b, goutb[k]) * mk2[k]).astype(bf) for k in Z]
    ghc1 = [(_dot(w2b, ghc2[k]) * mk1[k]).astype(bf) for k in Z]
    gx = [_dot(w1b, ghc1[k]) for k in Z]  # [16+G, tc] f32

    graw = [
        dsig[k] * jnp.exp(jnp.minimum(raw[k] - 1.0, 15.0)) * sel[k]
        for k in Z
    ]
    # trunk out-layer cotangent, stacked [1+G, tc]: raw-density row then
    # the geo rows (gx[16:] already sums the rgb- and sem-head paths)
    gtr = [
        jnp.concatenate([graw[k], gx[k][16:]], axis=0) for k in Z
    ]
    gtrb = [g.astype(bf) for g in gtr]
    wLb, w0b, wsb = f["wLb"], f["w0b"], f["wsb"]
    gh = [
        (_dot_tn(wLb, gtrb[k]) * mkh(h[k][LT - 2])).astype(bf)
        for k in Z
    ]
    mid = []
    for li in range(LT - 2, 0, -1):
        mid.append(csum([_dot_nt(h[k][li - 1], gh[k]) for k in Z]))
        mid.append(csum([_sum_lanes(gh[k]) for k in Z]))
        wib = f["tw"][2 * li][:].astype(bf)
        gh = [(_dot(wib, gh[k]) * mkh(h[k][li - 1])).astype(bf)
              for k in Z]
    M = f["M"]
    cb, sb, utb = f["cb"], f["sb"], f["utb"]
    g_cos = [_dot(w0b[:M], ghk) for ghk in gh]
    g_sin = [_dot(w0b[M:], ghk) for ghk in gh]
    dproj = [cb[k] * g_sin[k] - sb[k] * g_cos[k] for k in Z]
    dpb = [dp.astype(bf) for dp in dproj]
    if dut_ref is not None:
        for k in Z:
            dut_ref[:, cols[k]] = (_dot(wsb, dpb[k]) * _TWO_PI).astype(
                dut_ref.dtype
            )
    return [
        csum([_dot_nt(utb[k], dpb[k]) for k in Z]) * _TWO_PI,
        csum([_sum_lanes(dproj[k]) for k in Z]),
        csum([_dot_nt(cb[k], gh[k]) for k in Z]),
        csum([_dot_nt(sb[k], gh[k]) for k in Z]),
        csum([_sum_lanes(gh[k]) for k in Z]),
        *mid,
        csum([_dot_nt(gtrb[k], h[k][-1]) for k in Z]),  # dwL [1+G, H]
        csum([_sum_lanes(gtr[k]) for k in Z]),          # dbL [1+G, 1]
        csum([_dot_nt(x[k], ghc1[k]) for k in Z]),      # dW1c [16+G, 2H]
        csum([_sum_lanes(ghc1[k]) for k in Z]),         # db1c [2H, 1]
        csum([_dot_nt(hc1[k], ghc2[k]) for k in Z]),    # dW2c [2H, 2H]
        csum([_sum_lanes(ghc2[k]) for k in Z]),         # db2c [2H, 1]
        csum([_dot_nt(hc2[k], goutb[k]) for k in Z]),   # dW3c [2H, 3+C]
        csum([_sum_lanes(gout[k]) for k in Z]),         # db3c [3+C, 1]
    ]


def _acc_param_grads(first, dwspec_ref, dphase_ref, dtw, dhw, v,
                     LT, Mspec):
    """Accumulate the ``_field_bwd_v`` list into the revisited VMEM
    parameter-gradient outputs (zeroed on the first grid step)."""

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

    acc(dwspec_ref, v[0])
    acc(dphase_ref, v[1])
    acc_split(dtw[0], (slice(0, Mspec), slice(Mspec, None)),
              (v[2], v[3]))
    acc(dtw[1], v[4])
    p = 5
    for li in range(LT - 2, 0, -1):
        acc(dtw[2 * li], v[p])
        acc(dtw[2 * li + 1], v[p + 1])
        p += 2
    # dwL/dbL arrive whole [1+G, ·] (the stacked out-layer backward)
    acc(dtw[2 * (LT - 1)], v[p])
    acc(dtw[2 * LT - 1], v[p + 1])
    for j in range(6):
        acc(dhw[j], v[p + 2 + j])


def _make_fvr_bwd_kernel(n_trunk: int, S: int, spg: int,
                         rays_per_tile: int, n_splits: int):
    LT = n_trunk

    def kernel(ut_ref, sht_ref, dt_ref, tm_ref, wspec_ref, phase_ref,
               *refs):
        tw = refs[: 2 * LT]
        hw = refs[2 * LT : 2 * LT + 6]
        gacc_ref = refs[2 * LT + 6]
        gwin_ref = refs[2 * LT + 7]
        dut_ref = refs[2 * LT + 8]
        dwspec_ref = refs[2 * LT + 9]
        dphase_ref = refs[2 * LT + 10]
        dtw = refs[2 * LT + 11 : 4 * LT + 11]
        dhw = refs[4 * LT + 11 : 4 * LT + 17]
        bf = jnp.bfloat16
        i = pl.program_id(0)
        first = i == 0
        t = ut_ref.shape[1]
        tc = t // n_splits
        Z = range(n_splits)
        cols = [slice(k * tc, (k + 1) * tc) for k in Z]
        gr = [_grel(i, k, tc, S, spg, rays_per_tile) for k in Z]
        shtb = sht_ref[:].astype(bf)
        shb_in = [_dot_nt(shtb, gr[k]).astype(bf) for k in Z]
        f = _field_fwd_chains(ut_ref, shb_in, wspec_ref, phase_ref,
                              tw, hw, cols, with_preacts=True)
        ltm = _lt_mask(tc, S)
        a, Tr, _, w = _volrend_chains(f["sigma"], dt_ref, cols, ltm)

        # per-ray cotangents broadcast back over lanes
        gaccb = gacc_ref[:].astype(bf)  # [5+C, 128]
        gb = [_dot_nt(gaccb, gr[k]) for k in Z]  # [5+C, tc] f32
        g_rgb = [gb[k][0:3] * w[k] for k in Z]
        g_sem = [gb[k][5:] * w[k] for k in Z]
        # d(loss)/d(w_s): direct acc terms + the weights-output cotangent
        dw = [
            jnp.sum(f["rgb"][k] * gb[k][0:3], axis=0, keepdims=True)
            + gb[k][3:4]
            + tm_ref[:, cols[k]] * gb[k][4:5]
            + jnp.sum(f["sem"][k] * gb[k][5:], axis=0, keepdims=True)
            + gwin_ref[:, cols[k]]
            for k in Z
        ]
        # w = T·α with T = exp(-excl_cum a), α = 1-exp(-a):
        # da_s = dw_s·T_s·e^{-a_s} − Σ_{j>s} dw_j·w_j
        da = [
            dw[k] * Tr[k] * jnp.exp(-a[k]) - _dot_hl(dw[k] * w[k], ltm, nt=True)
            for k in Z
        ]
        dsig = [da[k] * dt_ref[:, cols[k]] for k in Z]

        # ---- field backward (fused_field_heads bwd with the packed
        # per-sample cotangent replaced by {g_rgb, dsig, g_sem})
        v = _field_bwd_v(f, dsig, g_rgb, g_sem, LT, Z,
                         dut_ref=dut_ref, cols=cols)
        _acc_param_grads(first, dwspec_ref, dphase_ref, dtw, dhw,
                         v, LT, wspec_ref.shape[1])

    return kernel


def _combine_head_weights(rws, sws):
    """Build the block-combined head weights from the separate rgb/sem
    head tuples (``_head_weights_t`` layout: native [in, out] weights +
    [D, 1] bias columns).  Both 64-wide heads pad every MXU dimension to
    128, so one 128-wide MLP with block-structured weights does the
    identical math in half the padded passes (r4i):

        W1 [16+G, 2H]: [:, :H] = rgb w0 ([SH;geo] input),
                       [16:, H:] = sem w0 (geo input), zeros elsewhere
        W2 [2H, 2H]:   block-diag(rgb w1, sem w1)
        W3 [2H, 3+C]:  [:H, :3] = rgb w2, [H:, 3:] = sem w2

    Runs OUTSIDE the kernel (tiny XLA ops, traced once per call)."""
    r0, rb1, r2, rb3, r4, rb5 = rws
    s0, sb1, s2, sb3, s4, sb5 = sws
    H = r2.shape[0]
    nr = r4.shape[1]
    W1 = jnp.zeros((r0.shape[0], 2 * H), r0.dtype)
    W1 = W1.at[:, :H].set(r0).at[r0.shape[0] - s0.shape[0]:, H:].set(s0)
    b1 = jnp.concatenate([rb1, sb1], axis=0)
    W2 = jnp.zeros((2 * H, 2 * H), r2.dtype)
    W2 = W2.at[:H, :H].set(r2).at[H:, H:].set(s2)
    b2 = jnp.concatenate([rb3, sb3], axis=0)
    W3 = jnp.zeros((2 * H, nr + s4.shape[1]), r4.dtype)
    W3 = W3.at[:H, :nr].set(r4).at[H:, nr:].set(s4)
    b3 = jnp.concatenate([rb5, sb5], axis=0)
    return (W1, b1, W2, b2, W3, b3)


def _split_head_grads(head, sem, flat):
    """Slice the combined-head gradient accumulators back into the two
    head grad dicts (cross-block entries are structurally meaningless —
    gradients of weights that are hard zeros in the forward — and are
    dropped here)."""
    dW1, db1, dW2, db2, dW3, db3 = flat
    H = head["w1"].shape[0]
    nr = head["w2"].shape[1]
    G = sem["w0"].shape[0]
    Din = dW1.shape[0]
    cast = lambda a, p: a.astype(p.dtype)
    dhead = {
        "w0": cast(dW1[:, :H], head["w0"]),
        "b0": cast(db1[:H, 0], head["b0"]),
        "w1": cast(dW2[:H, :H], head["w1"]),
        "b1": cast(db2[:H, 0], head["b1"]),
        "w2": cast(dW3[:H, :nr], head["w2"]),
        "b2": cast(db3[:nr, 0], head["b2"]),
    }
    dsem = {
        "w0": cast(dW1[Din - G:, H:], sem["w0"]),
        "b0": cast(db1[H:, 0], sem["b0"]),
        "w1": cast(dW2[H:, H:], sem["w1"]),
        "b1": cast(db2[H:, 0], sem["b1"]),
        "w2": cast(dW3[H:, nr:], sem["w2"]),
        "b2": cast(db3[nr:, 0], sem["b2"]),
    }
    return dhead, dsem


def _plan(N: int, S: int, max_tile: int = None):
    """(tile, splits, steps-per-acc-block, rays-per-tile) or None if the
    shapes don't admit the lane-aligned layout. ``max_tile`` caps the
    tile below the module default (the combined loss+grad kernel holds
    the forward products AND the backward preacts live simultaneously,
    so its scoped-VMEM frontier sits one tile size lower)."""
    t = _fvr_tile(N, S)
    if max_tile is not None:
        t = min(t, max_tile)
        while N % t:
            t //= 2
    if t % S or (_RAY_BLOCK * S) % t or (N // S) % _RAY_BLOCK:
        return None
    return t, _clamp_splits(t, S), (_RAY_BLOCK * S) // t, t // S


def supports_fused_volrend(N: int, S: int) -> bool:
    return _plan(N, S) is not None


def _call_fvr_fwd(ut, sht, dt, tm, wspec, phase2d, tws, rws, sws, S):
    N = ut.shape[1]
    c_out = 5 + sws[-2].shape[1]
    t, nsp, spg, rpt = _plan(N, S)
    R = N // S
    nspec = lambda d: pl.BlockSpec(
        (d, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    rayspec = lambda d: pl.BlockSpec(
        (d, _RAY_BLOCK), lambda i, _spg=spg: (0, i // _spg),
        memory_space=pltpu.VMEM,
    )
    ws = list(tws) + list(_combine_head_weights(rws, sws))
    return pl.pallas_call(
        _make_fvr_fwd_kernel(len(tws) // 2, S, spg, rpt, nsp),
        grid=(N // t,),
        in_specs=[nspec(3), rayspec(16), nspec(1), nspec(1)]
        + _whole([wspec.shape, phase2d.shape])
        + _whole([w.shape for w in ws]),
        out_specs=(rayspec(c_out), nspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((c_out, R), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ),
        interpret=_use_interpret(),
        compiler_params=_vmem_params(),
    )(ut, sht, dt, tm, wspec, phase2d, *ws)


def _call_fvr_bwd(ut, sht, dt, tm, wspec, phase2d, tws, rws, sws,
                  g_acc, g_w, S):
    N = ut.shape[1]
    M = wspec.shape[1]
    c_out = g_acc.shape[0]
    t, nsp, spg, rpt = _plan(N, S)
    nspec = lambda d: pl.BlockSpec(
        (d, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    rayspec = lambda d: pl.BlockSpec(
        (d, _RAY_BLOCK), lambda i, _spg=spg: (0, i // _spg),
        memory_space=pltpu.VMEM,
    )
    ws = list(tws) + list(_combine_head_weights(rws, sws))
    acc_shapes = [(3, M), (M, 1)] + [w.shape for w in ws]
    return pl.pallas_call(
        _make_fvr_bwd_kernel(len(tws) // 2, S, spg, rpt, nsp),
        grid=(N // t,),
        in_specs=[nspec(3), rayspec(16), nspec(1), nspec(1)]
        + _whole([wspec.shape, phase2d.shape])
        + _whole([w.shape for w in ws])
        + [rayspec(c_out), nspec(1)],
        out_specs=(nspec(3),) + tuple(_whole(acc_shapes)),
        out_shape=(jax.ShapeDtypeStruct((3, N), ut.dtype),)
        + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in acc_shapes),
        interpret=_use_interpret(),
        compiler_params=_vmem_params(),
    )(ut, sht, dt, tm, wspec, phase2d, *ws, g_acc, g_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_field_volrend(
    W_spec: jnp.ndarray,  # [3, M]
    phase: jnp.ndarray,  # [M]
    base: dict,
    head: dict,
    sem: dict,
    ut: jnp.ndarray,  # [3, N] unit-cube coords, transposed
    sht: jnp.ndarray,  # [16, R] per-RAY SH features (expanded in-kernel)
    dt: jnp.ndarray,  # [1, N] t1-t0, zeroed on aabb-miss rays
    tm: jnp.ndarray,  # [1, N] midpoint t
    S: int,  # samples per ray (lane-aligned segment size)
):
    """→ (acc [5+C, N/S] f32, weights [1, N] f32). See module docstring."""
    return _call_fvr_fwd(
        ut, sht, dt, tm, W_spec, phase.reshape(-1, 1),
        _trunk_weights_t(base), _head_weights_t(head),
        _head_weights_t(sem), S,
    )


def _fvr_fwd(W_spec, phase, base, head, sem, ut, sht, dt, tm, S):
    out = fused_field_volrend(W_spec, phase, base, head, sem, ut, sht,
                              dt, tm, S)
    return out, (W_spec, phase, base, head, sem, ut, sht, dt, tm)


def _fvr_bwd(S, res, g):
    W_spec, phase, base, head, sem, ut, sht, dt, tm = res
    g_acc, g_w = g
    tws = _trunk_weights_t(base)
    outs = _call_fvr_bwd(
        ut, sht, dt, tm, W_spec, phase.reshape(-1, 1),
        tws, _head_weights_t(head), _head_weights_t(sem),
        g_acc.astype(jnp.float32), g_w.astype(jnp.float32), S,
    )
    dut = outs[0].astype(ut.dtype)
    dW = outs[1].astype(W_spec.dtype)
    dphase = outs[2].reshape(-1).astype(phase.dtype)
    nt = len(tws)
    dbase = _mlp_grads_from_flat(base, outs[3 : 3 + nt], True)
    dhead, dsem = _split_head_grads(head, sem, outs[3 + nt : 9 + nt])
    # dt/tm come from the (stop-gradiented) sampler; SH features are a
    # fixed function of ray directions. Zeros are DCE'd when unused.
    return (dW, dphase, dbase, dhead, dsem, dut,
            jnp.zeros_like(sht), jnp.zeros_like(dt), jnp.zeros_like(tm))


fused_field_volrend.defvjp(_fvr_fwd, _fvr_bwd)


# ---------------------------------------------------------------------------
# Combined loss+grad kernel: fwd + bwd of the WHOLE train render in ONE pass
# ---------------------------------------------------------------------------
#
# The train step's fwd kernel is pure redundancy: the bwd kernel recomputes
# every forward value anyway (r4 trace: fwd 3.27 + bwd 6.60 ms/step). And
# because tiles hold WHOLE rays (S divides the tile), each ray's volume-
# rendering accumulation completes inside the one tile that contains it —
# so the per-ray LOSS COTANGENTS are computable in-kernel, per tile, and
# the separate forward pass disappears. The reference's train step is
# fwd+bwd through torch autograd over many CUDA kernels
# (`/root/reference/scripts/pipeline.py:455-532`); this is the whole thing
# as one fused program. The loss matches train/flagship.py's 3-term form
# exactly: w_rgb*mean(huber(rgb,pix)) + w_dep*mean(huber(depth,dgt)) +
# w_sem*mean(softmax-CE(sem_acc, labels)), with rgb = acc + bkgd*(1-op)
# and depth = depth_num / clip(op, f32 eps). Outputs: per-ray loss rows
# (raw sums, for reporting), the weights row (prop_loss consumes it
# DETACHED, so it carries no cotangent), and every parameter gradient.
# duT is skipped entirely: sampled positions are stop-gradiented upstream
# (render/prop_renderer.py), so autodiff discarded it anyway.

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def _vmem_params():
    """Per-kernel scoped-VMEM limit (Mosaic ``vmem_limit_bytes``).

    Mosaic's 16 MB scoped-VMEM budget is a compiler default, not the
    hardware ceiling — the v5e core has far more VMEM, and the combined
    loss+grad kernel's frontier (tile 2048 ≈ 18.3 MB live after the r4g
    diet) fits once the budget is raised. 32 MB is the measured default
    (tile-2048 lossgrad = 2.838× vs 2.610× at the 16 MB-bound tile 1024;
    tile 4096 at 64 MB regressed to 2.547×, so more budget ≠ more tile).
    ``APNERF_VMEM_MB`` overrides (0 = compiler default); the global
    ``--xla_tpu_scoped_vmem_limit_kib`` flag can't be used here because
    compilation happens server-side behind the axon tunnel."""
    mb = float(os.environ.get("APNERF_VMEM_MB", "32") or 0)
    if mb <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb * 2**20))

# With the 32 MB scoped-VMEM budget the combined kernel's frontier
# matches the split kernels' at tile 2048 (8 × 256-wide chains,
# ~18.3 MB live; the r4g diet keeps the trunk activations as the
# irreducible mass). The r4h sweep: 2048/8 = 2.838×, 2048/4 = 2.791×,
# 4096 = 2.547×, 1024 (old 16 MB-bound default) = 2.610×.
_LG_TILE = int(os.environ.get("APNERF_LG_TILE", "2048"))


def _make_fvr_lossgrad_kernel(n_trunk: int, S: int, spg: int,
                              rays_per_tile: int, n_splits: int,
                              c_rgb: float, c_dep: float, c_sem: float):
    LT = n_trunk

    def kernel(ut_ref, sht_ref, dt_ref, tm_ref, wspec_ref, phase_ref,
               *refs):
        tw = refs[: 2 * LT]
        hw = refs[2 * LT : 2 * LT + 6]
        pix_ref = refs[2 * LT + 6]     # [3, 128] per-ray rgb targets
        dgt_ref = refs[2 * LT + 7]     # [1, 128] depth targets
        lab_ref = refs[2 * LT + 8]     # [1, 128] f32 semantic labels
        bkgd_ref = refs[2 * LT + 9]    # [3, 1] background color
        w_ref = refs[2 * LT + 10]      # out: weights [1, N]
        lrows_ref = refs[2 * LT + 11]  # out: per-ray loss rows [3, 128]
        dwspec_ref = refs[2 * LT + 12]
        dphase_ref = refs[2 * LT + 13]
        dtw = refs[2 * LT + 14 : 4 * LT + 14]
        dhw = refs[4 * LT + 14 : 4 * LT + 20]
        bf = jnp.bfloat16
        i = pl.program_id(0)
        first = i == 0
        t = ut_ref.shape[1]
        tc = t // n_splits
        Z = range(n_splits)
        csum = lambda vals: sum(vals[1:], vals[0])
        cols = [slice(k * tc, (k + 1) * tc) for k in Z]
        gr = [_grel(i, k, tc, S, spg, rays_per_tile) for k in Z]
        shtb = sht_ref[:].astype(bf)
        shb_in = [_dot_nt(shtb, gr[k]).astype(bf) for k in Z]
        f = _field_fwd_chains(ut_ref, shb_in, wspec_ref, phase_ref,
                              tw, hw, cols, with_preacts=True)
        ltm = _lt_mask(tc, S)
        a, Tr, _, w = _volrend_chains(f["sigma"], dt_ref, cols, ltm)
        for k in Z:
            w_ref[:, cols[k]] = w[k]

        # ---- per-ray accumulations for THIS tile's rays (each ray's S
        # samples live entirely inside one tile, so these are the final
        # acc values — same bf16-product/f32-sum rounding as the fwd
        # kernel's revisited acc block). All channels stack into ONE
        # [5+C, tc] indicator dot per chain (rows pad to 128 on the MXU
        # either way — r4i).
        acc4 = csum(
            [
                _dot(
                    jnp.concatenate(
                        [
                            f["rgb"][k] * w[k],
                            w[k],
                            w[k] * tm_ref[:, cols[k]],
                            f["sem"][k] * w[k],
                        ],
                        axis=0,
                    ).astype(bf),
                    gr[k],
                )
                for k in Z
            ]
        )
        rgbc = acc4[0:3]                                           # [3,128]
        opc = acc4[3:4]                                            # [1,128]
        depc = acc4[4:5]                                           # [1,128]
        semc = acc4[5:]                                            # [C,128]

        # this tile covers ray columns [base, base+rays_per_tile) of the
        # 128-ray acc block — mask everything ray-local to them
        base = (i % spg) * rays_per_tile
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, _RAY_BLOCK), 1)
        inblk = ((jj >= base) & (jj < base + rays_per_tile)).astype(
            jnp.float32
        )

        # ---- loss + cotangents (train/flagship.py loss_fn, per ray)
        bk = bkgd_ref[:]                                   # [3, 1]
        rgb_full = rgbc + bk * (1.0 - opc)
        res = rgb_full - pix_ref[:]
        ares = jnp.abs(res)
        hubp = jnp.clip(res, -1.0, 1.0)                    # huber', δ=1
        l_rgb = jnp.sum(
            jnp.where(ares <= 1.0, 0.5 * res * res, ares - 0.5),
            axis=0, keepdims=True,
        )
        opc_e = jnp.maximum(opc, _F32_EPS)
        depth = depc / opc_e
        dres = depth - dgt_ref[:]
        adres = jnp.abs(dres)
        hubd = jnp.clip(dres, -1.0, 1.0)
        l_dep = jnp.where(adres <= 1.0, 0.5 * dres * dres, adres - 0.5)
        mx = jnp.max(semc, axis=0, keepdims=True)
        ex = jnp.exp(semc - mx)
        Zs = jnp.sum(ex, axis=0, keepdims=True)
        C = semc.shape[0]
        rr = jax.lax.broadcasted_iota(jnp.int32, (C, _RAY_BLOCK), 0)
        onehot = (rr.astype(jnp.float32) == lab_ref[:]).astype(jnp.float32)
        l_sem = (mx + jnp.log(Zs)
                 - jnp.sum(semc * onehot, axis=0, keepdims=True))

        @pl.when(i % spg == 0)
        def _():
            lrows_ref[...] = jnp.zeros_like(lrows_ref)

        lrows_ref[0:1] += l_rgb * inblk
        lrows_ref[1:2] += l_dep * inblk
        lrows_ref[2:3] += l_sem * inblk

        # cotangents w.r.t. the acc channels (mean norms + loss weights
        # baked into c_*); masked to this tile's rays
        g_rgbacc = (c_rgb * hubp) * inblk
        g_opacc = (
            c_rgb * jnp.sum(hubp * (-bk), axis=0, keepdims=True)
            + c_dep * hubd * (-depc) / (opc_e * opc_e)
            * (opc > _F32_EPS).astype(jnp.float32)
        ) * inblk
        g_dnacc = (c_dep * hubd / opc_e) * inblk
        g_semacc = (c_sem * (ex / Zs - onehot)) * inblk

        # broadcast back over lanes with ONE stacked [5+C, 128] indicator
        # dot per chain (same bf16 rounding class as the split bwd
        # kernel, which casts the incoming f32 g_acc to bf16 — r4i)
        gstk = jnp.concatenate(
            [g_rgbacc, g_opacc, g_dnacc, g_semacc], axis=0
        ).astype(bf)
        gcol = [_dot_nt(gstk, gr[k]) for k in Z]           # [5+C, tc] f32
        g_rgb_col = [gcol[k][0:3] for k in Z]
        gop_col = [gcol[k][3:4] for k in Z]
        gdn_col = [gcol[k][4:5] for k in Z]
        gsem_col = [gcol[k][5:] for k in Z]                # [C, tc]

        g_rgb = [g_rgb_col[k] * w[k] for k in Z]
        g_sem = [gsem_col[k] * w[k] for k in Z]
        # d(loss)/d(w_s): direct acc terms only (the weights output feeds
        # prop_loss DETACHED — zero cotangent by construction)
        dw = [
            jnp.sum(f["rgb"][k] * g_rgb_col[k], axis=0, keepdims=True)
            + gop_col[k]
            + tm_ref[:, cols[k]] * gdn_col[k]
            + jnp.sum(f["sem"][k] * gsem_col[k], axis=0, keepdims=True)
            for k in Z
        ]
        da = [
            dw[k] * Tr[k] * jnp.exp(-a[k]) - _dot_hl(dw[k] * w[k], ltm, nt=True)
            for k in Z
        ]
        dsig = [da[k] * dt_ref[:, cols[k]] for k in Z]

        v = _field_bwd_v(f, dsig, g_rgb, g_sem, LT, Z)
        _acc_param_grads(first, dwspec_ref, dphase_ref, dtw, dhw,
                         v, LT, wspec_ref.shape[1])

    return kernel


def _call_fvr_lossgrad(ut, sht, dt, tm, wspec, phase2d, tws, rws, sws,
                       pix, dgt, lab, bkgd, S, loss_weights):
    N = ut.shape[1]
    M = wspec.shape[1]
    R = N // S
    t, nsp, spg, rpt = _plan(N, S, max_tile=_LG_TILE)
    w_rgb, w_dep, w_sem = loss_weights
    kern = _make_fvr_lossgrad_kernel(
        len(tws) // 2, S, spg, rpt, nsp,
        c_rgb=w_rgb / (3.0 * R), c_dep=w_dep / R, c_sem=w_sem / R,
    )
    nspec = lambda d: pl.BlockSpec(
        (d, t), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    rayspec = lambda d: pl.BlockSpec(
        (d, _RAY_BLOCK), lambda i, _spg=spg: (0, i // _spg),
        memory_space=pltpu.VMEM,
    )
    ws = list(tws) + list(_combine_head_weights(rws, sws))
    acc_shapes = [(3, M), (M, 1)] + [w.shape for w in ws]
    return pl.pallas_call(
        kern,
        grid=(N // t,),
        in_specs=[nspec(3), rayspec(16), nspec(1), nspec(1)]
        + _whole([wspec.shape, phase2d.shape])
        + _whole([w.shape for w in ws])
        + [rayspec(3), rayspec(1), rayspec(1)]
        + _whole([bkgd.shape]),
        out_specs=(nspec(1), rayspec(3)) + tuple(_whole(acc_shapes)),
        out_shape=(
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
        )
        + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in acc_shapes),
        interpret=_use_interpret(),
        compiler_params=_vmem_params(),
    )(ut, sht, dt, tm, wspec, phase2d, *ws, pix, dgt, lab, bkgd)


def fused_field_volrend_lossgrad(
    W_spec: jnp.ndarray,  # [3, M]
    phase: jnp.ndarray,  # [M]
    base: dict,
    head: dict,
    sem: dict,
    ut: jnp.ndarray,  # [3, N]
    sht: jnp.ndarray,  # [16, R]
    dt: jnp.ndarray,  # [1, N]
    tm: jnp.ndarray,  # [1, N]
    pix: jnp.ndarray,  # [3, R] rgb targets
    dgt: jnp.ndarray,  # [1, R] depth targets
    lab: jnp.ndarray,  # [1, R] f32 semantic labels
    bkgd: jnp.ndarray,  # [3, 1]
    S: int,
    loss_weights=(10.0, 1.0 / 5.0, 1.0 / 2.0),
):
    """→ (lossrows [3, R] raw per-ray sums (rgb-huber Σ over channels,
    depth-huber, semantic CE), weights [1, N], grads tuple
    (dW_spec, dphase, dbase, dhead, dsem)) — the ENTIRE train render
    fwd+bwd in one Pallas pass. NOT differentiable (it returns the
    gradients of the fixed ``loss_weights`` combination directly); see
    train/flagship.py for the member core that consumes it."""
    tws = _trunk_weights_t(base)
    outs = _call_fvr_lossgrad(
        ut, sht, dt, tm, W_spec, phase.reshape(-1, 1),
        tws, _head_weights_t(head), _head_weights_t(sem),
        pix, dgt, lab, bkgd, S, loss_weights,
    )
    w, lossrows = outs[0], outs[1]
    dW = outs[2].astype(W_spec.dtype)
    dphase = outs[3].reshape(-1).astype(phase.dtype)
    nt = len(tws)
    dbase = _mlp_grads_from_flat(base, outs[4 : 4 + nt], True)
    dhead, dsem = _split_head_grads(head, sem, outs[4 + nt : 10 + nt])
    return lossrows, w, (dW, dphase, dbase, dhead, dsem)
