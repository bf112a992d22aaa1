"""Probe: can the hash encode's 4 per-feature SCALAR gathers be one
ROW gather of [M, 4] rows from the [L*T, 4] table?

The central measurement (docs/PERFORMANCE.md) says XLA gathers cost
~7-11 ns per ROW on this chip. The production `hash_encode` gathers
F=4 features as 4 separate scalar gathers (4 x 33.5M rows/member-step);
if per-row cost is flat in row width, one [M, 4] row gather is ~4x
cheaper — the dominant cost of the occ parity path (the chained quality
run trains 2000 steps at ~7.6 s/step, mostly hash gathers).

Risk being probed: the [M, 4] gather output lane-pads 32x under (8,128)
tiling if XLA materializes it 4-minor (the r2 OOM class). Variants try
transposing right after the gather so layout assignment can pick M-minor.

Timing per docs/PERFORMANCE.md rules: scan-amortized, scalar readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.hashgrid import HashGridConfig, hash_encode, init_hash_table

REPS = 10


def bench(make_scan, args, label, n_warm=1, n=2):
    fn = jax.jit(make_scan)
    try:
        for _ in range(n_warm):
            v = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            v = float(fn(*args))
        dt = (time.perf_counter() - t0) / n
    except Exception as e:
        print(f"{label:58s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    per = (dt - 0.030) / REPS
    print(f"{label:58s} {dt*1e3:9.1f} ms/call  ~{per*1e3:8.3f} ms/iter",
          flush=True)


def scan_over(body):
    def run(*args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    return run


def _indices_and_weights(x, cfg):
    """Shared index/weight computation from hash_encode (copied shape
    logic; idx [L, 8, N] into the flat [L*T] table, weights [L, 8, N])."""
    from apnerf_tpu.ops.hashgrid import _CORNERS, _PRIMES

    L, T = cfg.n_levels, cfg.table_size
    resolutions = cfg.resolutions
    xt = x.T
    res_f = jnp.asarray(resolutions, dtype=x.dtype)[:, None, None]
    xs = xt[None, :, :] * res_f
    x0f = jnp.floor(xs)
    w = xs - x0f
    x0 = x0f.astype(jnp.int32)
    csel = jnp.asarray(_CORNERS.T[:, :, None], dtype=x.dtype)
    cw = csel * w[:, :, None, :] + (1.0 - csel) * (1.0 - w[:, :, None, :])
    weights = cw[:, 0] * cw[:, 1] * cw[:, 2]
    off = _CORNERS.T
    idx_rows = []
    for lvl in range(L):
        res = int(resolutions[lvl])
        cx = x0[lvl, 0][None, :] + jnp.asarray(off[0][:, None])
        cy = x0[lvl, 1][None, :] + jnp.asarray(off[1][:, None])
        cz = x0[lvl, 2][None, :] + jnp.asarray(off[2][:, None])
        n_dense = (res + 1) ** 3
        if n_dense <= T:
            stride = np.int32(res + 1)
            idx = cx + cy * stride + cz * (stride * stride)
        else:
            h = cx.astype(jnp.uint32) * np.uint32(_PRIMES[0])
            h = h ^ (cy.astype(jnp.uint32) * np.uint32(_PRIMES[1]))
            h = h ^ (cz.astype(jnp.uint32) * np.uint32(_PRIMES[2]))
            idx = (h % np.uint32(T)).astype(jnp.int32)
        idx_rows.append(idx + np.int32(lvl) * np.int32(T))
    return jnp.stack(idx_rows), weights


def rowgather_encode(table, x, cfg, transpose_after=True):
    """One [M, F] row gather from the flat [L*T, F] table."""
    N = x.shape[0]
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
    idx_all, weights = _indices_and_weights(x, cfg)
    idx_b = jax.lax.optimization_barrier(idx_all.reshape(-1))  # [L*8*N]
    flat = table.reshape(L * T, F)
    vals = jax.lax.optimization_barrier(flat[idx_b])  # [M, F]
    if transpose_after:
        vals = vals.T.reshape(F, L, 8, N)  # F-major, N minor
        feats = jnp.sum(weights[None] * vals, axis=2)  # [F, L, N]
        return feats.transpose(2, 1, 0).reshape(N, L * F)
    vals = vals.reshape(L, 8, N, F)
    feats = jnp.sum(weights[..., None] * vals, axis=1)  # [L, N, F]
    return feats.transpose(1, 0, 2).reshape(N, L * F)


def main():
    print("devices:", jax.devices(), flush=True)
    N = 262144
    cfg = HashGridConfig()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # baseline: current production hash_encode
    bench(
        scan_over(lambda c, t, x: 1e-6 * hash_encode(
            t, x * (1 - 1e-7 * c), cfg).sum()),
        (table, x), "A. current hash_encode fwd",
    )
    bench(
        scan_over(lambda c, t, x: 1e-6 * jax.grad(
            lambda tt: hash_encode(tt, x * (1 - 1e-7 * c), cfg).sum()
        )(t).sum()),
        (table, x), "B. current hash_encode fwd+bwd",
    )
    bench(
        scan_over(lambda c, t, x: 1e-6 * rowgather_encode(
            t, x * (1 - 1e-7 * c), cfg, True).sum()),
        (table, x), "C. rowgather (transpose-after) fwd",
    )
    bench(
        scan_over(lambda c, t, x: 1e-6 * jax.grad(
            lambda tt: rowgather_encode(tt, x * (1 - 1e-7 * c), cfg,
                                        True).sum()
        )(t).sum()),
        (table, x), "D. rowgather (transpose-after) fwd+bwd",
    )
    bench(
        scan_over(lambda c, t, x: 1e-6 * rowgather_encode(
            t, x * (1 - 1e-7 * c), cfg, False).sum()),
        (table, x), "E. rowgather (F-minor) fwd",
    )
    bench(
        scan_over(lambda c, t, x: 1e-6 * jax.grad(
            lambda tt: rowgather_encode(tt, x * (1 - 1e-7 * c), cfg,
                                        False).sum()
        )(t).sum()),
        (table, x), "F. rowgather (F-minor) fwd+bwd",
    )

    # calibration: raw row-gather rates at this M
    M = 16 * 8 * N
    idx = jax.random.randint(jax.random.PRNGKey(2), (M,), 0,
                             cfg.n_levels * cfg.table_size)
    flat4 = table.reshape(-1, 4)
    flat1 = table.reshape(-1)
    bench(
        scan_over(lambda c, f, i: 1e-6 * jax.lax.optimization_barrier(
            f[jax.lax.optimization_barrier(i + (c > 1e9).astype(jnp.int32))]
        ).sum()),
        (flat1, idx % flat1.shape[0]), "G. raw scalar gather, M rows",
    )
    bench(
        scan_over(lambda c, f, i: 1e-6 * jax.lax.optimization_barrier(
            f[jax.lax.optimization_barrier(i + (c > 1e9).astype(jnp.int32))]
        ).sum()),
        (flat4, idx), "H. raw [M,4] row gather",
    )
    bench(
        scan_over(lambda c, f, i: 1e-6 * jax.lax.optimization_barrier(
            f[jax.lax.optimization_barrier(i + (c > 1e9).astype(jnp.int32))]
        ).T.sum()),
        (flat4, idx), "I. raw [M,4] row gather + transpose",
    )


if __name__ == "__main__":
    main()
