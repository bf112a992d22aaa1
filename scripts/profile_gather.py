"""Microbench gather/scatter formulations for the hash-table hot path.

The r1 finding: [2.1M] row-gather of F=4 from a [524288, 4] table costs
18 ms (the minor-dim rows are lane-padded), while a flat scalar scatter
costs 0.17 ms. This script races the candidate layouts to pick the one
the hash-encode kernel should use.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2, label=""):
    t_c = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t_c = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:55s} {dt*1e3:10.3f} ms  (compile {t_c:.1f}s)")
    return dt


def main():
    print("devices:", jax.devices())
    T, F = 1 << 19, 4
    N8 = 262144 * 8
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (T, F))
    tbl_f = tbl.T.reshape(F, T)  # feature-major
    tbl_flat = tbl.reshape(-1)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N8,), 0, T)
    idx2d = idx.reshape(262144, 8)

    # 1. row gather [N8, F]
    timeit(jax.jit(lambda t, i: t[i]), tbl, idx, label="1 row gather tbl[T,F][idx]")

    # 2. scalar gather per feature (feature-major table)
    @jax.jit
    def g2(t, i):
        return jnp.stack([t[f][i] for f in range(F)], axis=-1)

    timeit(g2, tbl_f, idx, label="2 scalar gather x4 feature-major")

    # 3. flat gather with interleaved features
    @jax.jit
    def g3(t, i):
        return jnp.stack([t[i * F + f] for f in range(F)], axis=-1)

    timeit(g3, tbl_flat, idx, label="3 flat gather x4 interleaved")

    # 4. jnp.take along axis 0
    timeit(
        jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
        tbl, idx, label="4 jnp.take rows",
    )

    # 5. gather [N, 8] -> [N, 8, F] (2D index shape, as hash_encode does)
    timeit(
        jax.jit(lambda t, i: t[i.reshape(-1)].reshape(262144, 8, F)),
        tbl, idx2d, label="5 reshape-flat row gather (hash_encode form)",
    )

    # 6. one_hot matmul, small table (dense level 0: 17^3)
    Ts = 17 ** 3
    idx_s = jax.random.randint(jax.random.PRNGKey(2), (N8,), 0, Ts)
    tbl_s = jax.random.normal(jax.random.PRNGKey(3), (Ts, F))

    # 7. scatter-add styles for backward
    vals = jax.random.normal(jax.random.PRNGKey(4), (N8, F))

    timeit(
        jax.jit(lambda i, v: jnp.zeros((T, F)).at[i].add(v)),
        idx, vals, label="7 scatter-add rows [N8,F] -> [T,F]",
    )

    @jax.jit
    def s8(i, v):
        return jnp.stack(
            [jnp.zeros((T,)).at[i].add(v[:, f]) for f in range(F)], axis=-1
        )

    timeit(s8, idx, vals, label="8 scalar scatter-add x4")

    # 9. the actual VJP pattern: grad of (weights * gathered).sum()
    w = jax.random.normal(jax.random.PRNGKey(5), (262144, 8))

    def enc_level(t):
        vals = t[idx2d.reshape(-1)].reshape(262144, 8, F)
        return jnp.einsum("nc,ncf->nf", w, vals)

    timeit(
        jax.jit(lambda t: jax.grad(lambda t: enc_level(t).sum())(t)),
        tbl, label="9 grad of one level (einsum+gather VJP)",
    )

    # 10. manual backward: scatter of w[:, :, None] * g
    g = jax.random.normal(jax.random.PRNGKey(6), (262144, F))

    @jax.jit
    def manual_bwd(w, g, i):
        v = (w[:, :, None] * g[:, None, :]).reshape(-1, F)
        return jnp.zeros((T, F)).at[i.reshape(-1)].add(v)

    timeit(manual_bwd, w, g, idx2d, label="10 manual bwd scatter(w*g)")

    # 11. fwd gather fused with einsum (XLA fuses?)
    timeit(
        jax.jit(enc_level), tbl, label="11 one level fwd (gather+einsum)",
    )

    # 12. scalar-gather formulation of one level fwd
    @jax.jit
    def enc_level_scalar(t_f):
        vs = [t_f[f][idx2d.reshape(-1)].reshape(262144, 8) for f in range(F)]
        return jnp.stack([jnp.sum(w * v, axis=1) for v in vs], axis=-1)

    timeit(enc_level_scalar, tbl_f, label="12 one level fwd scalar-gather x4")

    # 13. grad of scalar-gather formulation
    timeit(
        jax.jit(lambda t: jax.grad(lambda t: enc_level_scalar(t).sum())(t)),
        tbl_f, label="13 grad one level scalar-gather x4",
    )


if __name__ == "__main__":
    main()
