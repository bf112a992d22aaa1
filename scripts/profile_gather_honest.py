"""HONEST gather/scatter-rate measurement: every timing forces a scalar
readback (block_until_ready on this platform has been observed to return
without executing — see tpu-axon memory note). Measures rate vs table
size, index order, and dtype."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args_list, label, n8):
    out = float(fn(*args_list[0]))  # warm + force
    t0 = time.perf_counter()
    for a in args_list:
        out = float(fn(*a))
    dt = (time.perf_counter() - t0) / len(args_list)
    rate = n8 / dt / 1e9
    print(f"{label:55s} {dt*1e3:9.3f} ms  {rate:7.3f} G/s", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    N8 = 1 << 21  # 2.1M indices

    for logT in (10, 12, 14, 16, 17, 19, 21):
        T = 1 << logT
        tbl = jax.random.normal(jax.random.PRNGKey(0), (T,))
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (N8,), 0, T)
            for i in range(1, 4)
        ]
        g = jax.jit(lambda t, i: t[i].sum())
        bench(g, [(tbl, i) for i in idxs],
              f"gather f32 scalar T=2^{logT}", N8)

    # sorted indices (locality)
    T = 1 << 19
    tbl = jax.random.normal(jax.random.PRNGKey(0), (T,))
    idx_sorted = [
        jnp.sort(jax.random.randint(jax.random.PRNGKey(i), (N8,), 0, T))
        for i in range(1, 4)
    ]
    g = jax.jit(lambda t, i: t[i].sum())
    bench(g, [(tbl, i) for i in idx_sorted], "gather f32 SORTED T=2^19", N8)

    # rows of F=4
    tbl4 = jax.random.normal(jax.random.PRNGKey(0), (T, 4))
    idxs = [
        jax.random.randint(jax.random.PRNGKey(i), (N8,), 0, T)
        for i in range(1, 4)
    ]
    g4 = jax.jit(lambda t, i: t[i].sum())
    bench(g4, [(tbl4, i) for i in idxs], "gather f32 rows[F=4] T=2^19", N8)

    # scatter-add rates
    for logT in (12, 14, 19):
        T = 1 << logT
        vals = jax.random.normal(jax.random.PRNGKey(9), (N8,))
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (N8,), 0, T)
            for i in range(1, 4)
        ]
        s = jax.jit(lambda i, v: jnp.zeros((T,)).at[i].add(v).sum())
        bench(s, [(i, vals) for i in idxs],
              f"scatter-add f32 T=2^{logT}", N8)

    # take_along_axis lane gather [R, K] -> [R, S]
    R, K, S = 2048, 2048, 128
    src = jax.random.normal(jax.random.PRNGKey(0), (R, K))
    idxs = [
        jax.random.randint(jax.random.PRNGKey(i), (R, S), 0, K)
        for i in range(1, 4)
    ]
    ta = jax.jit(lambda s_, i: jnp.take_along_axis(s_, i, axis=1).sum())
    bench(ta, [(src, i) for i in idxs], "take_along_axis [2048,2048]->128",
          R * S)

    # one-hot matmul "gather" rate for small tables (MXU route)
    for logT in (10, 12, 14):
        T = 1 << logT
        tblm = jax.random.normal(jax.random.PRNGKey(0), (T, 4))
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (1 << 18, 1), 0, T)
            for i in range(1, 4)
        ]

        def onehot_gather(t, i):
            oh = (
                i == jnp.arange(T, dtype=jnp.int32)[None, :]
            ).astype(jnp.bfloat16)
            return jnp.dot(
                oh, t.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).sum()

        bench(jax.jit(onehot_gather), [(tblm, i) for i in idxs],
              f"one-hot matmul gather T=2^{logT} N=262k", 1 << 18)


if __name__ == "__main__":
    main()
