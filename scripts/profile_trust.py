"""Trust check: same-args repeated calls vs fresh-args calls, for
hash_encode and march_rays. Detects result-caching artifacts in the
remote execution path and gets honest per-call costs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.hashgrid import HashGridConfig, hash_encode, init_hash_table
from apnerf_tpu.ops.grid_march import candidate_lattice, march_rays


def bench(fn, args_list, label):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{label:55s} {dt*1e3:10.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    N = 262144
    cfg = HashGridConfig()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    xs = [
        jax.random.uniform(jax.random.PRNGKey(i), (N, 3)) for i in range(1, 6)
    ]
    enc = jax.jit(lambda t, x: hash_encode(t, x, cfg))
    bench(enc, [(table, xs[0])] * 5, "hash_encode SAME args x5")
    bench(enc, [(table, x) for x in xs], "hash_encode FRESH args x5")

    encg = jax.jit(
        lambda t, x: jax.grad(lambda t: hash_encode(t, x, cfg).sum())(t)
    )
    bench(encg, [(table, xs[0])] * 5, "hash fwd+bwd SAME args x5")
    bench(encg, [(table, x) for x in xs], "hash fwd+bwd FRESH args x5")

    R, S, K = 2048, 128, 2048
    aabb = jnp.asarray([-5.0, -5.0, -5.0, 5.0, 5.0, 5.0])
    binaries = (
        jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 128)) < 0.15
    )
    lattice = jnp.asarray(candidate_lattice(K, 0.1, 1e-3, 0.004))

    def rays(i):
        o = jax.random.uniform(
            jax.random.PRNGKey(10 + i), (R, 3), minval=-4, maxval=4
        )
        d = jax.random.normal(jax.random.PRNGKey(20 + i), (R, 3))
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    march = jax.jit(lambda o, d, b: march_rays(o, d, b, aabb, lattice, S))
    rs = [rays(i) for i in range(5)]
    bench(march, [(rs[0][0], rs[0][1], binaries)] * 5, "march SAME args x5")
    bench(
        march, [(o, d, binaries) for o, d in rs], "march FRESH args x5"
    )


if __name__ == "__main__":
    main()
