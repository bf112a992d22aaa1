"""Separate device compute from per-dispatch overhead for the hot ops:
measure each op standalone vs inside a 10-iteration lax.scan in one jit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.hashgrid import HashGridConfig, hash_encode, init_hash_table


def timeit(fn, *args, n=5, warmup=2, label=""):
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
    print(f"{label:55s} {dt*1e3:10.3f} ms  (compile {t_c:.1f}s)", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    N = 262144
    cfg = HashGridConfig()
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # 0. arg-size probe: trivial reduction over the table
    timeit(jax.jit(lambda t: t.sum()), table, label="0 table.sum() [134MB arg]")
    timeit(jax.jit(lambda x: x.sum()), x, label="0 x.sum() [3MB arg]")

    # 1. hash_encode single-call
    enc = jax.jit(lambda t, x: hash_encode(t, x, cfg))
    timeit(enc, table, x, label="1 hash_encode single")

    # 2. hash_encode x10 inside one scan
    @jax.jit
    def enc10(t, x):
        def body(c, _):
            return c + 1e-9 * hash_encode(t, x + c * 1e-6, cfg).sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return c

    d = timeit(enc10, table, x, label="2 hash_encode x10 scanned")
    print(f"    -> per-iter {d/10*1e3:.3f} ms", flush=True)

    # 3. fwd+bwd x10 scanned
    @jax.jit
    def encbwd10(t, x):
        def body(c, _):
            g = jax.grad(
                lambda t: hash_encode(t, x + c * 1e-6, cfg).sum()
            )(t)
            return c + 1e-9 * g[0, 0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return c

    d = timeit(encbwd10, table, x, n=3, warmup=1, label="3 hash fwd+bwd x10 scanned")
    print(f"    -> per-iter {d/10*1e3:.3f} ms", flush=True)

    # 4. pure gather [L,8,N] from [F, L*T], precomputed indices
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
    flat = table.transpose(2, 0, 1).reshape(F, L * T)
    idx = jax.random.randint(jax.random.PRNGKey(2), (L, 8, N), 0, L * T)
    w = jax.random.normal(jax.random.PRNGKey(3), (L, 8, N))

    @jax.jit
    def pure_gather(flat, idx, w):
        feats = []
        for f in range(F):
            vals = jax.lax.optimization_barrier(flat[f][idx])
            feats.append(jnp.sum(w * vals, axis=1))
        return jnp.stack(feats, axis=1)

    timeit(pure_gather, flat, idx, w, label="4 pure gather+trilerp (precomp idx)")

    # 5. march x10 scanned
    from apnerf_tpu.ops.grid_march import candidate_lattice, march_rays

    R, S = 2048, 128
    aabb = jnp.asarray([-5.0, -5.0, -5.0, 5.0, 5.0, 5.0])
    binaries = (
        jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 128)) < 0.15
    )
    lattice = jnp.asarray(candidate_lattice(2048, 0.1, 1e-3, 0.004))
    rays_o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3), minval=-4, maxval=4)
    rays_d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    march1 = jax.jit(lambda o, d, b: march_rays(o, d, b, aabb, lattice, S))
    timeit(march1, rays_o, rays_d, binaries, label="5 march single")

    @jax.jit
    def march10(o, d, b):
        def body(c, _):
            segs = march_rays(o + c * 1e-6, d, b, aabb, lattice, S)
            return c + 1e-9 * segs.t_starts.sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return c

    dt = timeit(march10, rays_o, rays_d, binaries, label="6 march x10 scanned")
    print(f"    -> per-iter {dt/10*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
