"""Definitive honest microbench: each op runs `REPS` times inside one
lax.scan (carry-dependent, so nothing hoists), and the timing forces a
float() readback. Per-call tunnel overhead (~30 ms) amortizes away.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.hashgrid import HashGridConfig, hash_encode, init_hash_table
from apnerf_tpu.ops.grid_march import candidate_lattice, march_rays

REPS = 10


def bench(make_scan, args, label, n_warm=1, n=2):
    fn = jax.jit(make_scan)
    for _ in range(n_warm):
        v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(fn(*args))
    dt = (time.perf_counter() - t0) / n
    per = (dt - 0.030) / REPS  # subtract ~tunnel floor, amortized anyway
    print(f"{label:52s} {dt*1e3:9.1f} ms/call  ~{per*1e3:8.3f} ms/iter",
          flush=True)


def scan_over(body):
    def run(*args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    N = 262144
    cfg = HashGridConfig()
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # 1. hash_encode fwd
    bench(
        scan_over(
            lambda c, t, x: 1e-6
            * hash_encode(t, x * (1 - 1e-7 * c), cfg).sum()
        ),
        (table, x), "hash_encode fwd",
    )

    # 2. hash_encode fwd+bwd
    bench(
        scan_over(
            lambda c, t, x: 1e-6
            * jax.grad(
                lambda t: hash_encode(t, x * (1 - 1e-7 * c), cfg).sum()
            )(t)[0, 0, 0]
        ),
        (table, x), "hash_encode fwd+bwd",
    )

    # 3. raw gather 2.1M from 2^19 (carry-dependent idx)
    T = 1 << 19
    tbl = jax.random.normal(jax.random.PRNGKey(0), (T,))
    idx = jax.random.randint(jax.random.PRNGKey(2), (N * 8,), 0, T - 8)

    bench(
        scan_over(
            lambda c, t, i: 1e-6 * t[i + c.astype(jnp.int32) % 2].sum()
        ),
        (tbl, idx), "gather 2.1M scalars from 2^19",
    )

    # 4. scatter-add 2.1M into 2^19
    vals = jax.random.normal(jax.random.PRNGKey(3), (N * 8,))
    bench(
        scan_over(
            lambda c, i, v: 1e-6
            * jnp.zeros((T,)).at[i + c.astype(jnp.int32) % 2].add(v).sum()
        ),
        (idx, vals), "scatter-add 2.1M into 2^19",
    )

    # 5. march_rays
    R, S, K = 2048, 128, 2048
    aabb = jnp.asarray([-5.0, -5.0, -5.0, 5.0, 5.0, 5.0])
    binaries = (
        jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 128)) < 0.15
    )
    lattice = jnp.asarray(candidate_lattice(K, 0.1, 1e-3, 0.004))
    rays_o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3), minval=-4, maxval=4)
    rays_d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    bench(
        scan_over(
            lambda c, o, d, b: 1e-6
            * march_rays(o * (1 - 1e-8 * c), d, b, aabb, lattice, S)
            .t_starts.sum()
        ),
        (rays_o, rays_d, binaries), "march_rays full",
    )

    # 6. MXU matmul sanity: [262144, 64] @ [64, 128]
    a = jax.random.normal(jax.random.PRNGKey(7), (N, 64))
    w = jax.random.normal(jax.random.PRNGKey(8), (64, 128))
    bench(
        scan_over(
            lambda c, a, w: 1e-9
            * jnp.dot(a * (1 + 1e-9 * c), w,
                      preferred_element_type=jnp.float32).sum()
        ),
        (a, w), "matmul 262k x 64 x 128",
    )


if __name__ == "__main__":
    main()
