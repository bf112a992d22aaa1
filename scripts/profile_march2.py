"""Drill into march stage A (mask = aabb + per-axis index + occ gather):
which sub-op costs 34 ms/iter?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R, K = 2048, 2048


def timeit(fn, *args, n=3, warmup=1, label=""):
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
    print(f"{label:55s} {dt/10*1e3:10.3f} ms/iter  (compile {t_c:.1f}s)",
          flush=True)
    return dt


def scanned(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return c + body(c, *args), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    aabb = jnp.asarray([-5.0, -5.0, -5.0, 5.0, 5.0, 5.0])
    bin_bool = jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 128)) < 0.15
    bin_i8 = bin_bool.astype(jnp.int8)
    bin_f32 = bin_bool.astype(jnp.float32)
    bin_u32 = bin_bool.astype(jnp.uint32)
    from apnerf_tpu.ops.grid_march import candidate_lattice

    lattice = jnp.asarray(candidate_lattice(K, 0.1, 1e-3, 0.004))
    rays_o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3), minval=-4, maxval=4)
    rays_d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_mid = (0.5 * (lattice[:-1] + lattice[1:]))[None, :]

    def idx_of(c, o):
        o = o + c * 1e-7
        inside = jnp.ones((R, K), dtype=bool)
        flat_idx = jnp.zeros((R, K), dtype=jnp.int32)
        strides = (128 * 128, 128, 1)
        for d in range(3):
            u_d = (o[:, d:d+1] + t_mid * rays_d[:, d:d+1] - aabb[d]) / (
                aabb[d+3] - aabb[d])
            inside = inside & (u_d >= 0.0) & (u_d < 1.0)
            i_d = jnp.clip((u_d * 128).astype(jnp.int32), 0, 127)
            flat_idx = flat_idx + i_d * strides[d]
        return flat_idx, inside

    # A1: index arithmetic only
    timeit(
        scanned(lambda c, o: 1e-9 * jnp.sum(idx_of(c, o)[0])),
        rays_o, label="A1 index arithmetic only",
    )

    idx_fixed, inside_fixed = jax.jit(
        lambda o: idx_of(jnp.float32(0), o)
    )(rays_o)
    idx_flat = idx_fixed.reshape(-1)

    def g(binv, idx):
        b = jax.lax.optimization_barrier(idx)
        return jax.lax.optimization_barrier(binv.reshape(-1)[b])

    # A2: gather bool, flat 1-D idx
    timeit(
        scanned(lambda c, i: 1e-9 * jnp.sum(
            g(bin_bool, i + (c < -1).astype(jnp.int32)))),
        idx_flat, label="A2 gather bool [4.2M] flat",
    )
    # A3: gather int8
    timeit(
        scanned(lambda c, i: 1e-9 * jnp.sum(
            g(bin_i8, i + (c < -1).astype(jnp.int32)).astype(jnp.int32))),
        idx_flat, label="A3 gather int8 [4.2M] flat",
    )
    # A4: gather f32
    timeit(
        scanned(lambda c, i: 1e-9 * jnp.sum(
            g(bin_f32, i + (c < -1).astype(jnp.int32)))),
        idx_flat, label="A4 gather f32 [4.2M] flat",
    )
    # A5: gather f32 with 2-D [R, K] idx
    timeit(
        scanned(lambda c, i: 1e-9 * jnp.sum(
            g(bin_f32, i + (c < -1).astype(jnp.int32)))),
        idx_fixed, label="A5 gather f32 [R,K] 2-D idx",
    )
    # A6: gather u32
    timeit(
        scanned(lambda c, i: 1e-9 * jnp.sum(
            g(bin_u32, i + (c < -1).astype(jnp.int32)))),
        idx_flat, label="A6 gather u32 [4.2M] flat",
    )

    # A7: full mask with f32 grid
    def mask_f32(c, o):
        fi, inside = idx_of(c, o)
        occ = g(bin_f32, fi.reshape(-1)).reshape(R, K)
        return 1e-9 * jnp.sum(jnp.where(inside, occ, 0.0))

    timeit(scanned(mask_f32), rays_o, label="A7 full mask, f32 grid")


if __name__ == "__main__":
    main()
