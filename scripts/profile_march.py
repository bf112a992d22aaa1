"""Stage-by-stage march_rays cost on the TPU. Each stage runs inside a
10-iter lax.scan with a carry-dependence so XLA cannot hoist it."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.grid_march import candidate_lattice, ray_aabb_intersect

R, K, S = 2048, 2048, 128


def timeit(fn, *args, n=5, warmup=1, label=""):
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
    binaries = (
        jax.random.uniform(jax.random.PRNGKey(4), (128, 128, 128)) < 0.15
    )
    lattice = jnp.asarray(candidate_lattice(K, 0.1, 1e-3, 0.004))
    rays_o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3), minval=-4, maxval=4)
    rays_d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t0v = lattice[:-1][None, :]
    t1v = lattice[1:][None, :]
    t_mid_base = 0.5 * (t0v + t1v)

    def mask_of(c, o):
        o = o + c * 1e-7
        t_min, t_max = ray_aabb_intersect(o, rays_d, aabb)
        t_mid = t_mid_base
        inside = (t_mid >= t_min[:, None]) & (t_mid <= t_max[:, None])
        flat_idx = jnp.zeros((R, K), dtype=jnp.int32)
        strides = (128 * 128, 128, 1)
        for d in range(3):
            u_d = (o[:, d:d+1] + t_mid * rays_d[:, d:d+1] - aabb[d]) / (
                aabb[d+3] - aabb[d])
            inside = inside & (u_d >= 0.0) & (u_d < 1.0)
            i_d = jnp.clip((u_d * 128).astype(jnp.int32), 0, 127)
            flat_idx = flat_idx + i_d * strides[d]
        idx_b = jax.lax.optimization_barrier(flat_idx.reshape(-1))
        occ = jax.lax.optimization_barrier(binaries.reshape(-1)[idx_b])
        return inside & occ.reshape(R, K)

    # stage A: mask computation (aabb + per-axis idx + gather)
    timeit(
        scanned(lambda c, o: 1e-9 * jnp.sum(mask_of(c, o))),
        rays_o, label="A mask (aabb+idx+occ gather)",
    )

    mask_fixed = np.asarray(jax.jit(lambda o: mask_of(jnp.float32(0), o))(rays_o))
    mask_j = jnp.asarray(mask_fixed)

    # stage B: cumsum along lanes
    timeit(
        scanned(lambda c, m: 1e-9 * jnp.sum(
            jnp.cumsum((m & (c < 1e9)).astype(jnp.int32), axis=1))),
        mask_j, label="B cumsum axis=1 (lanes) [R,K]",
    )

    # stage B2: cumsum along sublanes (transposed layout)
    mask_t = mask_j.T
    timeit(
        scanned(lambda c, m: 1e-9 * jnp.sum(
            jnp.cumsum((m & (c < 1e9)).astype(jnp.int32), axis=0))),
        mask_t, label="B2 cumsum axis=0 (sublanes) [K,R]",
    )

    csum = jnp.cumsum(mask_j.astype(jnp.int32), axis=1)

    # stage C: unrolled binary search (11 rounds of take_along_axis)
    def bisect(c, csum):
        csum = csum + (c < -1).astype(jnp.int32)
        targets = jnp.broadcast_to(
            jnp.arange(1, S + 1, dtype=jnp.int32)[None, :], (R, S))
        lo = jnp.zeros((R, S), dtype=jnp.int32)
        hi = jnp.full((R, S), K - 1, dtype=jnp.int32)
        for _ in range(11):
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(csum, mid, axis=1)
            ge = v >= targets
            lo = jnp.where(ge, lo, mid + 1)
            hi = jnp.where(ge, mid, hi)
        return 1e-9 * jnp.sum(lo)

    timeit(scanned(bisect), csum, label="C unrolled bisect (11x take_along)")

    # stage D: matmul compaction — one-hot(dest) @ [t0,t1]
    def matmul_compact(c, m):
        m = m & (c < 1e9)
        dest = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1  # [R, K]
        dest = jnp.where(m, dest, S)  # masked-out -> out of range
        onehot = (
            dest[:, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)  # [R, K, S]
        tv = jnp.concatenate([t0v, t1v], axis=0).T  # [K, 2]
        out = jnp.einsum("rks,kf->rsf", onehot, tv)
        return 1e-9 * jnp.sum(out)

    timeit(scanned(matmul_compact), mask_j, n=3,
           label="D matmul compaction (cumsum+onehot@t)")

    # stage E: final take_along_axis x2 with given idx
    idx = jnp.clip(
        jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None] * 7, (R, S)),
        0, K - 1,
    )

    def final_take(c, idx):
        idx = jnp.clip(idx + (c < -1).astype(jnp.int32), 0, K - 1)
        a = jnp.take_along_axis(jnp.broadcast_to(t0v, (R, K)), idx, axis=1)
        b = jnp.take_along_axis(jnp.broadcast_to(t1v, (R, K)), idx, axis=1)
        return 1e-9 * (jnp.sum(a) + jnp.sum(b))

    timeit(scanned(final_take), idx, label="E final take_along_axis x2")


if __name__ == "__main__":
    main()
