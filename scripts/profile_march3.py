"""Race full march_rays implementations end-to-end (single calls, no scan).

Variants of the occupancy-mask gather + compaction to find the fast
lowering. Each variant is checked for numerical agreement with the
current implementation before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.grid_march import (
    candidate_lattice,
    compact_mask,
    march_rays,
    ray_aabb_intersect,
)

R, K, S = 2048, 2048, 128


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
    t_mid = 0.5 * (t0v + t1v)

    def mask_base(o, d, b):
        t_min, t_max = ray_aabb_intersect(o, d, aabb)
        inside = (t_mid >= t_min[:, None]) & (t_mid <= t_max[:, None])
        flat_idx = jnp.zeros((R, K), dtype=jnp.int32)
        strides = (128 * 128, 128, 1)
        for dd in range(3):
            u = (o[:, dd:dd+1] + t_mid * d[:, dd:dd+1] - aabb[dd]) / (
                aabb[dd+3] - aabb[dd])
            inside = inside & (u >= 0.0) & (u < 1.0)
            i_d = jnp.clip((u * 128).astype(jnp.int32), 0, 127)
            flat_idx = flat_idx + i_d * strides[dd]
        return flat_idx, inside

    # reference output for agreement checks
    ref = jax.jit(
        lambda o, d, b: march_rays(o, d, b, aabb, lattice, S)
    )(rays_o, rays_d, binaries)
    ref_np = jax.tree.map(np.asarray, ref)

    timeit(
        jax.jit(lambda o, d, b: march_rays(o, d, b, aabb, lattice, S)),
        rays_o, rays_d, binaries, label="V0 current march_rays",
    )

    # V1: packed-bit gather (grid as [65536] uint32 words)
    packed = jnp.packbits(
        np.asarray(binaries).reshape(-1), bitorder="little"
    ).view(np.uint32) if False else None
    packed_np = np.packbits(
        np.asarray(binaries).reshape(-1), bitorder="little"
    )
    packed_u32 = jnp.asarray(packed_np.view(np.uint32))

    def march_packed(o, d, pk):
        flat_idx, inside = mask_base(o, d, None)
        word = jax.lax.optimization_barrier(flat_idx >> 5)
        w = jax.lax.optimization_barrier(pk[word])
        occ = ((w >> (flat_idx & 31).astype(jnp.uint32)) & 1).astype(bool)
        mask = inside & occ
        idx, valid = compact_mask(mask, S)
        ts = jnp.take_along_axis(jnp.broadcast_to(t0v, (R, K)), idx, axis=1)
        te = jnp.take_along_axis(jnp.broadcast_to(t1v, (R, K)), idx, axis=1)
        z = jnp.zeros_like(ts)
        return jnp.where(valid, ts, z), jnp.where(valid, te, z), valid

    out = jax.jit(march_packed)(rays_o, rays_d, packed_u32)
    np.testing.assert_allclose(np.asarray(out[0]), ref_np.t_starts, atol=0)
    timeit(jax.jit(march_packed), rays_o, rays_d, packed_u32,
           label="V1 packed-bit gather + bisect")

    # V2: matmul compaction instead of bisect (+ current gather)
    def march_matmul(o, d, b):
        flat_idx, inside = mask_base(o, d, None)
        fi = jax.lax.optimization_barrier(flat_idx)
        occ = jax.lax.optimization_barrier(b.reshape(-1)[fi])
        mask = inside & occ
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        dest = jnp.where(mask, csum - 1, S)
        onehot = (
            dest[:, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        tv = jnp.concatenate([t0v, t1v], axis=0).T  # [K, 2]
        outm = jnp.einsum("rks,kf->rsf", onehot, tv)
        n_kept = jnp.minimum(csum[:, -1], S)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (R, S), 1) < n_kept[:, None]
        )
        return outm[..., 0], outm[..., 1], valid

    out = jax.jit(march_matmul)(rays_o, rays_d, binaries)
    np.testing.assert_allclose(np.asarray(out[0]), ref_np.t_starts, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[2]), ref_np.valid)
    timeit(jax.jit(march_matmul), rays_o, rays_d, binaries,
           label="V2 flat gather + matmul compaction")

    # V3: packed gather + matmul compaction
    def march_packed_matmul(o, d, pk):
        flat_idx, inside = mask_base(o, d, None)
        word = jax.lax.optimization_barrier(flat_idx >> 5)
        w = jax.lax.optimization_barrier(pk[word])
        occ = ((w >> (flat_idx & 31).astype(jnp.uint32)) & 1).astype(bool)
        mask = inside & occ
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        dest = jnp.where(mask, csum - 1, S)
        onehot = (
            dest[:, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        tv = jnp.concatenate([t0v, t1v], axis=0).T
        outm = jnp.einsum("rks,kf->rsf", onehot, tv)
        n_kept = jnp.minimum(csum[:, -1], S)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (R, S), 1) < n_kept[:, None]
        )
        return outm[..., 0], outm[..., 1], valid

    out = jax.jit(march_packed_matmul)(rays_o, rays_d, packed_u32)
    np.testing.assert_allclose(np.asarray(out[0]), ref_np.t_starts, atol=1e-6)
    timeit(jax.jit(march_packed_matmul), rays_o, rays_d, packed_u32,
           label="V3 packed gather + matmul compaction")

    # V4: hash-style 3-D index shape [G, 8, N'] for the occ gather
    def march_3d_idx(o, d, b):
        flat_idx, inside = mask_base(o, d, None)
        fi3 = jax.lax.optimization_barrier(
            flat_idx.reshape(16, 8, (R * K) // 128)
        )
        occ = jax.lax.optimization_barrier(b.reshape(-1)[fi3])
        mask = inside & occ.reshape(R, K)
        idx, valid = compact_mask(mask, S)
        ts = jnp.take_along_axis(jnp.broadcast_to(t0v, (R, K)), idx, axis=1)
        te = jnp.take_along_axis(jnp.broadcast_to(t1v, (R, K)), idx, axis=1)
        z = jnp.zeros_like(ts)
        return jnp.where(valid, ts, z), jnp.where(valid, te, z), valid

    out = jax.jit(march_3d_idx)(rays_o, rays_d, binaries)
    np.testing.assert_allclose(np.asarray(out[0]), ref_np.t_starts, atol=0)
    timeit(jax.jit(march_3d_idx), rays_o, rays_d, binaries,
           label="V4 3-D-shaped idx gather + bisect")


if __name__ == "__main__":
    main()
