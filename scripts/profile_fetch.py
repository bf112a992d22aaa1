"""Honest A/B of the training pixel fetch: two-step (image copy + 2-D
pixel gather, the shipping path) vs barrier-fenced flat gather from the
whole pool.

The r4 trace shows the two-step path's u8 image copy costing ~0.24
ms/step ([2,1,640,640,3] relayout copy). A fused 3-D gather measured ~1
ms/step SLOWER earlier (fusion scalarization) — but that probe did NOT
fence the index arithmetic with optimization_barrier, which
docs/PERFORMANCE.md identifies as the fix. This measures the fenced
variant. Methodology: scanned loop, carry-dependent, scalar readback
(docs/PERFORMANCE.md "Measurement methodology").

Run (alone on the chip): python -u scripts/profile_fetch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

I, H, W = 8, 640, 640
NUM_RAYS = 2048
MEMBERS = 2
STEPS = 50


def two_step(images, depths, semantics, image_idx, x, y):
    img = jax.lax.dynamic_index_in_dim(images, image_idx, keepdims=False)
    dep = jax.lax.dynamic_index_in_dim(depths, image_idx, keepdims=False)
    sem = jax.lax.dynamic_index_in_dim(semantics, image_idx, keepdims=False)
    return (
        img[y, x].astype(jnp.float32) / 255.0,
        dep[y, x],
        sem[y, x],
    )


def flat_fenced(images, depths, semantics, image_idx, x, y):
    flat = image_idx * (H * W) + y * W + x
    (flat,) = jax.lax.optimization_barrier((flat,))
    rgb = jnp.take(images.reshape(-1, 3), flat, axis=0)
    dep = jnp.take(depths.reshape(-1), flat, axis=0)
    sem = jnp.take(semantics.reshape(-1), flat, axis=0)
    (rgb, dep, sem) = jax.lax.optimization_barrier((rgb, dep, sem))
    return rgb.astype(jnp.float32) / 255.0, dep, sem


def bench(fn, label):
    key = jax.random.PRNGKey(0)
    images = jax.device_put(
        np.random.randint(0, 255, (I, H, W, 3), dtype=np.uint8)
    )
    depths = jax.device_put(np.random.rand(I, H, W).astype(np.float32))
    semantics = jax.device_put(
        np.random.randint(0, 29, (I, H, W)).astype(np.int32)
    )

    def body(c, k):
        kx, ky, ki = jax.random.split(k, 3)
        x = jax.random.randint(kx, (MEMBERS, NUM_RAYS), 0, W)
        y = jax.random.randint(ky, (MEMBERS, NUM_RAYS), 0, H)
        idx = jax.random.randint(ki, (MEMBERS,), 0, I)
        rgb, dep, sem = jax.vmap(
            lambda ii, xx, yy: fn(images, depths, semantics, ii, xx, yy)
        )(idx, x, y)
        return c + rgb.sum() + dep.sum() + sem.sum(), ()

    @jax.jit
    def run(keys):
        c, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return c

    keys = jax.random.split(key, STEPS)
    float(run(keys))  # compile + warm
    t0 = time.perf_counter()
    reps = 5
    for r in range(reps):
        out = float(run(jax.random.split(jax.random.PRNGKey(r + 1), STEPS)))
    dt = (time.perf_counter() - t0) / (reps * STEPS)
    print(f"{label}: {dt * 1e3:.4f} ms/step (readback {out:.1f})")
    return dt


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    a = bench(two_step, "two-step (shipping)")
    b = bench(flat_fenced, "flat fenced gather")
    print(f"flat/two-step: {b / a:.3f}x")
