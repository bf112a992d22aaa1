"""Microbenchmark the flagship train-step's component ops on real hardware.

Run: python -u scripts/profile_step.py [--full]
Prints per-op wall times. Used to direct Pallas kernel work (VERDICT r1 #1).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2, label=""):
    t_compile = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:45s} {dt*1e3:10.3f} ms   (compile+warmup {t_compile:.1f}s)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    from apnerf_tpu.ops.hashgrid import HashGridConfig, hash_encode, init_hash_table

    print("devices:", jax.devices())

    N = 262144  # 2048 rays x 128 samples
    cfg = HashGridConfig()  # 16 levels, 4 feat, 2^19
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    # --- raw scatter-add microbench (the backward of the table gather) ---
    T = cfg.table_size
    idx = jax.random.randint(jax.random.PRNGKey(2), (N * 8,), 0, T)
    vals = jax.random.normal(jax.random.PRNGKey(3), (N * 8, 4))

    @jax.jit
    def scatter_add(idx, vals):
        return jnp.zeros((T, 4)).at[idx].add(vals)

    timeit(scatter_add, idx, vals, label="scatter_add [2.1M -> 524K, F=4]")

    @jax.jit
    def seg_sum(idx, vals):
        return jax.ops.segment_sum(vals, idx, num_segments=T)

    timeit(seg_sum, idx, vals, label="segment_sum [2.1M -> 524K, F=4]")

    # --- raw gather microbench ---
    tbl0 = table[0]

    @jax.jit
    def gather(idx):
        return tbl0[idx]

    timeit(gather, idx, label="gather [2.1M rows of F=4]")

    # --- hash_encode forward ---
    enc = jax.jit(lambda t, x: hash_encode(t, x, cfg))
    timeit(enc, table, x, label="hash_encode fwd [262144, 16 lvl]")

    # --- hash_encode fwd+bwd ---
    @jax.jit
    def enc_grad(t, x):
        return jax.grad(lambda t: hash_encode(t, x, cfg).sum())(t)

    timeit(enc_grad, table, x, label="hash_encode fwd+bwd")

    # --- march_rays ---
    from apnerf_tpu.ops.grid_march import candidate_lattice, march_rays
    from apnerf_tpu.ops.occupancy import init_occ_grid

    R, S = 2048, 128
    aabb = (-5.0, -5.0, -5.0, 5.0, 5.0, 5.0)
    occ = init_occ_grid(aabb, (128, 128, 128))
    print("grid shape:", occ.binaries.shape)
    occ = occ._replace(
        binaries=jax.random.uniform(jax.random.PRNGKey(4), occ.binaries.shape) < 0.15
    )
    lattice = jnp.asarray(candidate_lattice(2048, 0.1, 1e-3, 0.004))
    rays_o = jax.random.uniform(jax.random.PRNGKey(5), (R, 3), minval=-4, maxval=4)
    rays_d = jax.random.normal(jax.random.PRNGKey(6), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    march = jax.jit(
        lambda o, d, b: march_rays(o, d, b, occ.aabb, lattice, S)
    )
    timeit(march, rays_o, rays_d, occ.binaries, label=f"march_rays [{R} x {lattice.shape[0]-1} -> {S}]")

    # --- MLP-only fwd+bwd at N samples (MXU sanity) ---
    from apnerf_tpu.models.nn import apply_mlp, init_mlp

    mlp = init_mlp(jax.random.PRNGKey(7), [64, 128, 128, 16])
    feats = jax.random.normal(jax.random.PRNGKey(8), (N, 64))

    @jax.jit
    def mlp_grad(p, f):
        return jax.grad(lambda p: apply_mlp(p, f).sum())(p)

    timeit(mlp_grad, mlp, feats, label="base MLP fwd+bwd [262144 x 64-128-128-16]")

    if not args.full:
        return

    # --- full member step (production size), single member ---
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.train.step import init_ensemble, make_train_step

    pcfg = PipelineConfig(
        num_semantic_classes=29, n_ensembles=2, num_rays=2048,
        max_samples_train=128, max_images=8, img_w=640, img_h=640,
    )
    ds = RayDataset(
        training=True, num_rays=pcfg.num_rays, num_models=pcfg.n_ensembles,
        width=pcfg.img_w, height=pcfg.img_h, max_images=pcfg.max_images,
    )
    rng = np.random.RandomState(0)
    n_img = 4
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    c2ws[:, :3, 3] = rng.uniform(-5, 0, (n_img, 3))
    ds.update_data(
        (rng.rand(n_img, pcfg.img_h, pcfg.img_w, 3) * 255).astype(np.uint8),
        (rng.rand(n_img, pcfg.img_h, pcfg.img_w) * 5).astype(np.float32),
        rng.randint(0, pcfg.num_semantic_classes, (n_img, pcfg.img_h, pcfg.img_w)),
        c2ws,
    )
    state = init_ensemble(jax.random.PRNGKey(0), pcfg)
    occ_bin = (
        jax.random.uniform(jax.random.PRNGKey(1), state.occ.binaries.shape) < 0.15
    )
    state = state._replace(
        occ=state.occ._replace(binaries=occ_bin), step=jnp.asarray(1000)
    )
    step_fn = make_train_step(pcfg)
    out = None

    def one(state):
        return step_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            jnp.asarray([0, 1]), jax.random.PRNGKey(9), jnp.asarray(1e-3),
        )

    timeit(one, state, n=3, warmup=1, label="FULL train step (2 members, prod size)")


if __name__ == "__main__":
    main()
