"""Trunk capacity sweep: quality + throughput per (layers, neurons).

The flagship trunk defaults to 3 hidden layers x 256 neurons — BIGGER
than the reference NGP's base MLP (2 x 128,
``scripts/config_102344250.yaml:17-18``). The depth-generic fused kernel
(r4) makes smaller trunks run fused too; this sweep measures what the
extra capacity buys on the quality anchors vs what it costs in step
time, to pick the production default on data.

Per config: (a) full mapper quality run (2000 steps, 640², same harness
as quality_headtohead) on the requested scene, (b) raw phase throughput
(25-step scan x4, scalar readback — bench.py methodology).

Run: python -u scripts/trunk_sweep.py [--scene fake|hard]
     [--configs 3x256,2x256,2x128,3x128]
One TPU job at a time (tpu-bench-discipline).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quality_headtohead import run_path  # noqa: E402

BASELINE = 20000 * 262144 / 269.0


def throughput(layers: int, neurons: int) -> float:
    """Raw flagship phase samples/s at production size for one trunk
    config (fresh process state; same methodology as bench.py)."""
    import jax
    import jax.numpy as jnp

    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = PipelineConfig(
        num_semantic_classes=29, n_ensembles=2, num_rays=2048,
        max_samples_train=128, max_images=8, img_w=640, img_h=640,
        spectral_layers=layers, spectral_neurons=neurons,
    )
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    rng = np.random.RandomState(0)
    ds.update_data(
        (rng.rand(4, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        rng.rand(4, cfg.img_h, cfg.img_w).astype(np.float32),
        rng.randint(0, 29, (4, cfg.img_h, cfg.img_w)),
        np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)),
    )
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state = state._replace(step=jnp.asarray(1000))
    phase = make_flagship_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)
    args = lambda k: (
        state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
        pools, counts, size, jax.random.split(k, 25),
        jnp.asarray(1e-3), jnp.asarray(False),
    )
    state, losses = phase(*args(jax.random.PRNGKey(1)))
    _ = float(jnp.sum(losses))  # compile + execute
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        state, losses = phase(*args(jax.random.PRNGKey(2 + i)))
        _ = float(jnp.sum(losses))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    return 2 * 2048 * 128 * 25 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="fake", choices=("fake", "hard"))
    ap.add_argument("--configs", default="3x256,2x256,2x128,3x128")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args()

    rows = []
    for item in args.configs.split(","):
        L, H = (int(v) for v in item.split("x"))
        print(f"== trunk {L}x{H} ==", flush=True)
        sps = throughput(L, H)
        print(f"   throughput {sps:.3e} samples/s ({sps/BASELINE:.3f}x)",
              flush=True)
        row = dict(cfg=item, sps=sps)
        if not args.skip_quality:
            q = run_path(
                "spectral", "prop", args.steps, 640, scene=args.scene,
                overrides=dict(spectral_layers=L, spectral_neurons=H),
            )
            row.update(psnr=q["psnr"], depth_mse=q["depth_mse"],
                       miou=q["miou"])
            print(
                f"   PSNR={q['psnr']:.2f} depthMSE={q['depth_mse']:.3f} "
                f"mIoU={q['miou']:.3f}", flush=True,
            )
        rows.append(row)

    print(f"\nscene={args.scene} steps={args.steps}")
    print("| trunk | samples/s | vs baseline | PSNR | depth MSE | mIoU |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        q = (
            f"{r.get('psnr', float('nan')):.2f} | "
            f"{r.get('depth_mse', float('nan')):.3f} | "
            f"{r.get('miou', float('nan')):.3f}"
        )
        print(f"| {r['cfg']} | {r['sps']:.3e} | {r['sps']/BASELINE:.3f} | {q} |")


if __name__ == "__main__":
    main()
