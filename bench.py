"""Benchmark: ensemble training throughput of the flagship NGP semantic
field, full production size, on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: training samples/sec across the whole ensemble (2 members x
2048 rays x 128 samples = 524288 field samples per optimizer step, the
reference's 262144-samples-per-member budget, config_102344250.yaml:4).

Baseline: the reference stack's implied training throughput — nerfacc docs
report Instant-NGP + occ-grid at 20k steps x 2^18 samples in 269 s on a
TITAN RTX (perception/nerfacc/docs/source/examples/static/ngp.rst:40-42),
i.e. ~1.95e7 samples/s. vs_baseline = value / 1.95e7.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 20000 * 262144 / 269.0  # ≈ 1.95e7


def main():
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.train.step import init_ensemble, make_train_step

    cfg = PipelineConfig(
        # production scene 102344250 values
        num_semantic_classes=29,
        n_ensembles=2,
        num_rays=2048,
        max_samples_train=128,
        max_images=8,
        img_w=640,
        img_h=640,
    )

    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    rng = np.random.RandomState(0)
    n_img = 4
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    c2ws[:, :3, 3] = rng.uniform(-5, 0, (n_img, 3))
    ds.update_data(
        (rng.rand(n_img, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        (rng.rand(n_img, cfg.img_h, cfg.img_w) * 5).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (n_img, cfg.img_h, cfg.img_w)),
        c2ws,
    )

    from apnerf_tpu.train.phase import make_train_phase, pools_from_dataset

    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    # realistic mid-training occupancy: ~15% cells occupied; past warmup
    occ_bin = (
        jax.random.uniform(jax.random.PRNGKey(1), state.occ.binaries.shape) < 0.15
    )
    state = state._replace(
        occ=state.occ._replace(binaries=occ_bin), step=jnp.asarray(1000)
    )
    phase_fn = make_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, dtype=jnp.int32)
    thre = jnp.asarray(1e-3)
    bias = jnp.asarray(False)

    def run_chunk(state, key, n):
        keys = jax.random.split(key, n)
        return phase_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, thre, bias,
        )

    n_steps = 50
    # warmup / compile
    state, loss = run_chunk(state, jax.random.PRNGKey(2), n_steps)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    state, loss = run_chunk(state, jax.random.PRNGKey(3), n_steps)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    samples_per_step = cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train
    value = samples_per_step * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "ngp_ensemble_train_throughput",
                "value": round(value, 1),
                "unit": "samples/sec",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
