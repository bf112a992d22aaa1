"""Benchmark: ensemble training throughput of the flagship field at full
production size on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flagship = spectral field + proposal sampling (see models/spectral.py and
render/prop_renderer.py for the measured hardware rationale); the NGP
hash + occ-grid path remains available behind config knobs.

Metric: training samples/sec across the whole ensemble (2 members x
2048 rays x 128 samples = 524288 field samples per optimizer step — the
reference's 262144-samples-per-member budget, config_102344250.yaml:4).

Baseline: the reference stack's implied training throughput — nerfacc docs
report Instant-NGP + occ-grid at 20k steps x 2^18 samples in 269 s on a
TITAN RTX (perception/nerfacc/docs/source/examples/static/ngp.rst:40-42),
i.e. ~1.95e7 samples/s. vs_baseline = value / 1.95e7.

Timing notes (hard-won, see scripts/profile_honest2.py): on the axon
tunnel, `block_until_ready` can return without the program having
executed, so every measurement forces a scalar float() readback; steps
are batched in lax.scan chunks of <=10 (longer scans faulted the TPU in
round 1) so the ~30 ms per-call readback floor amortizes.
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
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", "25"))
N_CALLS = int(os.environ.get("BENCH_N_CALLS", "4"))


def main():
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

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

    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state = state._replace(step=jnp.asarray(1000))
    phase_fn = make_flagship_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, dtype=jnp.int32)
    thre = jnp.asarray(1e-3)
    bias = jnp.asarray(False)

    def run_chunk(state, key):
        keys = jax.random.split(key, STEPS_PER_CALL)
        state, losses = phase_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, thre, bias,
        )
        return state, losses

    # warmup / compile — force execution with a scalar readback
    state, loss = run_chunk(state, jax.random.PRNGKey(2))
    _ = float(jnp.sum(loss))

    t0 = time.perf_counter()
    for i in range(N_CALLS):
        state, loss = run_chunk(state, jax.random.PRNGKey(3 + i))
    # the float() synchronizes the LAST chunk; chunks are chained through
    # `state`, so all N_CALLS chunks must have executed before it returns
    assert np.isfinite(float(jnp.sum(loss)))
    dt = time.perf_counter() - t0

    n_steps = STEPS_PER_CALL * N_CALLS
    samples_per_step = cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train
    value = samples_per_step * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "flagship_ensemble_train_throughput",
                "value": round(value, 1),
                "unit": "samples/sec",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
