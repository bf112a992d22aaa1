"""Occ-path (NGP hash + occupancy-lattice) training throughput at
production size — the parity-fallback bench row (VERDICT r3 #3).

Same harness shape as bench.py (scan chunks, scalar readback, FakeSim
scan data) but driving the reference-parity path: hash-grid field +
lattice march + in-scan occ EMA, with the 5-step chunk cap the fault
bisect mandates (docs/PERFORMANCE.md "occ-path TPU fault": >=10-step
scans containing the hash field crash the v5e worker).

Run:  python -u scripts/bench_occ.py        (one TPU job at a time!)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 20000 * 262144 / 269.0  # ≈ 1.95e7 (bench.py)
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", "5"))
N_CALLS = int(os.environ.get("BENCH_N_CALLS", "8"))
AABB = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)


def main():
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.ops.rays import pose_matrix_from_quat
    from apnerf_tpu.sim.fake import FakeSim
    from apnerf_tpu.train.phase import make_train_phase, pools_from_dataset
    from apnerf_tpu.train.step import init_ensemble

    cfg = PipelineConfig(
        aabb=AABB, num_semantic_classes=29, n_ensembles=2, num_rays=2048,
        max_samples_train=128, max_images=64, img_w=640, img_h=640,
        field_type="ngp", sampler_type="occ",
    )

    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    rng = np.random.RandomState(0)
    center = np.array([-4.0, 1.5, -4.0])
    poses, mats = [], []
    for i in range(39):
        ang = np.deg2rad(9.0 * i)
        pos = center + rng.uniform(-0.2, 0.2, 3)
        quat = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)])
        poses.append(np.concatenate([pos, quat]))
        mats.append(pose_matrix_from_quat(pos, quat))
    images, depths, sems = sim.sample_images_from_poses(poses)
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    ds.update_data(
        np.asarray(images)[..., :3], np.asarray(depths), np.asarray(sems),
        np.array(mats),
    )

    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    state = state._replace(step=jnp.asarray(1000))
    phase_fn = make_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, dtype=jnp.int32)
    thre = jnp.asarray(1e-3)
    bias = jnp.asarray(False)

    def run_chunk(state, key):
        keys = jax.random.split(key, STEPS_PER_CALL)
        return phase_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, thre, bias,
        )

    t_c = time.perf_counter()
    state, loss = run_chunk(state, jax.random.PRNGKey(2))
    _ = float(jnp.sum(loss))
    print(f"compile+warmup {time.perf_counter() - t_c:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(N_CALLS):
        state, loss = run_chunk(state, jax.random.PRNGKey(3 + i))
    final_loss = float(jnp.mean(loss))
    assert np.isfinite(final_loss)
    dt = time.perf_counter() - t0

    n_steps = STEPS_PER_CALL * N_CALLS
    samples_per_step = cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train
    value = samples_per_step * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "occ_path_ensemble_train_throughput",
                "value": round(value, 1),
                "unit": "samples/sec",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 4),
                "steps_per_call": STEPS_PER_CALL,
                "final_loss": round(final_loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
