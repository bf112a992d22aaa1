"""On-device proof that the shard_map-wrapped fused Pallas phase compiles
and runs on the real TPU (VERDICT r4 "Next round" #6: the fused-kernel-
under-shard_map path was CPU-interpret-tested only).

Runs the SAME production-size workload as bench.py twice:
  plain     make_flagship_train_phase (the bench default, vmapped members)
  shardmap  make_shardmap_flagship_phase under a Mesh over the real
            device(s) — per-device Mosaic kernel + explicit pmean
            (a no-op collective on one chip, but the full shard_map
            lowering path: the thing being proven is that Mosaic
            compiles and executes inside shard_map on hardware)

and reports throughput + final loss for both. On a 1-chip axon tunnel
the mesh is (ens=1, data=1); on a multi-chip slice the same script
exercises the real collectives.

Run: python -u scripts/shardmap_onchip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS_PER_CALL = 25
N_CALLS = 3
AABB = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)


def main():
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.ops.rays import pose_matrix_from_quat
    from apnerf_tpu.parallel.mesh import make_mesh
    from apnerf_tpu.parallel.sharding import (
        make_shardmap_flagship_phase,
        place_training,
    )
    from apnerf_tpu.sim.fake import FakeSim
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = PipelineConfig(
        aabb=AABB, num_semantic_classes=29, n_ensembles=2,
        num_rays=2048, max_samples_train=128, max_images=64,
        img_w=640, img_h=640,
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

    def fresh_ds():
        ds = RayDataset(
            training=True, num_rays=cfg.num_rays,
            num_models=cfg.n_ensembles, width=cfg.img_w, height=cfg.img_h,
            max_images=cfg.max_images,
        )
        ds.update_data(
            np.asarray(images)[..., :3], np.asarray(depths),
            np.asarray(sems), np.array(mats),
        )
        return ds

    def run(mode):
        ds = fresh_ds()
        pools, counts = pools_from_dataset(ds)
        size = jnp.asarray(ds.size, jnp.int32)
        thre = jnp.asarray(1e-3)
        bias = jnp.asarray(False)
        state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
        state = state._replace(step=jnp.asarray(1000))

        if mode == "shardmap":
            mesh = make_mesh(n_ens=min(2, len(jax.devices())))
            print(f"mesh: {dict(mesh.shape)} over "
                  f"{[str(d) for d in mesh.devices.flat]}", flush=True)
            state, ds = place_training(state, ds, mesh)
            phase_fn = make_shardmap_flagship_phase(cfg, mesh)
            ctx = jax.set_mesh(mesh)
        else:
            phase_fn = make_flagship_train_phase(cfg)
            import contextlib

            ctx = contextlib.nullcontext()

        with ctx:
            def chunk(state, key):
                keys = jax.random.split(key, STEPS_PER_CALL)
                return phase_fn(
                    state, ds.images, ds.depths, ds.semantics,
                    ds.camtoworlds, ds.K, pools, counts, size, keys,
                    thre, bias,
                )

            state, loss = chunk(state, jax.random.PRNGKey(2))
            _ = float(jnp.sum(loss))  # force compile+execute
            t0 = time.perf_counter()
            for i in range(N_CALLS):
                state, loss = chunk(state, jax.random.PRNGKey(3 + i))
            final = float(jnp.mean(loss[-5:]))
            dt = time.perf_counter() - t0
        assert np.isfinite(final), (mode, final)
        sps = (cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train
               * STEPS_PER_CALL * N_CALLS / dt)
        print(f"{mode:9s} {sps:.3e} samples/s  final_loss={final:.4f}",
              flush=True)
        return sps, final

    print(f"backend={jax.default_backend()} devices={jax.device_count()}",
          flush=True)
    sps_p, loss_p = run("plain")
    sps_s, loss_s = run("shardmap")
    print(f"shardmap/plain throughput ratio: {sps_s / sps_p:.3f}; "
          f"loss delta {abs(loss_s - loss_p):.4f}", flush=True)


if __name__ == "__main__":
    main()
