"""Capture a jax.profiler trace of the production flagship chunk and
print the top device ops by total self-time.

Run: python -u scripts/profile_trace.py [--steps 25] [--out /tmp/trace]
Parses the .xplane.pb with the tensorflow tsl proto (no tensorboard UI
needed on this box).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    )
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    rng = np.random.RandomState(0)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    c2ws[:, :3, 3] = rng.uniform(-5, 0, (4, 3))
    ds.update_data(
        (rng.rand(4, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        (rng.rand(4, cfg.img_h, cfg.img_w) * 5).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (4, cfg.img_h, cfg.img_w)),
        c2ws,
    )
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state = state._replace(step=jnp.asarray(1000))
    phase_fn = make_flagship_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)

    def run(state, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), steps)
        state, losses = phase_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False),
        )
        return state, losses

    state, losses = run(state, 2)  # compile
    _ = float(jnp.sum(losses))
    with jax.profiler.trace(out_dir):
        state, losses = run(state, 3)
        _ = float(jnp.sum(losses))
    print("trace captured to", out_dir, flush=True)


def report(out_dir, steps, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane.pb under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        total_by_op = defaultdict(int)
        count_by_op = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name \
                    and line.name != "Steps":
                # keep only the op-level line if present; fall back to all
                pass
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                total_by_op[(line.name, name)] += ev.duration_ps
                count_by_op[(line.name, name)] += 1
        if not total_by_op:
            continue
        print(f"\n=== plane: {plane.name} ===")
        by_line = defaultdict(lambda: defaultdict(int))
        for (ln, op), d in total_by_op.items():
            by_line[ln][op] += d
        for ln, ops in by_line.items():
            tot = sum(ops.values())
            print(f"\n-- line: {ln} (total {tot/1e12*1e3:.2f} ms) --")
            for op, d in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
                n = count_by_op[(ln, op)]
                print(
                    f"  {d/1e12*1e3:9.3f} ms  {d/1e12*1e3/steps:8.4f} ms/step"
                    f"  x{n:5d}  {op[:110]}"
                )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="/tmp/apnerf_trace")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.report_only:
        capture(args.out, args.steps)
    report(args.out, args.steps, args.top)
