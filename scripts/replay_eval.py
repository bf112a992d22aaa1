"""Replay a recorded trajectory (reference ``data<k>.npz`` schema) through
the active-perception mapper and report quality on held-out recorded views.

The second, non-analytic quality anchor: point it at any recording made by
the reference pipeline (``habitat_to_data.py:164-173``) or by this
framework (``RayDataset.save``) and the full loop — init scan, ensemble
training, planning, flying, retraining — runs against the recorded frames
via ``sim/replay.ReplaySim`` (every supervised pose snaps to a recorded
camera). Held-out eval: every ``--holdout`` -th frame becomes a test view
and is never needed by training (the snap metric prefers the remaining
frames only if the planner never requests the exact held-out pose; for a
strict split, record train and test tours separately).

Usage:
  python scripts/replay_eval.py --npz path/to/data0.npz \
      [--steps 500] [--planning-steps 3] [--holdout 8] [--out runs/replay]

Prints one JSON line with PSNR / depth-MSE / sem-CE per eval and writes
the standard artifact layout under --out.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container's sitecustomize force-registers the axon TPU plugin;
    # honor an explicit CPU request (quality_headtohead.py does the same)
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--steps", type=int, default=500,
                    help="train steps per phase")
    ap.add_argument("--planning-steps", type=int, default=3)
    ap.add_argument("--init-samples", type=int, default=12)
    ap.add_argument("--holdout", type=int, default=8,
                    help="every k-th frame is a held-out test view")
    ap.add_argument("--out", default="runs/replay")
    ap.add_argument("--aabb", type=float, nargs=6, default=None,
                    help="scene aabb (x0 y0 z0 x1 y1 z1); estimated from "
                         "the recording when omitted")
    ap.add_argument("--num-rays", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=64)
    args = ap.parse_args()

    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.sim.replay import ReplaySim

    sim = ReplaySim(args.npz, nav_radius=2.0)
    n = len(sim.pose7s)
    test_idx = np.arange(0, n, max(args.holdout, 2))
    aabb = np.asarray(args.aabb) if args.aabb else sim.aabb_estimate()
    if args.aabb is None:
        print(
            "WARNING: no --aabb given — using an aabb ESTIMATED from the "
            "recorded camera frustums. Oversized estimates train well but "
            "have been observed to destabilize the final LR-restarted "
            "refit (docs/PERFORMANCE.md 'Replayed-trajectory anchor'; the "
            "mapper's divergence guard will roll back if that happens). "
            "Pass the scene aabb from the recording's YAML when available.",
            flush=True,
        )
    print(f"recording: {n} frames {sim.img_w}x{sim.img_h}, "
          f"{sim.num_semantic_classes} classes, aabb {np.round(aabb, 2)}")

    cfg = PipelineConfig(
        save_path=args.out,
        aabb=tuple(aabb),
        img_w=sim.img_w, img_h=sim.img_h,
        num_rays=args.num_rays,
        max_samples_train=args.samples,
        max_samples_test=args.samples,
        num_semantic_classes=sim.num_semantic_classes,
        planning_step=args.planning_steps,
        training_steps=args.steps,
        max_images=max(n + 64, 128),
        # held-out recorded cameras as the test grid (poses snap exactly)
        test_loc=tuple(tuple(sim.pose7s[i, :3]) for i in test_idx),
        test_quat=(tuple(sim.pose7s[test_idx[0], 3:]),),
        global_origin=tuple(sim.pose7s[0]),
    )
    m = ActiveNeRFMapper(cfg, sim, save_path=args.out, seed=9)
    m.initialization(initial_samples=args.init_samples)
    m.nerf_training(args.steps, initial_train=True, planning_step=-1)
    m._evaluate(planning_step=0)
    steps_done = m.planning(
        args.planning_steps, training_steps_per_step=args.steps
    )
    m._evaluate(planning_step=steps_done + 1)
    m.save_artifacts()

    errs = np.asarray(m.errors_hist, dtype=float)
    rows = [
        {"planning_step": r[0], "psnr": r[1], "depth_mse": r[2],
         "sem_ce": r[3]}
        for r in errs.tolist()
    ]
    print(json.dumps({
        "npz": args.npz, "frames": int(n),
        "held_out_views": int(len(test_idx)),
        "planning_steps_run": int(steps_done),
        "errors": rows,
    }))


if __name__ == "__main__":
    main()
