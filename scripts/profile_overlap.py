"""A/B the overlapped planning loop (VERDICT r3 #4).

Runs the SAME FakeSim active-perception configuration twice through
ActiveNeRFMapper.planning — once with ``overlap_planning=True`` (train
phases dispatch async; next step's sample_traj/Dijkstra/MinSnap/SE3 and
the viz/eval readbacks overlap device training) and once with the r3
serial alternation — and reports per-planning-step wall-clock.

One TPU job at a time (tpu-bench-discipline). Run:
    python -u scripts/profile_overlap.py [--train-steps 500] [--plan-steps 3]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

AABB = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)


def run_mode(overlap: bool, train_steps: int, plan_steps: int, img: int,
             save_viz: bool, seed: int = 9):
    import jax

    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.sim.fake import FakeSim

    sim = FakeSim(aabb=AABB, img_w=img, img_h=img)
    center = [-4.0, 1.5, -4.0]
    cfg = PipelineConfig(
        aabb=AABB,
        num_semantic_classes=sim.num_semantic_classes,
        n_ensembles=2, num_rays=2048,
        max_samples_train=128, max_samples_test=256,
        max_images=256, img_w=img, img_h=img,
        training_steps=train_steps,
        planning_step=plan_steps,
        num_traj=20, sample_disc=30,
        global_origin=tuple(center) + (0.0, 0.0, 0.0, 1.0),
        test_loc=((center[0] + 0.3, center[1], center[2] - 0.4),
                  (center[0] - 0.5, center[1], center[2] + 0.2)),
        test_quat=((0.0, 0.0, 0.0, 1.0),
                   (0.0, float(np.sin(1.05)), 0.0, float(np.cos(1.05)))),
    )
    save = tempfile.mkdtemp(prefix=f"ovl_{int(overlap)}_")
    m = ActiveNeRFMapper(cfg, sim, save_path=save, seed=seed,
                         checkpoint_every=10**9)
    m.overlap_planning = overlap
    m.save_viz = save_viz
    m.initialization()
    m.nerf_training(train_steps, initial_train=True, planning_step=-1)
    t0 = time.perf_counter()
    done = m.planning(plan_steps, train_steps)
    dt = time.perf_counter() - t0
    return dict(
        mode="overlap" if overlap else "serial",
        planning_steps=done,
        total_s=dt,
        per_step_s=dt / max(done, 1),
        errors=m.errors_hist,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=500)
    ap.add_argument("--plan-steps", type=int, default=3)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--no-viz", action="store_true")
    args = ap.parse_args()

    rows = []
    for overlap in (False, True):
        print(f"== {'overlap' if overlap else 'serial'} ==", flush=True)
        r = run_mode(overlap, args.train_steps, args.plan_steps, args.img,
                     save_viz=not args.no_viz)
        rows.append(r)
        print(
            f"{r['mode']:8s} {r['planning_steps']} steps in "
            f"{r['total_s']:.1f}s → {r['per_step_s']:.1f}s/step",
            flush=True,
        )

    a, b = rows
    print(
        f"\n| mode | planning steps | total s | s/step |\n|---|---|---|---|\n"
        f"| serial | {a['planning_steps']} | {a['total_s']:.1f} | {a['per_step_s']:.1f} |\n"
        f"| overlap | {b['planning_steps']} | {b['total_s']:.1f} | {b['per_step_s']:.1f} |\n"
        f"\nspeedup: {a['per_step_s'] / b['per_step_s']:.2f}x per planning step"
    )


if __name__ == "__main__":
    main()
