"""Head-to-head quality: spectral+prop flagship vs NGP-hash+occ parity
path, same FakeSim scene, same 39-view initial scan, same step budget —
the two paths driven through the SAME ActiveNeRFMapper code (so sampling,
eval, metrics are shared; only field+sampler differ).

Addresses VERDICT r2 "What's missing" #1: the r2 quality anchor swept only
spectral configs against each other; this anchors the flagship against the
reference's own architecture (hash grid + occ marching) at equal budget.

Run: python -u scripts/quality_headtohead.py [--steps 2000] [--img 640]
Output: one line per path with PSNR / depth-MSE / sem-CE / LPIPS / mIoU /
train wall-clock, plus a markdown table for docs/PERFORMANCE.md.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container's sitecustomize force-registers the axon TPU plugin,
    # overriding the env var — pin it back (verify SKILL.md gotcha)
    import jax

    jax.config.update("jax_platforms", "cpu")

AABB = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)


def run_path(field_type, sampler_type, steps, img, seed=9, scene="fake",
             tiny=False, overrides=None):
    import jax

    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.sim.fake import FakeSim, hard_room

    boxes = hard_room(aabb=AABB) if scene == "hard" else None
    sim = FakeSim(aabb=AABB, img_w=img, img_h=img, boxes=boxes)
    center = [-4.0, 1.5, -4.0]
    # 4 held-out test poses x 4 yaws (the mapper's test grid)
    test_loc = [
        [center[0] + dx, center[1], center[2] + dz]
        for dx, dz in ((0.3, -0.4), (-0.5, 0.2), (0.8, 0.6), (-0.2, -0.9))
    ]
    test_quat = [
        [0.0, float(np.sin(a / 2)), 0.0, float(np.cos(a / 2))]
        for a in (0.7, 2.1, 3.9, 5.2)
    ]
    shrink = dict(
        num_rays=256, max_samples_train=32, max_samples_test=64,
        spectral_neurons=64, main_neurons=64, log2_hashmap_size=15,
    ) if tiny else dict(num_rays=2048, max_samples_train=128,
                        max_samples_test=256)
    cfg = PipelineConfig(
        aabb=AABB,
        num_semantic_classes=sim.num_semantic_classes,
        n_ensembles=2,
        max_images=64, img_w=img, img_h=img,
        training_steps=steps,
        field_type=field_type, sampler_type=sampler_type,
        global_origin=tuple(center) + (0.0, 0.0, 0.0, 1.0),
        test_loc=tuple(tuple(l) for l in test_loc),
        test_quat=tuple(tuple(q) for q in test_quat),
        **shrink,
        **(overrides or {}),
    )
    save = tempfile.mkdtemp(prefix=f"h2h_{field_type}_")
    mapper = ActiveNeRFMapper(
        cfg, sim, save_path=save, seed=seed,
        # no mid-train checkpoints: each save fetches the full ensemble
        # state through the tunnel (hash path: ~0.8 GB) for nothing the
        # head-to-head needs
        checkpoint_every=10**9,
    )
    mapper.save_viz = False
    mapper.initialization()
    t0 = time.perf_counter()
    # train in 100-step slices: each nerf_training call converts its
    # losses (device sync), so a TPU worker crash mid-run surfaces as an
    # exception within ~100 steps instead of a silent infinite hang (the
    # hash path crashes this v5e probabilistically per chunk —
    # docs/PERFORMANCE.md "occ-path TPU fault")
    done = 0
    while done < steps:
        sl = min(100, steps - done)
        losses = mapper.nerf_training(sl, initial_train=True, evaluate=False)
        done += sl
        print(
            f"   {done}/{steps} loss={losses[-1]:.3f} "
            f"({time.perf_counter() - t0:.0f}s)", flush=True,
        )
    dt = time.perf_counter() - t0
    mapper._evaluate(-1)
    _, p, dmse, ce = mapper.errors_hist[-1]
    _, lp, mi = mapper.metrics_ext_hist[-1]
    sps = steps * cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train / dt
    return dict(
        path=f"{field_type}+{sampler_type}", psnr=p, depth_mse=dmse,
        sem_ce=ce, lpips=lp, miou=mi, train_s=dt, samples_per_s=sps,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument(
        "--paths", default="spectral+prop,ngp+occ",
        help="comma-separated field+sampler pairs",
    )
    ap.add_argument(
        "--scene", default="fake", choices=("fake", "hard"),
        help="fake = smooth analytic room; hard = dense textured clutter "
        "(sim/fake.py hard_room — the anchor that is NOT kind to a "
        "global Fourier field)",
    )
    ap.add_argument(
        "--preset", default=None, choices=(None, "cpu-tiny"),
        help="cpu-tiny: 200 steps at 128px — the ONLY configuration that "
        "finishes in minutes on CPU; the defaults are TPU-sized and "
        "would take hours off-chip",
    )
    args = ap.parse_args()
    if args.preset == "cpu-tiny":
        args.steps, args.img = 200, 128

    import jax

    if (
        jax.default_backend() != "tpu"
        and args.preset != "cpu-tiny"
        and args.steps * args.img >= 2000 * 640
    ):
        print(
            "WARNING: TPU-sized defaults on a non-TPU backend — this run "
            "will take HOURS. Use --preset cpu-tiny for a smoke run.",
            file=sys.stderr, flush=True,
        )

    rows = []
    for pair in args.paths.split(","):
        # optional per-path step budget: "ngp+occ:500" (the hash path
        # crashes this v5e probabilistically per scan chunk, so its
        # surviving budget is shorter — docs/PERFORMANCE.md)
        steps = args.steps
        if ":" in pair:
            pair, s_override = pair.split(":")
            steps = int(s_override)
        f, s = pair.split("+")
        print(
            f"== {pair} ({steps} steps, scene={args.scene}) ==",
            flush=True,
        )
        try:
            r = run_path(f, s, steps, args.img, scene=args.scene,
                         tiny=args.preset == "cpu-tiny")
        except Exception as e:  # surface worker crashes as a table row
            print(f"   CRASHED: {type(e).__name__}: {e}", flush=True)
            r = dict(path=f"{f}+{s}@{steps}", psnr=float("nan"),
                     depth_mse=float("nan"), sem_ce=float("nan"),
                     lpips=float("nan"), miou=float("nan"),
                     train_s=float("nan"), samples_per_s=float("nan"))
            rows.append(r)
            continue
        r["path"] = f"{r['path']}@{steps}"
        rows.append(r)
        print(
            f"{r['path']:16s} PSNR={r['psnr']:6.2f} depthMSE={r['depth_mse']:7.4f} "
            f"semCE={r['sem_ce']:6.3f} LPIPS={r['lpips']:5.3f} mIoU={r['miou']:5.3f} "
            f"train={r['train_s']:.0f}s ({r['samples_per_s']:.2e} samp/s)",
            flush=True,
        )

    print(
        f"\nscene={args.scene} steps={args.steps} img={args.img}^2\n"
        "| path | PSNR | depth MSE | sem CE | LPIPS | mIoU | train s | samples/s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['path']} | {r['psnr']:.2f} | {r['depth_mse']:.4f} | "
            f"{r['sem_ce']:.3f} | {r['lpips']:.3f} | {r['miou']:.3f} | "
            f"{r['train_s']:.0f} | {r['samples_per_s']:.2e} |"
        )


if __name__ == "__main__":
    main()
