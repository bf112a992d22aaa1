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


def build_mapper(field_type, sampler_type, steps, img, seed=9, scene="fake",
                 tiny=False, overrides=None, save=None):
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
    if save is None:
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
    return mapper, cfg


def run_path(field_type, sampler_type, steps, img, seed=9, scene="fake",
             tiny=False, overrides=None):
    mapper, cfg = build_mapper(field_type, sampler_type, steps, img,
                               seed=seed, scene=scene, tiny=tiny,
                               overrides=overrides)
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


# ---------------------------------------------------------------------------
# Cross-process chained mode (VERDICT r4 "Next round" #1).
#
# The hash+occ path crashes this v5e part's worker probabilistically per
# scan chunk — single-process budget ~200 steps (docs/PERFORMANCE.md
# "occ-path TPU fault") — but the crash budget is PER-PROCESS and
# checkpoint/resume restores params+Adam+occ+step exactly. So the full
# 2000-step budget is run as a chain of short-lived subprocesses:
#
#   driver --chain 150  ->  [worker train 150 steps -> checkpoint] x N
#                            (cooldown + trivial-matmul health check after
#                             every crash; wedge-proof: the driver kills a
#                             worker that stops making progress)
#                        ->  [worker eval]  (retried the same way)
# ---------------------------------------------------------------------------


def _read_json(path):
    import json

    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def _write_json(path, obj):
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def worker_main(args):
    """One chain slice (train) or the final eval, in this process."""
    import jax  # noqa: F401

    mapper, cfg = build_mapper(
        args.worker_field, args.worker_sampler, args.steps, args.img,
        seed=args.seed, scene=args.scene, tiny=args.preset == "cpu-tiny",
        save=args.out,
    )
    state_path = os.path.join(args.out, "chain_state.json")
    st = _read_json(state_path) or {"done": 0, "train_s": 0.0, "losses": []}
    ckpt = os.path.join(args.out, "checkpoints")
    if st["done"] > 0:
        mapper.load_checkpoints(ckpt)
        assert int(mapper.state.step) == st["done"], (
            int(mapper.state.step), st["done"])

    until = args.until or args.steps
    if args.worker == "eval":
        # Per-view resumable eval: the hash path's total eval gather
        # volume (~27e9 rows at 16 views x 160^2 x 256 samples x 2
        # members) is ~4x the measured per-process crash budget
        # (docs/PERFORMANCE.md "occ-path TPU fault"), so one monolithic
        # _evaluate cannot survive. Render one test view per dispatch
        # (chunked further by APNERF_EVAL_RAY_CHUNK), persist each view
        # to disk, and skip views already rendered — a crashed eval
        # worker resumes where it left off, exactly like the train chain.
        import jax.numpy as jnp
        import numpy as np

        cfg_m = mapper.cfg
        oh = max(int(cfg_m.img_h * mapper.eval_scale), 1)
        ow = max(int(cfg_m.img_w * mapper.eval_scale), 1)
        rays = mapper._pose7_to_grid_rays(mapper._test_poses, oh, ow)
        vdir = os.path.join(args.out, f"eval_views_{st['done']}")
        os.makedirs(vdir, exist_ok=True)
        bkgd = jnp.ones(3)
        n_views = rays.origins.shape[0]
        for v in range(n_views):
            fp = os.path.join(vdir, f"view_{v:02d}.npz")
            if os.path.exists(fp):
                continue
            out_v = mapper._render_eval(
                mapper.state.params, mapper.state.occ,
                rays.origins[v : v + 1], rays.viewdirs[v : v + 1], bkgd,
            )
            arrs = {
                k: np.asarray(out_v[k])[:, 0]
                for k in ("rgb", "depth", "opacity", "sem")
            }
            tmp = fp + ".tmp.npz"
            np.savez(tmp, **arrs)
            os.replace(tmp, fp)
            print(f"   eval view {v + 1}/{n_views} done", flush=True)
        views = [
            np.load(os.path.join(vdir, f"view_{v:02d}.npz"))
            for v in range(n_views)
        ]
        out = {
            k: np.stack([vw[k] for vw in views], axis=1)
            for k in ("rgb", "depth", "opacity", "sem")
        }
        mapper._evaluate_finish(out, -1, oh, ow)
        _, p, dmse, ce = mapper.errors_hist[-1]
        _, lp, mi = mapper.metrics_ext_hist[-1]
        _write_json(os.path.join(args.out, "metrics.json"), dict(
            psnr=float(p), depth_mse=float(dmse), sem_ce=float(ce),
            lpips=float(lp), miou=float(mi), steps=st["done"],
            train_s=st["train_s"],
        ))
        print(f"   eval @ {st['done']} steps: PSNR={p:.2f} "
              f"depthMSE={dmse:.4f} semCE={ce:.3f} mIoU={mi:.3f}",
              flush=True)
        return

    target = min(st["done"] + args.chain, until)
    t0 = time.perf_counter()
    while st["done"] < target:
        sl = min(100, target - st["done"])
        losses = mapper.nerf_training(sl, initial_train=True, evaluate=False)
        st["done"] += sl
        st["losses"].append(round(float(losses[-1]), 4))
        print(f"   {st['done']}/{args.steps} loss={losses[-1]:.3f}",
              flush=True)
    st["train_s"] += time.perf_counter() - t0
    mapper.save_checkpoints()
    _write_json(state_path, st)


def _health_check(timeout_s=420):
    """Trivial matmul in a throwaway subprocess — returns True when the
    chip answers (the post-crash wedge protocol, docs/PERFORMANCE.md)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.ones((256, 256)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_path_chained(field_type, sampler_type, steps, img, chain, seed=9,
                     scene="fake", preset=None, out=None,
                     worker_timeout=None, until=0):
    """``until`` (0 = steps): train/eval milestone for THIS driver run —
    the worker still builds its mapper (and so the LR schedule) from the
    full ``steps`` budget, so staged invocations (--until 500, then 1000,
    then 2000 on the same --out) produce the identical trajectory to one
    uninterrupted run, with intermediate metrics at each stage."""
    import subprocess

    until = until or steps
    out = out or tempfile.mkdtemp(prefix=f"h2hchain_{field_type}_")
    os.makedirs(out, exist_ok=True)
    state_path = os.path.join(out, "chain_state.json")
    metrics_path = os.path.join(out, "metrics.json")
    # generous per-worker wall budget: occ steps ~6-8 s + init/ckpt/compile
    worker_timeout = worker_timeout or int(chain * 12 + 900)
    base = [
        sys.executable, "-u", os.path.abspath(__file__),
        "--img", str(img), "--steps", str(steps), "--scene", scene,
        "--chain", str(chain), "--out", out, "--until", str(until),
        "--worker-field", field_type, "--worker-sampler", sampler_type,
    ]
    if preset:
        base += ["--preset", preset]

    env = dict(os.environ)
    # persistent compile cache: every chain worker re-traces the same
    # phase program; without this each process pays the ~8 min remote
    # compile again (harmless no-op if the backend ignores it)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(out, "jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    def spawn(mode, seed_i):
        cmd = base + ["--worker", mode, "--seed", str(seed_i)]
        try:
            r = subprocess.run(cmd, timeout=worker_timeout, env=env)
            return r.returncode
        except subprocess.TimeoutExpired:
            print("   worker TIMED OUT (wedged tunnel?) — killed",
                  flush=True)
            return -9

    crashes = 0
    attempt = 0
    while True:
        st = _read_json(state_path) or {"done": 0, "train_s": 0.0}
        if st["done"] >= until:
            break
        attempt += 1
        print(f"-- chain worker {attempt}: steps {st['done']}->"
              f"{min(st['done'] + chain, steps)} (crashes so far:"
              f" {crashes})", flush=True)
        # fresh seed per worker: the key stream restarts in each process,
        # so reusing one seed would replay identical ray batches per slice
        rc = spawn("train", seed + attempt - 1)
        st2 = _read_json(state_path) or {"done": 0}
        if rc != 0 and st2["done"] == st["done"]:
            crashes += 1
            print(f"   worker crashed (rc={rc}); cooldown + health check",
                  flush=True)
            time.sleep(120)
            while not _health_check():
                print("   chip not answering; 120 s more", flush=True)
                time.sleep(120)
        elif rc != 0:
            # progress was checkpointed before the crash — brief cooldown
            crashes += 1
            time.sleep(30)
        if attempt > steps // max(chain, 1) * 6 + 20:
            raise RuntimeError("chain made no progress; giving up")

    # final eval, retried under the same protocol
    for _ in range(6):
        rc = spawn("eval", seed)
        m = _read_json(metrics_path)
        st = _read_json(state_path)
        # m["steps"] guards against a stale metrics.json from an earlier
        # --until stage in the same --out dir
        if rc == 0 and m is not None and m.get("steps") == st["done"]:
            sps = (st["done"] * 2 * 2048 * 128 / st["train_s"]
                   if preset != "cpu-tiny" and st["train_s"] else
                   float("nan"))
            return dict(
                path=f"{field_type}+{sampler_type}", psnr=m["psnr"],
                depth_mse=m["depth_mse"], sem_ce=m["sem_ce"],
                lpips=m["lpips"], miou=m["miou"], train_s=st["train_s"],
                samples_per_s=sps, chain_workers=attempt, crashes=crashes,
            )
        print("   eval crashed; cooldown + health check", flush=True)
        time.sleep(120)
        while not _health_check():
            time.sleep(120)
    raise RuntimeError("eval never completed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--chain", type=int, default=0,
                    help="run each path as a chain of fresh subprocesses "
                    "of this many steps with checkpoint-resume between "
                    "them (survives the per-process hash-gather crash "
                    "budget; docs/PERFORMANCE.md)")
    ap.add_argument("--out", default=None,
                    help="chain state dir (resumable across driver runs)")
    ap.add_argument("--until", type=int, default=0,
                    help="chain mode: train/eval milestone for THIS "
                    "driver run (0 = --steps). The LR schedule always "
                    "derives from --steps, so staged runs (--until 500, "
                    "then 1000, then 2000 on the same --out) reproduce "
                    "one uninterrupted run with intermediate metrics")
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument("--worker", default=None, choices=(None, "train",
                                                       "eval"))
    ap.add_argument("--worker-field", default=None)
    ap.add_argument("--worker-sampler", default=None)
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

    if args.worker:
        worker_main(args)
        return

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
            if args.chain:
                r = run_path_chained(
                    f, s, steps, args.img, args.chain, seed=args.seed,
                    scene=args.scene, preset=args.preset, out=args.out,
                    until=args.until,
                )
                if args.until and args.until != steps:
                    r["path"] = f"{r['path']}[{args.until}/{steps}sched]"
            else:
                r = run_path(f, s, steps, args.img, seed=args.seed,
                             scene=args.scene,
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
