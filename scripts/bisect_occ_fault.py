"""Bisect the NGP+occ-path TPU fault: long lax.scan chunks of the
hash+lattice train step fault the v5e (r1/r2: >5-step chunks, capped in
mapper.steps_per_call without root cause — VERDICT r2 #4).

Each configuration runs in ITS OWN SUBPROCESS (a device fault kills the
process), at production size, for chunk lengths that historically pass (5)
and fault (10, 25). Ablations substitute one component of the scan body at
a time:

  full        hash encode + lattice march + compaction + volrend + Adam
  no_hash     spectral field instead of NGP (march/compaction kept)
  no_march    hash field, fixed uniform samples (no lattice gather, no
              compaction)
  no_compact  hash field + lattice occupancy mask, but samples are the
              first max_samples lattice candidates (no binary-search
              compaction gathers)
  no_occupdate  full, but without the in-scan occ EMA cond
  sg_hash     full, but stop_gradient on the hash tables — forward
              gathers run, the backward scatter-add does not (r4:
              separates gather-faults from scatter-faults after the
              first sweep pinned the fault to the hash field)
  small_table full with log2_hashmap_size=14 (16K entries vs 2^19) —
              does the fault scale with table size?

Run the sweep:    python -u scripts/bisect_occ_fault.py
Run one config:   python -u scripts/bisect_occ_fault.py --one full --steps 10
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_run(ablate: str, steps: int, calls: int = 2) -> None:
    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    import numpy as np
    import optax

    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.models import ngp, spectral
    from apnerf_tpu.ops.grid_march import candidate_lattice, march_rays, RaySegments
    from apnerf_tpu.ops.occupancy import init_occ_grid, maybe_update_occ_grid
    from apnerf_tpu.render.renderer import render_train
    from apnerf_tpu.train.step import make_optimizer

    cfg = PipelineConfig(
        num_semantic_classes=29, n_ensembles=2, num_rays=2048,
        max_samples_train=128, img_w=640, img_h=640,
    )
    if ablate == "small_table":
        import dataclasses

        cfg = dataclasses.replace(cfg, log2_hashmap_size=14)
    ngp_cfg = ngp.NGPConfig(
        aabb=tuple(float(v) for v in cfg.aabb),
        neurons=cfg.main_neurons, layers=cfg.main_layer,
        n_levels=cfg.n_levels, n_features=cfg.n_features,
        log2_hashmap_size=cfg.log2_hashmap_size,
        base_resolution=cfg.base_resolution,
        max_resolution=cfg.max_resolution,
        num_semantic_classes=cfg.num_semantic_classes,
    )
    s_cfg = spectral.SpectralConfig(
        aabb=tuple(float(v) for v in cfg.aabb),
        num_semantic_classes=cfg.num_semantic_classes,
    )
    lattice = jnp.asarray(
        candidate_lattice(
            cfg.n_candidates, cfg.near_plane, cfg.render_step_size,
            cfg.cone_angle,
        )
    )
    opt = make_optimizer(cfg, None)
    key = jax.random.PRNGKey(0)
    E, R, S = cfg.n_ensembles, cfg.num_rays, cfg.max_samples_train

    if ablate == "no_hash":
        params = jax.vmap(lambda k: spectral.init_spectral(k, s_cfg))(
            jax.random.split(key, E)
        )

        def field_fn(p, pos, dirs):
            return spectral.forward(p, s_cfg, pos, dirs)
    else:
        params = jax.vmap(lambda k: ngp.init_ngp(k, ngp_cfg))(
            jax.random.split(key, E)
        )

        def field_fn(p, pos, dirs):
            if ablate == "sg_hash":
                # forward gathers run; the backward table scatter-add
                # becomes dead (autodiff sees a constant table)
                p = {**p, "table": jax.lax.stop_gradient(p["table"])}
            return ngp.forward(p, ngp_cfg, pos, dirs)

    occ0 = init_occ_grid(cfg.aabb, cfg.main_grid_resolution)
    occ0 = occ0._replace(
        binaries=(
            jax.random.uniform(jax.random.PRNGKey(3), occ0.binaries.shape)
            < 0.15
        )
    )
    occ = jax.tree.map(lambda x: jnp.stack([x] * E), occ0)
    opt_state = jax.vmap(opt.init)(params)
    aabb = jnp.asarray(cfg.aabb, jnp.float32)

    def member_core(p, s_opt, o, batch, k, step):
        ro, rd, pix, dep, sem = batch

        if ablate != "no_occupdate" and ablate != "no_hash":
            def occ_eval_fn(x):
                return ngp.query_density(p, ngp_cfg, x) * cfg.render_step_size

            o = maybe_update_occ_grid(
                o, occ_eval_fn, k, step, jnp.asarray(1e-3),
                every_n=cfg.occ_every_n, warmup_steps=cfg.occ_warmup_steps,
            )

        def loss_fn(pp):
            ff = lambda pos, dirs: field_fn(pp, pos, dirs)
            if ablate == "no_march":
                t = jnp.linspace(0.2, 8.0, S + 1)
                segs = RaySegments(
                    t_starts=jnp.broadcast_to(t[:-1], (R, S)),
                    t_ends=jnp.broadcast_to(t[1:], (R, S)),
                    valid=jnp.ones((R, S), bool),
                )
                out = render_train(
                    ff, ro, rd, o, lattice, S, jnp.ones(3),
                    alpha_thre=cfg.alpha_thre, occ_mean=jnp.asarray(0.0),
                    segments=segs,
                )
            elif ablate == "no_compact":
                t0 = lattice[:-1][:S]
                t1 = lattice[1:][:S]
                # occupancy mask WITHOUT compaction: march's gather stage
                from apnerf_tpu.ops.grid_march import occupancy_lookup

                t_mid = 0.5 * (t0 + t1)
                pos = ro[:, None, :] + t_mid[None, :, None] * rd[:, None, :]
                occ_hit = occupancy_lookup(o.binaries, o.aabb, pos)
                segs = RaySegments(
                    t_starts=jnp.broadcast_to(t0, (R, S)),
                    t_ends=jnp.broadcast_to(t1, (R, S)),
                    valid=occ_hit,
                )
                out = render_train(
                    ff, ro, rd, o, lattice, S, jnp.ones(3),
                    alpha_thre=cfg.alpha_thre, occ_mean=jnp.asarray(0.0),
                    segments=segs,
                )
            else:
                out = render_train(
                    ff, ro, rd, o, lattice, S, jnp.ones(3),
                    alpha_thre=cfg.alpha_thre, occ_mean=jnp.mean(o.occs),
                )
            l = (
                jnp.mean(optax.huber_loss(out["rgb"], pix)) * 10.0
                + jnp.mean(optax.huber_loss(out["depth"][:, 0], dep)) / 5.0
                + jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        out["sem"], sem
                    )
                ) / 2.0
            )
            return l

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s_opt = opt.update(jax.tree.map(jnp.nan_to_num, grads), s_opt, p)
        p = optax.apply_updates(p, updates)
        return p, s_opt, o, loss

    @jax.jit
    def phase(params, opt_state, occ, step0, keys):
        def one(carry, k):
            p, s, o, st = carry
            kb, kr = jax.random.split(k)
            ks = jax.random.split(kb, 5)
            ro = jax.random.uniform(ks[0], (E, R, 3), minval=-4, maxval=0)
            rd = jax.random.normal(ks[1], (E, R, 3))
            rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            pix = jax.random.uniform(ks[2], (E, R, 3))
            dep = jax.random.uniform(ks[3], (E, R)) * 5
            sem = jax.random.randint(
                ks[4], (E, R), 0, cfg.num_semantic_classes
            )
            kk = jax.random.split(kr, E)
            p, s, o, loss = jax.vmap(
                member_core, in_axes=(0, 0, 0, 0, 0, None)
            )(p, s, o, (ro, rd, pix, dep, sem), kk, st)
            return (p, s, o, st + 1), loss

        (params, opt_state, occ, _), losses = jax.lax.scan(
            one, (params, opt_state, occ, step0), keys
        )
        return params, opt_state, occ, losses

    import time

    step0 = jnp.asarray(1000)
    best_sps = 0.0
    for call in range(calls):
        keys = jax.random.split(jax.random.PRNGKey(10 + call), steps)
        t0 = time.perf_counter()
        params, opt_state, occ, losses = phase(
            params, opt_state, occ, step0, keys
        )
        v = float(jnp.sum(losses))
        dt = time.perf_counter() - t0
        sps = steps * E * R * S / dt
        if call > 0:  # call 0 pays the compile
            best_sps = max(best_sps, sps)
        print(
            f"  call {call}: {dt:.1f}s loss_sum={v:.3f} "
            f"({sps:.3e} samples/s)", flush=True,
        )
        assert np.isfinite(v)
        step0 = step0 + steps
    if calls > 2:
        # bench mode: best warm call (chain-worker bursts can contaminate
        # individual calls; the max is the uncontended reading)
        print(f"BENCH ablate={ablate} steps={steps} "
              f"best_warm={best_sps:.3e} samples/s", flush=True)
    print(f"OK ablate={ablate} steps={steps}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--calls", type=int, default=2)
    ap.add_argument(
        "--sweep", default="full:5,full:10,full:25,no_hash:25,no_march:25,"
        "no_compact:25,no_occupdate:25"
    )
    args = ap.parse_args()

    if args.one:
        build_and_run(args.one, args.steps, args.calls)
        return

    results = {}
    for item in args.sweep.split(","):
        ablate, steps = item.split(":")
        print(f"=== {ablate} steps={steps} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, "--one", ablate,
                 "--steps", steps],
                timeout=2400,
            )
            results[item] = (
                "OK" if r.returncode == 0 else f"FAULT(rc={r.returncode})"
            )
        except subprocess.TimeoutExpired:
            results[item] = "TIMEOUT(2400s)"
        print(f"--- {item}: {results[item]}", flush=True)
    print("\nSUMMARY:")
    for k, v in results.items():
        print(f"  {k:20s} {v}")


if __name__ == "__main__":
    main()
