"""Isolate the carried-params lax.scan penalty on the flagship trunk.

PERFORMANCE.md (r2): "A carried-params lax.scan makes the trunk ~80%
slower than the same math with invariant params". This script measures
the *whole flagship member step* (fwd+bwd+Adam) under several loop
structures to find the one XLA schedules best:

  prod        carried {params, opt_state} (what make_train_phase does)
  invariant   params closed over as constants; grads still computed and
              summed into a carried accumulator (upper bound)
  bf16carry   params carried already in bf16 (no per-iteration cast);
              f32 master weights closed over for Adam
  unroll-k    prod with lax.scan unroll=k

All timings: one lax.scan of STEPS steps per call, scalar float()
readback, median of N_CALLS. Run: python -u scripts/profile_scan_carry.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from apnerf_tpu.config import PipelineConfig
from apnerf_tpu.models import spectral
from apnerf_tpu.render.prop_renderer import render_rays_prop
from apnerf_tpu.train.flagship import (
    init_flagship_ensemble,
    make_prop_config,
    make_spectral_config,
)
from apnerf_tpu.train.step import make_optimizer

STEPS = 25
N_CALLS = 4

cfg = PipelineConfig(
    num_semantic_classes=29, n_ensembles=2, num_rays=2048,
    max_samples_train=128, max_images=8, img_w=640, img_h=640,
)
s_cfg = make_spectral_config(cfg)
p_cfg = make_prop_config(cfg)
aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
opt = make_optimizer(cfg, None)

E = cfg.n_ensembles
R = cfg.num_rays


def synth_batch(key):
    """Per-step synthetic ray batch (replaces fetch_rays; keeps the
    comparison focused on the train math)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    o = jax.random.uniform(k1, (E, R, 3), minval=-4, maxval=4)
    d = jax.random.normal(k2, (E, R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jax.random.uniform(k3, (E, R, 3))
    dep = jax.random.uniform(k4, (E, R)) * 5
    sem = jax.random.randint(k5, (E, R), 0, cfg.num_semantic_classes)
    return o, d, pix, dep, sem


def loss_fn(p, batch, k_samp):
    o, d, pix, dep, sem = batch

    def field_fn(pos, dirs):
        return spectral.forward(p["main"], s_cfg, pos, dirs)

    def prop_density_fn(pos):
        return spectral.query_density_field(p["prop"], p_cfg, pos)

    out, p_loss = render_rays_prop(
        field_fn, prop_density_fn, o, d, aabb, k_samp,
        num_samples=cfg.max_samples_train,
        num_prop_samples=cfg.num_prop_samples,
        near_plane=cfg.near_plane,
        render_bkgd=jnp.ones(3), stratified=True,
    )
    l = (
        jnp.mean(optax.huber_loss(out["rgb"], pix)) * 10.0
        + jnp.mean(optax.huber_loss(out["depth"][:, 0], dep)) / 5.0
        + jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(out["sem"], sem)
        ) / 2.0
        + cfg.prop_loss_weight * p_loss
    )
    return l


def member_update(params, opt_state, batch, k_samp):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, k_samp)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def vstep(params, opt_state, batch, keys):
    f = jax.vmap(
        lambda p, s, o, d, pix, dep, sem, k: member_update(
            p, s, (o, d, pix, dep, sem), k
        )
    )
    return f(params, opt_state, *batch, keys)


def bench(fn, args, label):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    v = float(jfn(*args))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(N_CALLS):
        t0 = time.perf_counter()
        v = float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    sps = E * R * cfg.max_samples_train * STEPS / dt
    print(
        f"{label:24s} {dt/STEPS*1e3:8.2f} ms/step  {sps:.3e} samples/s "
        f"({sps/1.95e7:.3f}x)  [compile {t_compile:.0f}s]",
        flush=True,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    state = init_flagship_ensemble(key, cfg)
    params, opt_state = state.params, state.opt_state
    keys = jax.random.split(jax.random.PRNGKey(1), STEPS)

    def run_prod(params, opt_state, keys, unroll=1):
        def step(c, k):
            p, s = c
            kb, ks = jax.random.split(k)
            batch = synth_batch(kb)
            p, s, loss = vstep(p, s, batch, jax.random.split(ks, E))
            return (p, s), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), keys, unroll=unroll
        )
        return jnp.sum(losses)

    def run_invariant(params, keys):
        def step(acc, k):
            kb, ks = jax.random.split(k)
            batch = synth_batch(kb)
            loss, grads = jax.vmap(
                jax.value_and_grad(loss_fn), in_axes=(0, 0, 0)
            )(
                params,
                batch,
                jax.random.split(ks, E),
            )
            g, _ = jax.flatten_util.ravel_pytree(
                jax.tree.map(jnp.sum, grads)
            )
            return acc + jnp.sum(loss) + jnp.sum(g), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), keys)
        return acc

    def run_bf16carry(params, opt_state, keys):
        """Carry bf16 *compute* weights; Adam updates the bf16 copy's f32
        shadow in the carry too. Tests whether the per-iteration f32→bf16
        casts are the penalty."""
        bparams = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            params,
        )

        def step(c, k):
            p32, pb, s = c
            kb, ks = jax.random.split(k)
            batch = synth_batch(kb)

            def lf(pb_, b, kk):
                return loss_fn(pb_, b, kk)

            loss, grads = jax.vmap(jax.value_and_grad(lf))(
                pb, batch, jax.random.split(ks, E)
            )
            grads = jax.tree.map(
                lambda g: g.astype(jnp.float32), grads
            )
            updates, s = jax.vmap(opt.update)(grads, s, p32)
            p32 = jax.vmap(optax.apply_updates)(p32, updates)
            pb = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a,
                p32,
            )
            return (p32, pb, s), loss

        (p32, _, _), losses = jax.lax.scan(
            step, (params, bparams, opt_state), keys
        )
        return jnp.sum(losses)

    bench(run_prod, (params, opt_state, keys), "prod (carry, unroll=1)")
    bench(run_invariant, (params, keys), "invariant params")
    bench(
        lambda p, s, k: run_prod(p, s, k, unroll=5),
        (params, opt_state, keys),
        "prod unroll=5",
    )
    bench(run_bf16carry, (params, opt_state, keys), "bf16 carried weights")


if __name__ == "__main__":
    main()
