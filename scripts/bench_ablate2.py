"""Second ablation: fetch-only, field-no-volrend, no-optimizer, full."""

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
from apnerf_tpu.data.dataset import RayDataset
from apnerf_tpu.models import spectral
from apnerf_tpu.render.prop_renderer import render_rays_prop
from apnerf_tpu.train.flagship import (
    init_flagship_ensemble,
    make_prop_config,
    make_spectral_config,
)
from apnerf_tpu.train.phase import make_train_phase, pools_from_dataset
from apnerf_tpu.train.step import make_optimizer

STEPS = 25


def make_core(cfg, mode):
    s_cfg = make_spectral_config(cfg)
    p_cfg = make_prop_config(cfg)
    opt = make_optimizer(cfg, None)
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)

    def member_core(params, opt_state, occ, batch, k_occ, step, occ_thre):
        _, k_samp = jax.random.split(k_occ)

        def loss_fn(p):
            if mode == "fetch_only":
                return jnp.mean(batch.origins) + jnp.mean(
                    p["main"]["mlp_base"]["w0"]
                ), (0.0, 0.0, 0.0, jnp.asarray(0))

            def field_fn(pos, dirs):
                return spectral.forward(p["main"], s_cfg, pos, dirs)

            def prop_density_fn(pos):
                return spectral.query_density_field(p["prop"], p_cfg, pos)

            if mode == "field_no_volrend":
                R = batch.origins.shape[0]
                S = cfg.max_samples_train
                edges = jnp.broadcast_to(
                    jnp.linspace(0.2, 8.0, S + 1), (R, S + 1)
                )
                tm = 0.5 * (edges[:, :-1] + edges[:, 1:])
                pos = batch.origins[:, None, :] + tm[..., None] * (
                    batch.viewdirs[:, None, :]
                )
                dirs = jnp.broadcast_to(batch.viewdirs[:, None, :], pos.shape)
                rgbs, sigmas, sems = field_fn(pos, dirs)
                loss = (
                    jnp.mean(rgbs) * 10 + jnp.mean(sigmas) / 5
                    + jnp.mean(sems) / 2
                )
                return loss, (loss, loss, loss, jnp.asarray(0))

            out, p_loss = render_rays_prop(
                field_fn, prop_density_fn, batch.origins, batch.viewdirs,
                aabb, k_samp, num_samples=cfg.max_samples_train,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane, render_bkgd=batch.color_bkgd,
                stratified=True,
            )
            l_rgb = jnp.mean(optax.huber_loss(out["rgb"], batch.pixels))
            l_dep = jnp.mean(optax.huber_loss(out["depth"][:, 0], batch.depth))
            l_sem = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    out["sem"], batch.sem
                )
            )
            loss = l_rgb * 10.0 + l_dep / 5.0 + l_sem / 2.0 + p_loss
            return loss, (l_rgb, l_dep, l_sem, out["n_samples"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if mode == "no_optimizer":
            new_params = jax.tree.map(
                lambda p, g: p - 1e-9 * g.astype(p.dtype), params, grads
            )
            return (new_params, opt_state, occ, loss, *aux, jnp.asarray(False))
        flat_grads, _ = jax.flatten_util.ravel_pytree(grads)
        bad = ~jnp.all(jnp.isfinite(flat_grads))
        safe = jax.tree.map(jnp.nan_to_num, grads)
        updates, new_opt = opt.update(safe, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda n, o: jax.tree.map(
            lambda a, b: jnp.where(bad, b, a), n, o
        )
        return (keep(new_params, params), keep(new_opt, opt_state), occ,
                loss, *aux, bad)

    return member_core


def main():
    print("devices:", jax.devices(), flush=True)
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
        (rng.rand(4, 640, 640, 3) * 255).astype(np.uint8),
        (rng.rand(4, 640, 640) * 5).astype(np.float32),
        rng.randint(0, 29, (4, 640, 640)), c2ws,
    )
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)

    for mode in ("fetch_only", "field_no_volrend", "no_optimizer", "full"):
        state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
        state = state._replace(step=jnp.asarray(1000))
        phase = make_train_phase(cfg, member_core=make_core(cfg, mode))

        def run(state, k):
            return phase(
                state, ds.images, ds.depths, ds.semantics, ds.camtoworlds,
                ds.K, pools, counts, size, k, jnp.asarray(1e-3),
                jnp.asarray(False),
            )

        state, loss = run(state, jax.random.split(jax.random.PRNGKey(2), STEPS))
        _ = float(jnp.sum(loss))
        t0 = time.perf_counter()
        for i in range(2):
            state, loss = run(
                state, jax.random.split(jax.random.PRNGKey(5 + i), STEPS)
            )
        assert np.isfinite(float(jnp.sum(loss)))
        dt = (time.perf_counter() - t0) / (2 * STEPS)
        print(f"{mode:25s} {dt*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
