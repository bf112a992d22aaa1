"""Quality anchor for the flagship path: train on a FakeSim scene at
production resolution on real hardware, report held-out PSNR / depth-MSE /
semantic accuracy across capacity and lr configs.

Run: python -u scripts/quality_sweep.py [--steps 1500]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

AABB = (-8.0, 0.0, -8.0, 0.0, 3.0, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--img", type=int, default=640)
    args = ap.parse_args()

    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.models import spectral
    from apnerf_tpu.ops.rays import image_rays, make_intrinsics, pose_matrix_from_quat
    from apnerf_tpu.render.prop_renderer import render_rays_prop
    from apnerf_tpu.sim.fake import FakeSim
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
        make_prop_config,
        make_spectral_config,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    print("devices:", jax.devices(), flush=True)
    W = H = args.img
    sim = FakeSim(aabb=AABB, img_w=W, img_h=H)

    # 39-pose initial scan around the room center (the pipeline's init)
    rng = np.random.RandomState(0)
    poses, mats = [], []
    center = np.array([-4.0, 1.5, -4.0])
    for i in range(39):
        ang = np.deg2rad(9.0 * i)
        pos = center + rng.uniform(-0.2, 0.2, 3)
        quat = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)])
        poses.append(np.concatenate([pos, quat]))
        mats.append(pose_matrix_from_quat(pos, quat))
    images, depths, sems = sim.sample_images_from_poses(poses)

    # held-out views
    test_poses = []
    for ang in (0.7, 2.1, 3.9, 5.2):
        q = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)])
        test_poses.append(np.concatenate([center + [0.3, 0, -0.4], q]))
    t_imgs, t_deps, t_sems = sim.sample_images_from_poses(test_poses)

    import json as _json
    variants = _json.loads(os.environ.get("SWEEP_VARIANTS", _json.dumps([
        ["n256 L3 f8 lr1e-3", dict(spectral_neurons=256, spectral_layers=3,
                                   spectral_freqs_per_level=8), 1e-3],
        ["n256 L2 f8 lr1e-3", dict(spectral_neurons=256, spectral_layers=2,
                                   spectral_freqs_per_level=8), 1e-3],
        ["n256 L3 f16 lr1e-3", dict(spectral_neurons=256, spectral_layers=3,
                                    spectral_freqs_per_level=16), 1e-3],
        ["n256 L3 f8 lr3e-3", dict(spectral_neurons=256, spectral_layers=3,
                                   spectral_freqs_per_level=8), 3e-3],
    ])))

    for name, kw, lr in variants:
        cfg = PipelineConfig(
            aabb=AABB, num_semantic_classes=sim.num_semantic_classes,
            n_ensembles=2, num_rays=2048, max_samples_train=128,
            max_samples_test=256, max_images=64, img_w=W, img_h=H,
            lr=lr, lr_base=lr / 10, spectral_lr=lr,
            training_steps=args.steps, **kw,
        )
        ds = RayDataset(
            training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
            width=W, height=H, max_images=cfg.max_images,
        )
        ds.update_data(
            np.asarray(images)[..., :3], np.asarray(depths),
            np.asarray(sems), np.array(mats),
        )
        state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
        phase = make_flagship_train_phase(cfg)
        pools, counts = pools_from_dataset(ds)
        size = jnp.asarray(ds.size, jnp.int32)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        done = 0
        while done < args.steps:
            chunk = min(25, args.steps - done)
            key, sub = jax.random.split(key)
            state, losses = phase(
                state, ds.images, ds.depths, ds.semantics, ds.camtoworlds,
                ds.K, pools, counts, size,
                jax.random.split(sub, chunk), jnp.asarray(1e-3),
                jnp.asarray(False),
            )
            done += chunk
        final_loss = float(jnp.mean(losses[-5:]))
        dt = time.perf_counter() - t0

        # eval at quarter res
        s_cfg = make_spectral_config(cfg)
        p_cfg = make_prop_config(cfg)
        oh = ow = W // 4
        K_s = jnp.asarray(make_intrinsics(ow, oh, cfg.hfov))
        aabb = jnp.asarray(cfg.aabb, jnp.float32)

        @jax.jit
        def render_view(params, c2w):
            rr = image_rays(c2w, K_s, ow, oh)

            def field_fn(pos, dirs):
                return spectral.forward(params["main"], s_cfg, pos, dirs)

            def prop_fn(pos):
                return spectral.query_density_field(params["prop"], p_cfg, pos)

            outs, _ = render_rays_prop(
                field_fn, prop_fn, rr.origins, rr.viewdirs, aabb,
                jax.random.PRNGKey(0), num_samples=cfg.max_samples_test,
                num_prop_samples=cfg.num_prop_samples,
                near_plane=cfg.near_plane, render_bkgd=jnp.ones(3),
                stratified=False,
            )
            return outs

        member0 = jax.tree.map(lambda x: x[0], state.params)
        psnrs, dmses, saccs = [], [], []
        ys = (np.arange(oh) * H) // oh
        xs = (np.arange(ow) * W) // ow
        for i, p in enumerate(test_poses):
            c2w = jnp.asarray(pose_matrix_from_quat(p[:3], p[3:]), jnp.float32)
            out = render_view(member0, c2w)
            gt = np.asarray(t_imgs[i])[..., :3][np.ix_(ys, xs)] / 255.0
            pd = np.asarray(out["rgb"]).reshape(oh, ow, 3)
            mse = float(np.mean((pd - gt) ** 2))
            psnrs.append(-10 * np.log10(mse))
            gd = np.asarray(t_deps[i])[np.ix_(ys, xs)]
            dmses.append(float(np.mean(
                (np.asarray(out["depth"]).reshape(oh, ow) - gd) ** 2
            )))
            gs = np.asarray(t_sems[i])[np.ix_(ys, xs)]
            ps = np.argmax(np.asarray(out["sem"]).reshape(oh, ow, -1), -1)
            saccs.append(float(np.mean(ps == gs)))
        print(
            f"{name:22s} steps={args.steps} loss={final_loss:.4f} "
            f"PSNR={np.mean(psnrs):6.2f} depthMSE={np.mean(dmses):7.4f} "
            f"semAcc={np.mean(saccs):.3f} train={dt:.1f}s "
            f"({args.steps * 524288 / dt:.2e} samp/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
