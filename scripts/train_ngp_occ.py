"""Standalone NGP + occupancy-grid trainer on NeRF-Synthetic.

CLI counterpart of the reference's ``perception/models/train_ngp_nerf_occ.py``
built on ``apnerf_tpu.train.examples``. Requires a local NeRF-Synthetic
download (``--data-root``).

  python scripts/train_ngp_occ.py --data-root /path/nerf_synthetic \
      --scene lego --steps 20000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--scene", default="lego")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--num-rays", type=int, default=4096)
    p.add_argument("--aabb", type=float, nargs=6,
                   default=[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    p.add_argument("--eval-every", type=int, default=5000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from apnerf_tpu.data.nerf_synthetic import load_subject, rays_for_pixels
    from apnerf_tpu.train.examples import make_ngp_occ_trainer
    from apnerf_tpu.utils.metrics import psnr

    train = load_subject(args.data_root, args.scene, "train")
    test = load_subject(args.data_root, args.scene, "test", max_images=8)
    print(f"{args.scene}: {len(train.images)} train / {len(test.images)} test")

    state, step_fn, render_fn = make_ngp_occ_trainer(
        args.aabb, grid_resolution=(128, 128, 128), render_step_size=5e-3,
        max_samples=128, n_candidates=1024,
    )
    images = jnp.asarray(train.images)
    key = jax.random.PRNGKey(42)
    H, W = train.height, train.width
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        img_id = jax.random.randint(k1, (args.num_rays,), 0, len(train.images))
        x = jax.random.randint(k2, (args.num_rays,), 0, W)
        y = jax.random.randint(k3, (args.num_rays,), 0, H)
        rays = rays_for_pixels(train, img_id, x, y)
        rgba = images[img_id, y, x].astype(jnp.float32) / 255.0
        bkgd = jax.random.uniform(k4, (3,))
        pixels = rgba[:, :3] * rgba[:, 3:] + bkgd * (1 - rgba[:, 3:])
        state, loss = step_fn(state, rays.origins, rays.viewdirs, pixels,
                              bkgd, k5)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            dt = time.perf_counter() - t0
            psnrs = []
            for i in range(len(test.images)):
                xg, yg = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
                rays = rays_for_pixels(test, np.full(xg.size, i),
                                       xg.reshape(-1), yg.reshape(-1))
                out = render_fn(state, rays.origins, rays.viewdirs,
                                jnp.ones(3))
                rgba = test.images[i].astype(np.float32) / 255.0
                gt = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
                psnrs.append(psnr(np.asarray(out["rgb"]).reshape(H, W, 3), gt))
            print(
                f"step {step+1} loss {float(loss):.4f} "
                f"test PSNR {np.mean(psnrs):.2f} dB elapsed {dt:.0f}s"
            )


if __name__ == "__main__":
    main()
