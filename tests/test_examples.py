"""Example trainer tests (occ-grid NGP, MLP NeRF, prop-net NGP) on a
synthetic analytic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.train.examples import (
    make_mlp_occ_trainer,
    make_ngp_occ_trainer,
    make_ngp_prop_trainer,
)

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
TINY_NGP = dict(neurons=32, layers=1, n_levels=4, n_features=2,
                log2_hashmap_size=10, base_resolution=4, max_resolution=16,
                geo_feat_dim=7)


def _batch(key, R=128):
    k1, k2, k3 = jax.random.split(key, 3)
    ro = jax.random.uniform(k1, (R, 3), minval=-0.3, maxval=0.3)
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    # GT: red where the ray points up, blue otherwise
    pixels = jnp.where(rd[:, 1:2] > 0,
                       jnp.asarray([[1.0, 0.2, 0.2]]),
                       jnp.asarray([[0.2, 0.2, 1.0]]))
    return ro, rd, jnp.broadcast_to(pixels, (R, 3))


def test_ngp_occ_trainer_learns():
    state, step_fn, render_fn = make_ngp_occ_trainer(
        AABB, grid_resolution=(8, 8, 8), render_step_size=0.05,
        max_samples=16, n_candidates=64, ngp_kwargs=TINY_NGP,
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        key, k1, k2 = jax.random.split(key, 3)
        ro, rd, px = _batch(k1)
        state, loss = step_fn(state, ro, rd, px, jnp.ones(3), k2)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    ro, rd, _ = _batch(jax.random.PRNGKey(5))
    out = render_fn(state, ro, rd, jnp.ones(3))
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_mlp_occ_trainer_steps():
    from apnerf_tpu.models.mlp import VanillaNeRFConfig

    state, step_fn = make_mlp_occ_trainer(
        AABB, grid_resolution=(8, 8, 8), render_step_size=0.1,
        max_samples=8, n_candidates=32,
        mlp_cfg=VanillaNeRFConfig(net_depth=2, net_width=32),
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        key, k1, k2 = jax.random.split(key, 3)
        ro, rd, px = _batch(k1, R=64)
        state, loss = step_fn(state, ro, rd, px, jnp.ones(3), k2)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ngp_prop_trainer_steps():
    state, step_fn = make_ngp_prop_trainer(
        AABB, num_samples=16, prop_samples=(32,), near_plane=0.1,
        far_plane=4.0, ngp_kwargs=TINY_NGP,
        prop_kwargs=dict(n_levels=2, log2_hashmap_size=8, max_resolution=16),
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        key, k1, k2 = jax.random.split(key, 3)
        ro, rd, px = _batch(k1, R=64)
        state, loss = step_fn(state, ro, rd, px, jnp.ones(3), k2)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # trains stably


def test_tnerf_occ_trainer_steps():
    """T-NeRF trainer (⇔ train_mlp_tnerf.py): steps run, loss finite and
    decreasing on a static-scene batch with varying timestamps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apnerf_tpu.models.mlp import TNeRFConfig, VanillaNeRFConfig
    from apnerf_tpu.train.examples import make_tnerf_occ_trainer

    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    state, step_fn = make_tnerf_occ_trainer(
        aabb, grid_resolution=(8, 8, 8), render_step_size=0.05,
        max_samples=16, n_candidates=64, lr=1e-3,
        tnerf_cfg=TNeRFConfig(
            base=VanillaNeRFConfig(net_depth=2, net_width=32),
            warp_depth=2, warp_width=16,
        ),
    )
    R = 64
    key = jax.random.PRNGKey(0)
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (R, 1))
    d = jax.random.normal(key, (R, 3)) * 0.1 + jnp.asarray([0.0, 0.0, -1.0])
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pixels = jnp.ones((R, 3)) * 0.5
    ts = jax.random.uniform(jax.random.PRNGKey(1), (R,))
    bkgd = jnp.ones(3)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, origins, viewdirs, pixels, ts, bkgd, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
