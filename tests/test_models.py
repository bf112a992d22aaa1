"""Field model tests: NGP semantic field, vanilla NeRF, TNeRF."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.models import mlp as mlpmod
from apnerf_tpu.models import ngp as ngpmod


AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def _small_cfg(**kw):
    return ngpmod.NGPConfig(
        aabb=AABB,
        neurons=32,
        layers=2,
        n_levels=4,
        n_features=2,
        log2_hashmap_size=10,
        base_resolution=4,
        max_resolution=32,
        **kw,
    )


def test_ngp_forward_shapes_semantic():
    cfg = _small_cfg(num_semantic_classes=5)
    params = ngpmod.init_ngp(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(2), (7, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb, density, sem = ngpmod.forward(params, cfg, x, d)
    assert rgb.shape == (7, 3) and density.shape == (7, 1) and sem.shape == (7, 5)
    assert np.all(np.array(rgb) >= 0) and np.all(np.array(rgb) <= 1)
    assert np.all(np.array(density) >= 0)


def test_ngp_density_zero_outside_aabb():
    # selector zeroing (ngp.py:179-193)
    cfg = _small_cfg()
    params = ngpmod.init_ngp(jax.random.PRNGKey(0), cfg)
    x_out = jnp.asarray([[2.0, 0.0, 0.0], [0.0, -3.0, 0.0]])
    density = ngpmod.query_density(params, cfg, x_out)
    np.testing.assert_allclose(np.array(density), 0.0)
    x_in = jnp.zeros((1, 3))
    assert np.array(ngpmod.query_density(params, cfg, x_in)).item() > 0.0


def test_trunc_exp_gradient_clamped():
    g = jax.grad(lambda x: ngpmod.trunc_exp(x))(20.0)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: ngpmod.trunc_exp(x))(2.0)
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-5)


def test_ngp_gradients_finite():
    cfg = _small_cfg(num_semantic_classes=3)
    params = ngpmod.init_ngp(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.9, maxval=0.9)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))

    def loss(p):
        rgb, density, sem = ngpmod.forward(p, cfg, x, d)
        return jnp.sum(rgb) + jnp.sum(density) + jnp.sum(sem)

    g = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.array(flat)).all()
    assert np.abs(np.array(flat)).sum() > 0


def test_ngp_ensemble_vmap():
    cfg = _small_cfg(num_semantic_classes=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    params = jax.vmap(lambda k: ngpmod.init_ngp(k, cfg))(keys)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), minval=-0.5, maxval=0.5)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (5, 1))
    rgb, density, sem = jax.vmap(
        lambda p: ngpmod.forward(p, cfg, x, d)
    )(params)
    assert rgb.shape == (2, 5, 3)
    # members differ (independent init)
    assert not np.allclose(np.array(rgb[0]), np.array(rgb[1]))


def test_vanilla_nerf():
    cfg = mlpmod.VanillaNeRFConfig(net_depth=2, net_width=32)
    params = mlpmod.init_vanilla_nerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (9, 3))
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    rgb, sigma = mlpmod.vanilla_forward(params, x, d, cfg)
    assert rgb.shape == (9, 3) and sigma.shape == (9, 1)
    assert np.all(np.array(sigma) >= 0)
    dens = mlpmod.vanilla_query_density(params, x, cfg)
    np.testing.assert_allclose(np.array(dens), np.array(sigma), rtol=1e-5)


def test_tnerf_zero_time_is_identity_warp():
    cfg = mlpmod.TNeRFConfig(
        base=mlpmod.VanillaNeRFConfig(net_depth=2, net_width=32)
    )
    params = mlpmod.init_tnerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.3
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    rgb_t0, sigma_t0 = mlpmod.tnerf_forward(params, x, jnp.asarray(0.0), d, cfg)
    rgb_v, sigma_v = mlpmod.vanilla_forward(params["base"], x, d, cfg.base)
    np.testing.assert_allclose(np.array(rgb_t0), np.array(rgb_v), rtol=1e-5)
    rgb_t1, _ = mlpmod.tnerf_forward(params, x, jnp.asarray(0.7), d, cfg)
    assert not np.allclose(np.array(rgb_t1), np.array(rgb_v))


def test_ndr_tnerf_near_identity_at_init_and_time_varying():
    """The NDR coupling warp starts near the identity (warp outputs init
    U(0, 1e-4), reference mlp.py:260,306) and varies with time."""
    cfg = mlpmod.NDRTNeRFConfig(
        base=mlpmod.VanillaNeRFConfig(net_depth=2, net_width=32),
        width=16, time_feat=8,
    )
    params = mlpmod.init_ndr_tnerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) * 0.3
    warped0 = mlpmod.ndr_warp(params, x, jnp.asarray(0.0), cfg)
    # warp output weights ~1e-4 => near-identity warp at init (note the
    # coupling blocks also permute axes, which compose back to identity
    # after the 3 rolls)
    np.testing.assert_allclose(np.asarray(warped0), np.asarray(x), atol=1e-2)
    w1 = mlpmod.ndr_warp(params, x, jnp.asarray(0.9), cfg)
    assert not np.allclose(np.asarray(w1), np.asarray(warped0))
    rgb, sigma = mlpmod.ndr_tnerf_forward(
        params, x, jnp.asarray(0.5),
        jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1)), cfg,
    )
    assert rgb.shape == (16, 3) and sigma.shape == (16, 1)
    assert np.isfinite(np.asarray(rgb)).all()
