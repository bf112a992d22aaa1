"""Pallas fused-weights kernel vs the jnp volrend oracle (dual-
implementation strategy, like nerfacc's CUDA-vs-torch tests). Runs the
kernel in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.pallas import fused_render_weights
from apnerf_tpu.ops.volrend import render_weight_from_density


def _data(R=8, S=128, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    edges = jnp.sort(
        jax.random.uniform(k1, (R, S + 1), minval=0.1, maxval=5.0), axis=-1
    )
    t0, t1 = edges[:, :-1], edges[:, 1:]
    sigmas = jax.random.uniform(k2, (R, S), maxval=20.0)
    # some zero-density (invalid) tails like masked marching produces
    sigmas = sigmas.at[:, -7:].set(0.0)
    return t0, t1, sigmas


def test_forward_matches_oracle():
    t0, t1, sigmas = _data()
    w_ref, _, _ = render_weight_from_density(t0, t1, sigmas)
    w = fused_render_weights(t0, t1, sigmas)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)


def test_backward_matches_oracle():
    t0, t1, sigmas = _data(R=4, S=64, seed=3)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (4, 64))

    def loss_k(t0, t1, s):
        return jnp.sum((fused_render_weights(t0, t1, s) - tgt) ** 2)

    def loss_ref(t0, t1, s):
        w, _, _ = render_weight_from_density(t0, t1, s)
        return jnp.sum((w - tgt) ** 2)

    g_k = jax.grad(loss_k, argnums=(0, 1, 2))(t0, t1, sigmas)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(t0, t1, sigmas)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_nonuniform_tile_rows():
    # R not a multiple of the preferred tile exercises the tile fallback
    t0, t1, sigmas = _data(R=24, S=32, seed=5)
    w_ref, _, _ = render_weight_from_density(t0, t1, sigmas)
    w = fused_render_weights(t0, t1, sigmas)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)


def test_jit_and_vmap():
    t0, t1, sigmas = _data(R=8, S=32, seed=7)
    f = jax.jit(fused_render_weights)
    w = f(t0, t1, sigmas)
    assert np.isfinite(np.asarray(w)).all()
    # vmapped over an ensemble axis
    t0e = jnp.stack([t0, t0 * 1.01])
    t1e = jnp.stack([t1, t1 * 1.01])
    se = jnp.stack([sigmas, sigmas * 0.5])
    we = jax.vmap(fused_render_weights)(t0e, t1e, se)
    w_ref, _, _ = render_weight_from_density(t0e[1], t1e[1], se[1])
    np.testing.assert_allclose(np.asarray(we[1]), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)
