"""Volume-rendering core tests.

Mirrors the reference oracle in
``/root/reference/perception/nerfacc/tests/test_rendering.py`` — the same
hand-computed transmittances/weights/gradients, expressed on the dense
[n_rays, n_samples] layout (ray 0 = sample 0 alone; ray 2 = samples 1-4;
ray 1 = empty, which here is an all-invalid row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apnerf_tpu.ops import volrend


def _packed_to_dense(vals, fill=0.0):
    """ray0: [v0], ray1: [], ray2: [v1..v4] → dense [3, 4]."""
    dense = np.full((3, 4), fill, dtype=np.float32)
    dense[0, 0] = vals[0]
    dense[2, :] = vals[1:]
    return jnp.asarray(dense)


def test_render_visibility_from_alpha():
    # test_rendering.py:8-35
    alphas = _packed_to_dense([0.4, 0.3, 0.8, 0.8, 0.5])

    vis = volrend.render_visibility_from_alpha(
        alphas, early_stop_eps=0.03, alpha_thre=0.0
    )
    assert bool(vis[0, 0])
    assert list(np.array(vis[2])) == [True, True, True, False]

    vis = volrend.render_visibility_from_alpha(
        alphas, early_stop_eps=0.05, alpha_thre=0.35
    )
    assert bool(vis[0, 0])
    assert list(np.array(vis[2])) == [False, True, True, False]


def test_render_weight_from_alpha():
    # test_rendering.py:38-57
    alphas = _packed_to_dense([0.4, 0.3, 0.8, 0.8, 0.5])
    weights, _ = volrend.render_weight_from_alpha(alphas)
    np.testing.assert_allclose(weights[0, 0], 0.4, rtol=1e-6)
    np.testing.assert_allclose(
        np.array(weights[2]),
        [1.0 * 0.3, 0.7 * 0.8, 0.14 * 0.8, 0.028 * 0.5],
        rtol=1e-5,
    )
    assert np.all(np.array(weights[1]) == 0)


def test_weight_density_alpha_consistency():
    # test_rendering.py:60-83
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sigmas = jax.random.uniform(k1, (3, 4))
    t_starts = jax.random.uniform(k2, (3, 4))
    t_ends = t_starts + jax.random.uniform(k3, (3, 4)) + 1.0
    alphas = 1.0 - jnp.exp(-sigmas * (t_ends - t_starts))
    w_d, _, _ = volrend.render_weight_from_density(t_starts, t_ends, sigmas)
    w_a, _ = volrend.render_weight_from_alpha(alphas)
    np.testing.assert_allclose(np.array(w_d), np.array(w_a), rtol=1e-5)


def test_weights_and_grads_reference_values():
    # test_rendering.py:118-196: literal expected weights and sigma grads.
    sigmas = _packed_to_dense([0.4, 0.8, 0.1, 0.8, 0.1])
    t_starts = jnp.zeros((3, 4))
    t_ends = jnp.ones((3, 4))

    def weight_sum(s):
        w, _, _ = volrend.render_weight_from_density(t_starts, t_ends, s)
        return jnp.sum(w), w

    (_, weights), grads = jax.value_and_grad(weight_sum, has_aux=True)(sigmas)
    np.testing.assert_allclose(np.array(weights[0, 0]), 0.3297, atol=1e-4)
    np.testing.assert_allclose(
        np.array(weights[2]), [0.5507, 0.0428, 0.2239, 0.0174], atol=1e-4
    )
    np.testing.assert_allclose(np.array(grads[0, 0]), 0.6703, atol=1e-4)
    np.testing.assert_allclose(
        np.array(grads[2]), [0.1653, 0.1653, 0.1653, 0.1653], atol=1e-4
    )


def test_accumulate_along_rays():
    # test_rendering.py:86-115
    weights = _packed_to_dense([0.4, 0.3, 0.8, 0.8, 0.5])
    values = jax.random.uniform(jax.random.PRNGKey(1), (3, 4, 2))
    acc = volrend.accumulate_along_rays(weights, values)
    assert acc.shape == (3, 2)
    np.testing.assert_allclose(
        np.array(acc[0]), np.array(weights[0, 0] * values[0, 0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.array(acc[2]),
        np.array(jnp.sum(weights[2, :, None] * values[2], axis=0)),
        rtol=1e-5,
    )
    opacity = volrend.accumulate_along_rays(weights, None)
    assert opacity.shape == (3, 1)
    np.testing.assert_allclose(np.array(opacity[:, 0]), [0.4, 0.0, 2.4], rtol=1e-5)


def test_exclusive_scans():
    x = jnp.asarray(np.random.RandomState(0).rand(5, 7).astype(np.float32))
    es = volrend.exclusive_sum(x)
    np.testing.assert_allclose(
        np.array(es[:, 1:]), np.cumsum(np.array(x), axis=1)[:, :-1], rtol=1e-5
    )
    assert np.all(np.array(es[:, 0]) == 0)
    ep = volrend.exclusive_prod(x)
    np.testing.assert_allclose(
        np.array(ep[:, 1:]), np.cumprod(np.array(x), axis=1)[:, :-1], rtol=1e-5
    )
    assert np.all(np.array(ep[:, 0]) == 1)


def test_render_outputs_background_and_depth():
    weights = jnp.asarray([[0.25, 0.25, 0.0]])
    t_starts = jnp.asarray([[1.0, 2.0, 3.0]])
    t_ends = jnp.asarray([[2.0, 3.0, 4.0]])
    rgbs = jnp.ones((1, 3, 3)) * 0.5
    bkgd = jnp.asarray([1.0, 1.0, 1.0])
    out = volrend.render_outputs(weights, t_starts, t_ends, rgbs, render_bkgd=bkgd)
    # color = 0.5*0.5 + 1.0*(1-0.5) = 0.75
    np.testing.assert_allclose(np.array(out["rgb"]), 0.75, rtol=1e-6)
    # depth = (0.25*1.5 + 0.25*2.5) / 0.5 = 2.0
    np.testing.assert_allclose(np.array(out["depth"]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.array(out["opacity"]), 0.5, rtol=1e-6)


def test_render_variance_exact():
    weights = jnp.asarray([[0.5, 0.5]])
    values = jnp.asarray([[[0.0], [1.0]]])
    mean = volrend.accumulate_along_rays(weights, values)  # 0.5
    var = volrend.render_variance(weights, values, mean)
    # 0.5*(0-0.5)^2 + 0.5*(1-0.5)^2 = 0.25
    np.testing.assert_allclose(np.array(var), 0.25, rtol=1e-6)
