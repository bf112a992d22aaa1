"""PDF importance sampling + proposal network tests.

Oracle strategy mirrors ``/root/reference/perception/nerfacc/tests/
test_pdf.py``: searchsorted vs the library binary search; resampling
checked by distribution mass.
"""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.pdf import importance_sampling, sample_from_weighted, searchsorted


def test_searchsorted_matches_numpy():
    # mirrors tests/test_pdf.py:46-62
    rng = np.random.RandomState(0)
    keys = np.sort(rng.rand(8, 16), axis=-1)
    queries = rng.rand(8, 10)
    left, right = searchsorted(jnp.asarray(keys), jnp.asarray(queries))
    for r in range(8):
        expect_right = np.clip(
            np.searchsorted(keys[r], queries[r], side="right"), 0, 15
        )
        np.testing.assert_array_equal(np.array(right[r]), expect_right)
        np.testing.assert_array_equal(
            np.array(left[r]), np.clip(expect_right - 1, 0, 15)
        )


def test_sample_from_weighted_concentrates_mass():
    # weights concentrated in one bin → samples land in that bin
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    weights = jnp.zeros((4, 10)).at[:, 3].set(1.0)
    samples, cdf = sample_from_weighted(bins, weights, 32)
    s = np.array(samples)
    assert ((s >= 0.3 - 1e-5) & (s <= 0.4 + 1e-5)).all()
    np.testing.assert_allclose(np.array(cdf[:, -1]), 1.0, rtol=1e-6)


def test_sample_from_weighted_uniform():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
    weights = jnp.ones((2, 10))
    samples, _ = sample_from_weighted(bins, weights, 1000)
    s = np.array(samples[0])
    # near-uniform coverage
    hist, _ = np.histogram(s, bins=10, range=(0, 1))
    assert hist.min() > 50


def test_importance_sampling_monotone_edges():
    key = jax.random.PRNGKey(0)
    edges = jnp.broadcast_to(jnp.linspace(0.1, 2.0, 17), (3, 17))
    weights = jax.random.uniform(key, (3, 16))
    new_edges, mids = importance_sampling(edges, weights, 8, key=key,
                                          stratified=True)
    assert new_edges.shape == (3, 9) and mids.shape == (3, 8)
    assert (np.diff(np.array(new_edges), axis=-1) >= 0).all()
    assert (np.array(mids) >= 0.1 - 1e-5).all()
    assert (np.array(mids) <= 2.0 + 1e-5).all()


def test_propnet_sampling_and_loss():
    from apnerf_tpu.models.propnet import prop_loss, propnet_sampling

    R = 16

    def prop_fn(t0, t1):
        # density bump near t = 1
        tm = (t0 + t1) / 2
        return 5.0 * jnp.exp(-((tm - 1.0) ** 2) / 0.05)

    rays_o = jnp.zeros((R, 3))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    t0, t1, levels = propnet_sampling(
        jax.random.PRNGKey(0), [prop_fn], [64], 32, rays_o, rays_d,
        near_plane=0.1, far_plane=5.0, sampling_type="uniform",
    )
    assert t0.shape == (R, 32) and t1.shape == (R, 32)
    # samples concentrate near the density bump at t=1
    mids = np.array((t0 + t1) / 2)
    frac_near = ((mids > 0.5) & (mids < 1.5)).mean()
    assert frac_near > 0.5

    # prop loss: zero when the proposal envelope dominates the final weights
    final_w = jnp.zeros((R, 32)).at[:, 10].set(0.01)
    loss = prop_loss(levels, t0, t1, final_w)
    assert np.isfinite(float(loss))

    # gradient flows to proposal weights through the loss
    def f(scale):
        _, _, lv = propnet_sampling(
            jax.random.PRNGKey(0), [lambda a, b: prop_fn(a, b) * scale],
            [64], 32, rays_o, rays_d, 0.1, 5.0, sampling_type="uniform",
        )
        return prop_loss(lv, t0, t1, final_w)

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g))
