"""Hash-grid, SH, sinusoidal encoding, contraction tests."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops import hashgrid
from apnerf_tpu.ops.contraction import contract_to_unisphere
from apnerf_tpu.ops.sh import sh_encode_deg4
from apnerf_tpu.models.mlp import sinusoidal_encode


def test_hashgrid_shapes_and_determinism():
    cfg = hashgrid.HashGridConfig(
        n_levels=4, n_features=2, log2_table_size=10, base_resolution=4,
        max_resolution=32,
    )
    table = hashgrid.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))
    out = hashgrid.hash_encode(table, x, cfg)
    assert out.shape == (37, cfg.out_dim)
    out2 = hashgrid.hash_encode(table, x, cfg)
    np.testing.assert_array_equal(np.array(out), np.array(out2))


def test_hashgrid_trilinear_interpolation_exact():
    """At a level with dense indexing, the encoding must reproduce exact
    trilinear interpolation of the table values."""
    cfg = hashgrid.HashGridConfig(
        n_levels=1, n_features=1, log2_table_size=12, base_resolution=4,
        max_resolution=4,
    )
    # dense indexing: (4+1)^3 = 125 <= 4096
    table = jnp.zeros((1, cfg.table_size, 1))
    # set value 1.0 at vertex (1, 2, 3): index = 1 + 2*5 + 3*25 = 86
    table = table.at[0, 86, 0].set(1.0)

    # query exactly at the vertex: x*res = (1,2,3) → x = (0.25, 0.5, 0.75)
    x = jnp.asarray([[0.25, 0.5, 0.75]])
    out = hashgrid.hash_encode(table, x, cfg)
    np.testing.assert_allclose(np.array(out), 1.0, rtol=1e-6)

    # halfway to the next vertex in x: weight 0.5
    x = jnp.asarray([[0.25 + 0.125, 0.5, 0.75]])
    out = hashgrid.hash_encode(table, x, cfg)
    np.testing.assert_allclose(np.array(out), 0.5, rtol=1e-6)


def test_hashgrid_gradient_flows_to_table():
    cfg = hashgrid.HashGridConfig(
        n_levels=2, n_features=2, log2_table_size=8, base_resolution=4,
        max_resolution=8,
    )
    table = hashgrid.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(t):
        return jnp.sum(hashgrid.hash_encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert np.isfinite(np.array(g)).all()
    assert np.abs(np.array(g)).sum() > 0


def test_hashgrid_matches_reference_oracle():
    """The batched-gather production path must agree with the naive
    per-level oracle, forward and backward (same dual-implementation
    strategy as nerfacc's CUDA-vs-torch tests)."""
    cfg = hashgrid.HashGridConfig(
        n_levels=6, n_features=4, log2_table_size=12, base_resolution=4,
        max_resolution=64,
    )
    table = hashgrid.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (333, 3))
    a = hashgrid.hash_encode(table, x, cfg)
    b = hashgrid.hash_encode_ref(table, x, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-7)
    ga = jax.grad(lambda t: (hashgrid.hash_encode(t, x, cfg) ** 2).sum())(table)
    gb = jax.grad(lambda t: (hashgrid.hash_encode_ref(t, x, cfg) ** 2).sum())(
        table
    )
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5,
                               atol=1e-8)


def test_hashgrid_resolutions_match_reference_formula():
    cfg = hashgrid.HashGridConfig()  # 16 levels, 16 → 4096
    res = cfg.resolutions
    assert res[0] == 16 and res[-1] == 4096
    # geometric growth factor b = exp((ln 4096 - ln 16)/15) (ngp.py:103-105)
    b = np.exp((np.log(4096) - np.log(16)) / 15)
    np.testing.assert_allclose(cfg.per_level_scale, b, rtol=1e-9)


def test_sh_encode_properties():
    d = jax.random.normal(jax.random.PRNGKey(0), (100, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = sh_encode_deg4(d)
    assert out.shape == (100, 16)
    # l=0 constant
    np.testing.assert_allclose(np.array(out[:, 0]), 0.2820948, rtol=1e-5)
    # orthogonality of the basis under uniform sphere sampling:
    # E[Y_i Y_j] = delta_ij / (4*pi)
    dd = jax.random.normal(jax.random.PRNGKey(1), (200000, 3))
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
    Y = np.array(sh_encode_deg4(dd))
    gram = Y.T @ Y / Y.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sinusoidal_encode():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    enc = sinusoidal_encode(x, 0, 10, True)
    assert enc.shape == (1, 3 * (1 + 20))
    np.testing.assert_allclose(np.array(enc[0, :3]), np.array(x[0]), rtol=1e-6)
    # first sin block at scale 2^0 = sin(x)
    np.testing.assert_allclose(
        np.array(enc[0, 3:6]), np.sin(np.array(x[0])), rtol=1e-5
    )


def test_contract_to_unisphere():
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    # center maps to 0.5
    np.testing.assert_allclose(
        np.array(contract_to_unisphere(jnp.zeros((1, 3)), aabb)), 0.5, atol=1e-6
    )
    # points inside |x|<=1 map affinely into [0.25, 0.75]
    x_in = jnp.asarray([[0.5, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.array(contract_to_unisphere(x_in, aabb)[0]),
        [0.5 / 4 + 0.5, 0.5, 0.5],
        atol=1e-6,
    )
    # far away points approach radius 2 → within [0, 1]
    x_far = jnp.asarray([[100.0, 100.0, 100.0]])
    out = np.array(contract_to_unisphere(x_far, aabb))
    assert np.all(out >= 0.0) and np.all(out <= 1.0)


def test_spectral_encode_custom_vjp_matches_autodiff():
    """The bandwidth-lean custom VJP of the spectral encode (r3,
    models/spectral.py _enc_bwd) must agree with plain autodiff of the
    same math in f32 for dW, dphase, and du."""
    import jax
    import numpy as np
    from apnerf_tpu.models import spectral

    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, compute_dtype="float32",
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    u = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    W, phase = params["W"], params["phase"]

    def loss_custom(W, phase, u):
        out = spectral._spectral_encode_core(W, phase, u, "float32")
        return jnp.sum(jnp.sin(out) * out)

    def loss_ref(W, phase, u):
        out, _ = spectral._encode_math(W, phase, u, jnp.float32)
        return jnp.sum(jnp.sin(out) * out)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(W, phase, u)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(W, phase, u)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )

    # vmapped over an ensemble axis (how the train phase consumes it)
    Ws = jnp.stack([W, W * 1.1])
    ps = jnp.stack([phase, phase * 0.9])
    gv = jax.vmap(
        lambda w, p: jax.grad(loss_custom, argnums=0)(w, p, u)
    )(Ws, ps)
    gr = jax.vmap(
        lambda w, p: jax.grad(loss_ref, argnums=0)(w, p, u)
    )(Ws, ps)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gr), rtol=1e-5, atol=1e-5
    )


def test_hashgrid_rowgather_matches_per_feature_path(monkeypatch):
    """The r5 row-gather forward + per-feature-scatter backward custom VJP
    must match the symmetric per-feature path exactly — values, table
    grads, AND position grads (d_weights is hand-built in the VJP)."""
    import jax

    cfg = hashgrid.HashGridConfig(
        n_levels=4, n_features=4, log2_table_size=10,
        base_resolution=4, max_resolution=64,
    )
    table = hashgrid.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=0.01,
                           maxval=0.99)

    def run():
        enc = hashgrid.hash_encode(table, x, cfg)
        gt, gx = jax.grad(
            lambda t, xx: (hashgrid.hash_encode(t, xx, cfg) ** 2).sum(),
            argnums=(0, 1),
        )(table, x)
        return enc, gt, gx

    monkeypatch.setenv("APNERF_HASH_ROWGATHER", "1")
    enc_a, gt_a, gx_a = run()
    monkeypatch.setenv("APNERF_HASH_ROWGATHER", "0")
    enc_b, gt_b, gx_b = run()

    np.testing.assert_allclose(enc_a, enc_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gt_a, gt_b, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(gx_a, gx_b, rtol=1e-4, atol=1e-5)
