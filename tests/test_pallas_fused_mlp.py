"""Fused-MLP Pallas kernel vs the apply_mlp oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.models.nn import apply_mlp, init_mlp
from apnerf_tpu.ops.pallas.fused_mlp import fused_mlp_apply


def _setup(N=2048, Din=256, H=256, Dout=16, seed=0):
    params = init_mlp(jax.random.PRNGKey(seed), [Din, H, H, H, Dout])
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, Din))
    return params, x


def test_forward_matches_oracle():
    params, x = _setup()
    y_ref = apply_mlp(params, x, compute_dtype=jnp.bfloat16)
    y = fused_mlp_apply(params, x)
    # the kernel keeps f32 dot outputs where the oracle rounds hidden
    # activations through bf16 → agreement to bf16 precision
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)
    # and against the f32 oracle, the kernel should be at least as close
    y_f32 = apply_mlp(params, x)
    err_kernel = np.abs(np.asarray(y) - np.asarray(y_f32)).mean()
    err_bf16 = np.abs(np.asarray(y_ref) - np.asarray(y_f32)).mean()
    assert err_kernel <= err_bf16 * 1.5


def test_backward_matches_oracle_within_bf16():
    params, x = _setup(N=1024)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (1024, 16))

    g_ref = jax.grad(
        lambda p: jnp.sum(
            (apply_mlp(p, x, compute_dtype=jnp.bfloat16) - tgt) ** 2
        )
    )(params)
    g_new = jax.grad(
        lambda p: jnp.sum((fused_mlp_apply(p, x) - tgt) ** 2)
    )(params)
    for k in g_ref:
        a, b = np.asarray(g_new[k]), np.asarray(g_ref[k])
        scale = np.abs(b).max() + 1e-6
        # both paths compute in bf16; orders differ (the kernel's dW
        # accumulators are f32, strictly more accurate)
        assert np.abs(a - b).max() / scale < 0.02, (k, np.abs(a - b).max())


def test_dx_flows():
    params, x = _setup(N=512)
    dx = jax.grad(lambda x: fused_mlp_apply(params, x).sum())(x)
    assert np.isfinite(np.asarray(dx)).all()
    assert np.abs(np.asarray(dx)).sum() > 0


def test_vmapped_over_ensemble():
    params, x = _setup(N=512)
    pe = jax.tree.map(lambda a: jnp.stack([a, a * 1.01]), params)
    xe = jnp.stack([x, x * 0.5])
    ye = jax.vmap(fused_mlp_apply)(pe, xe)
    y1 = fused_mlp_apply(
        jax.tree.map(lambda a: a[1], pe), xe[1]
    )
    np.testing.assert_allclose(np.asarray(ye[1]), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


def test_fused_spectral_field_matches_oracle():
    """fused_spectral_field (encode+trunk in one kernel) vs the unfused
    spectral_encode → apply_mlp chain, forward and gradients."""
    import numpy as np
    from apnerf_tpu.models import spectral
    from apnerf_tpu.ops.pallas.fused_mlp import fused_spectral_field

    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, neurons=32, layers=3,
        geo_feat_dim=7, compute_dtype="bfloat16",
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    u = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

    def fused(W, ph, mlp):
        return fused_spectral_field(W, ph, mlp, u)

    def oracle(W, ph, mlp):
        enc = spectral._spectral_encode_core(W, ph, u, "bfloat16")
        return apply_mlp(mlp, enc, compute_dtype=jnp.bfloat16)

    args = (params["W"], params["phase"], params["mlp_base"])
    y1 = fused(*args)
    y2 = oracle(*args)
    assert y1.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=2e-2, atol=2e-2
    )

    def loss_f(W, ph, mlp):
        return jnp.sum(jnp.tanh(fused(W, ph, mlp)))

    def loss_o(W, ph, mlp):
        return jnp.sum(jnp.tanh(oracle(W, ph, mlp)))

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_o, argnums=(0, 1, 2))(*args)

    def close(a, b):
        # bf16 paths: per-element rounding (~0.4%, verified directly
        # against the unfused chain) can blow up RELATIVE error on sum
        # entries with cancellation, so compare on the tensor's scale
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2)

    close(g1[0], g2[0])
    close(g1[1], g2[1])
    for k in g1[2]:
        close(g1[2][k], g2[2][k])

    # du flows (positions get cotangents even if callers discard them)
    du = jax.grad(
        lambda uu: jnp.sum(
            fused_spectral_field(
                params["W"], params["phase"], params["mlp_base"], uu
            )
        )
    )(u)
    assert np.isfinite(np.asarray(du)).all()


def test_fused_spectral_field_two_hidden_layers():
    """The depth-generic kernel factories (r4): a 2-hidden-layer trunk
    (6-param mlp dict) runs through the same fused field with oracle
    parity — the capacity-matched-to-reference speed configuration."""
    import numpy as np
    from apnerf_tpu.models import spectral
    from apnerf_tpu.ops.pallas.fused_mlp import fused_spectral_field

    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, neurons=32, layers=2,
        geo_feat_dim=7, compute_dtype="bfloat16",
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    assert len(params["mlp_base"]) == 6
    u = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

    y1 = fused_spectral_field(
        params["W"], params["phase"], params["mlp_base"], u
    )
    enc = spectral._spectral_encode_core(
        params["W"], params["phase"], u, "bfloat16"
    )
    y2 = apply_mlp(params["mlp_base"], enc, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=2e-2, atol=2e-2
    )

    def loss_f(mlp):
        return jnp.sum(
            jnp.tanh(
                fused_spectral_field(params["W"], params["phase"], mlp, u)
            )
        )

    def loss_o(mlp):
        e = spectral._spectral_encode_core(
            params["W"], params["phase"], u, "bfloat16"
        )
        return jnp.sum(jnp.tanh(apply_mlp(mlp, e, compute_dtype=jnp.bfloat16)))

    g1 = jax.grad(loss_f)(params["mlp_base"])
    g2 = jax.grad(loss_o)(params["mlp_base"])
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2)
