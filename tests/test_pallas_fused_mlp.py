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
