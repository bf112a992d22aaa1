"""Whole-field Pallas kernel (encode+trunk+heads) vs the unfused oracle.

``ops/pallas/fused_field_heads.fused_field_heads`` evaluates the ENTIRE
flagship field (spectral encode → trunk → density/rgb/semantic heads) in
one kernel with a packed transposed [4+C, N] output; these tests pin it
to ``models/spectral.forward`` (interpret mode on CPU), forward and
gradients, and pin the renderer's packed branch to the plain branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apnerf_tpu.models import spectral
from apnerf_tpu.ops.pallas.fused_field_heads import fused_field_heads


def _cfg(**kw):
    base = dict(
        aabb=(-1, -1, -1, 1, 1, 1), n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, neurons=32, layers=3,
        geo_feat_dim=7, num_semantic_classes=5,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return spectral.SpectralConfig(**base)


def _setup(layers=3, R=8, S=16, seed=0):
    cfg = _cfg(layers=layers)
    params = spectral.init_spectral(jax.random.PRNGKey(seed), cfg)
    kp, kd = jax.random.split(jax.random.PRNGKey(seed + 1))
    # positions straddle the aabb boundary to exercise the in-kernel
    # selector (|coord| up to 1.3 vs aabb half-width 1.0)
    pos = jax.random.uniform(kp, (R, S, 3), minval=-1.3, maxval=1.3)
    dirs = jax.random.normal(kd, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return cfg, params, pos, dirs


def _oracle(params, cfg, pos, rays_d):
    """spectral.forward → the kernel's packed [4+C, R, S] layout."""
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    rgb, density, sem = spectral.forward(params, cfg, pos, dirs)
    return jnp.concatenate(
        [
            jnp.moveaxis(rgb, -1, 0),
            jnp.moveaxis(density, -1, 0),
            jnp.moveaxis(sem, -1, 0),
        ],
        axis=0,
    )


@pytest.mark.parametrize("layers", [2, 3])
def test_forward_matches_oracle(layers):
    cfg, params, pos, dirs = _setup(layers=layers)
    y = spectral.forward_packed(params, cfg, pos, dirs)
    y_ref = _oracle(params, cfg, pos, dirs)
    assert y.shape == (4 + cfg.num_semantic_classes,) + pos.shape[:2]
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2
    )
    # out-of-aabb samples must have exactly zero density
    u = (pos + 1.0) / 2.0
    outside = ~np.asarray(jnp.all((u > 0) & (u < 1), axis=-1))
    assert outside.any()
    np.testing.assert_array_equal(np.asarray(y[3])[outside], 0.0)


def test_grads_match_oracle():
    cfg, params, pos, dirs = _setup()
    # a weighted sum over all channels so every head gets a cotangent
    w = jax.random.normal(
        jax.random.PRNGKey(7), (4 + cfg.num_semantic_classes, 1, 1)
    )

    def loss_fused(p):
        return jnp.sum(w * spectral.forward_packed(p, cfg, pos, dirs))

    def loss_oracle(p):
        return jnp.sum(w * _oracle(p, cfg, pos, dirs))

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_oracle)(params)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        b = flat2[path]
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        # bf16 paths with different accumulation orders (the kernel's
        # grad accumulators are f32 VMEM, strictly more accurate);
        # compare on the tensor scale like the fused_mlp oracle tests
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=str(path))


def test_position_grads_flow():
    cfg, params, pos, dirs = _setup()
    dpos = jax.grad(
        lambda pp: jnp.sum(spectral.forward_packed(params, cfg, pp, dirs))
    )(pos)
    assert np.isfinite(np.asarray(dpos)).all()
    assert np.abs(np.asarray(dpos)).sum() > 0


def test_renderer_packed_branch_parity():
    """render_rays_prop with field_packed_fn vs the plain field_fn branch:
    identical outputs (same math, one einsum over the packed rows)."""
    from apnerf_tpu.render.prop_renderer import render_rays_prop

    cfg, params, _, _ = _setup()
    p_cfg = spectral.SpectralDensityConfig(
        aabb=cfg.aabb, neurons=16, layers=2, n_levels=2,
        freqs_per_level=2, base_freq=2.0, max_freq=8.0,
    )
    p_params = spectral.init_spectral_density(jax.random.PRNGKey(3), p_cfg)
    R, S = 16, 8
    ko, kd, kr = jax.random.split(jax.random.PRNGKey(11), 3)
    rays_o = jax.random.uniform(ko, (R, 3), minval=-2.0, maxval=2.0)
    rays_d = jax.random.normal(kd, (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    bkgd = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)

    def field_fn(p_, d_):
        return spectral.forward(params, cfg, p_, d_)

    def packed_fn(p_, rd_):
        return spectral.forward_packed(params, cfg, p_, rd_)

    def prop_density_fn(p_):
        return spectral.query_density_field(p_params, p_cfg, p_)

    kwargs = dict(
        prop_density_fn=prop_density_fn, rays_o=rays_o, rays_d=rays_d,
        aabb=aabb, key=kr, num_samples=S, num_prop_samples=8,
        near_plane=0.1, render_bkgd=bkgd, stratified=False,
        with_variance=True,
    )
    out_plain, pl_plain = render_rays_prop(field_fn, **kwargs)
    out_packed, pl_packed = render_rays_prop(
        field_fn, field_packed_fn=packed_fn, **kwargs
    )
    assert set(out_packed) == set(out_plain)
    for k in out_plain:
        np.testing.assert_allclose(
            np.asarray(out_packed[k]), np.asarray(out_plain[k]),
            rtol=2e-2, atol=2e-2, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(pl_packed), np.asarray(pl_plain), rtol=2e-2, atol=2e-2
    )


def test_split_chains_match_oracle(monkeypatch):
    """The stage-interleaved split-chain layout (APNERF_FUSED_SPLITS>1,
    the shipping TPU configuration — see docs/PERFORMANCE.md r4 ledger)
    is exact vs the single-chain math: fwd and every parameter grad."""
    from apnerf_tpu.ops.pallas import fused_field_heads as ffh

    monkeypatch.setattr(ffh, "_SPLITS_ENV", 2)
    # tile must be a multiple of splits*128 for the chains to engage
    cfg = _cfg()
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    kp, kd = jax.random.split(jax.random.PRNGKey(1))
    pos = jax.random.uniform(kp, (16, 128, 3), minval=-1.3, maxval=1.3)
    dirs = jax.random.normal(kd, (16, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    assert ffh._n_splits(1024) == 2

    y = spectral.forward_packed(params, cfg, pos, dirs)
    y_ref = _oracle(params, cfg, pos, dirs)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2
    )

    w = jax.random.normal(
        jax.random.PRNGKey(7), (4 + cfg.num_semantic_classes, 1, 1)
    )
    g1 = jax.grad(
        lambda p: jnp.sum(w * spectral.forward_packed(p, cfg, pos, dirs))
    )(params)
    g2 = jax.grad(lambda p: jnp.sum(w * _oracle(p, cfg, pos, dirs)))(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in jax.tree_util.tree_leaves_with_path(g1):
        b = flat2[path]
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=str(path))


def test_n_splits_clamps_to_whole_lane_registers(monkeypatch):
    """Chains keep whole 128-lane columns: the split count halves until
    tile % (n*128) == 0."""
    from apnerf_tpu.ops.pallas import fused_field_heads as ffh

    monkeypatch.setattr(ffh, "_SPLITS_ENV", 4)
    assert ffh._n_splits(1024) == 4
    assert ffh._n_splits(256) == 2
    assert ffh._n_splits(128) == 1
    assert ffh._n_splits(384) == 1  # 384 % 512 and % 256 both nonzero


def test_use_packed_field_gate(monkeypatch):
    cfg, params, _, _ = _setup()
    # default: off on the CPU backend (auto = TPU only)
    assert not spectral.use_packed_field(cfg, params, 256)
    # forced on: every disqualifier still vetoes individually
    monkeypatch.setenv("APNERF_FUSED_HEADS", "1")
    assert spectral.use_packed_field(cfg, params, 256)
    assert not spectral.use_packed_field(cfg, params, 255)  # row count
    assert not spectral.use_packed_field(
        cfg._replace(unbounded=True), params, 256
    )
    no_sem = {k: v for k, v in params.items() if k != "mlp_sem"}
    assert not spectral.use_packed_field(
        cfg._replace(num_semantic_classes=0), no_sem, 256
    )
    assert not spectral.use_packed_field(
        cfg._replace(compute_dtype="float32"), params, 256
    )
    monkeypatch.setenv("APNERF_FUSED_HEADS", "0")
    assert not spectral.use_packed_field(cfg, params, 256)
