"""Fused field+volrend Pallas kernel vs the unfused oracle.

``ops/pallas/fused_field_volrend.fused_field_volrend`` extends the
whole-field kernel THROUGH the volume-rendering accumulation: per-sample
field values never leave VMEM and the outputs are per-RAY accumulations
plus the weights row ``prop_loss`` consumes. These tests pin it to
``spectral.forward`` + ``volrend.render_weight_from_density`` + the
accumulation einsums (interpret mode on CPU), forward and gradients, and
pin the renderer's fused-vr branch to the packed branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apnerf_tpu.models import spectral
from apnerf_tpu.ops import volrend
from apnerf_tpu.ops.pallas.fused_field_volrend import supports_fused_volrend

# the kernel requires whole 128-ray acc blocks
R, S = 128, 8


def _cfg(**kw):
    base = dict(
        aabb=(-1, -1, -1, 1, 1, 1), n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, neurons=32, layers=3,
        geo_feat_dim=7, num_semantic_classes=5,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return spectral.SpectralConfig(**base)


def _setup(layers=3, seed=0):
    cfg = _cfg(layers=layers)
    params = spectral.init_spectral(jax.random.PRNGKey(seed), cfg)
    kp, kd, kt = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    # positions straddle the aabb boundary to exercise the in-kernel
    # selector; sorted per-ray intervals like the sampler produces
    pos = jax.random.uniform(kp, (R, S, 3), minval=-1.3, maxval=1.3)
    dirs = jax.random.normal(kd, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    edges = jnp.sort(
        jax.random.uniform(kt, (R, S + 1), minval=0.1, maxval=3.0), axis=-1
    )
    t0, t1 = edges[:, :-1], edges[:, 1:]
    # a handful of aabb-miss rays (zero weights contract)
    miss = (jnp.arange(R) % 17) == 0
    return cfg, params, pos, dirs, t0, t1, miss


def _oracle(params, cfg, pos, rays_d, t0, t1, miss):
    """Unfused math → the kernel's (acc [5+C, R], weights [R, S])."""
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    rgb, density, sem = spectral.forward(params, cfg, pos, dirs)
    sigmas = density[..., 0] * (~miss[:, None])
    w, _, _ = volrend.render_weight_from_density(t0, t1, sigmas)
    t_mid = 0.5 * (t0 + t1)
    acc = jnp.concatenate(
        [
            jnp.einsum("rs,rsc->cr", w, rgb),
            jnp.sum(w, axis=-1)[None],
            jnp.einsum("rs,rs->r", w, t_mid)[None],
            jnp.einsum("rs,rsc->cr", w, sem),
        ],
        axis=0,
    )
    return acc, w


@pytest.mark.parametrize("layers", [2, 3])
def test_fwd_matches_oracle(layers):
    cfg, params, pos, dirs, t0, t1, miss = _setup(layers=layers)
    acc, w = spectral.forward_packed_volrend(
        params, cfg, pos, dirs, t0, t1, miss
    )
    acc_ref, w_ref = _oracle(params, cfg, pos, dirs, t0, t1, miss)
    assert acc.shape == (5 + cfg.num_semantic_classes, R)
    assert w.shape == (R, S)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(acc_ref), rtol=3e-2, atol=3e-2
    )
    # miss rays: exactly zero weights and accumulations
    m = np.asarray(miss)
    assert m.any()
    np.testing.assert_array_equal(np.asarray(w)[m], 0.0)
    np.testing.assert_array_equal(np.asarray(acc)[:, m], 0.0)


def test_grads_match_oracle():
    cfg, params, pos, dirs, t0, t1, miss = _setup()
    # cotangents on BOTH outputs so the dw path (direct acc terms + the
    # weights-output cotangent) is exercised end to end
    ka, kw = jax.random.split(jax.random.PRNGKey(7))
    wa = jax.random.normal(ka, (5 + cfg.num_semantic_classes, 1))
    ww = jax.random.normal(kw, (R, S))

    def loss_fused(p, pp):
        acc, w = spectral.forward_packed_volrend(
            p, cfg, pp, dirs, t0, t1, miss
        )
        return jnp.sum(wa * acc) + jnp.sum(ww * w)

    def loss_oracle(p, pp):
        acc, w = _oracle(p, cfg, pp, dirs, t0, t1, miss)
        return jnp.sum(wa * acc) + jnp.sum(ww * w)

    g1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(params, pos)
    g2, gp2 = jax.grad(loss_oracle, argnums=(0, 1))(params, pos)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in jax.tree_util.tree_leaves_with_path(g1):
        b = flat2[path]
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        # bf16 paths with different accumulation orders; compare on the
        # tensor scale like the fused_mlp oracle tests
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=str(path))
    a, b = np.asarray(gp1), np.asarray(gp2)
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-2)


def test_renderer_fused_vr_branch_parity():
    """render_rays_prop with field_packed_vr_fn vs the packed branch:
    same outputs (minus the unsupported variance extras) and prop loss."""
    from apnerf_tpu.render.prop_renderer import render_rays_prop

    cfg, params, _, _, _, _, _ = _setup()
    p_cfg = spectral.SpectralDensityConfig(
        aabb=cfg.aabb, neurons=16, layers=2, n_levels=2,
        freqs_per_level=2, base_freq=2.0, max_freq=8.0,
    )
    p_params = spectral.init_spectral_density(jax.random.PRNGKey(3), p_cfg)
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

    def packed_vr_fn(p_, rd_, t0_, t1_, miss_):
        return spectral.forward_packed_volrend(
            params, cfg, p_, rd_, t0_, t1_, miss_
        )

    def prop_density_fn(p_):
        return spectral.query_density_field(p_params, p_cfg, p_)

    kwargs = dict(
        prop_density_fn=prop_density_fn, rays_o=rays_o, rays_d=rays_d,
        aabb=aabb, key=kr, num_samples=S, num_prop_samples=8,
        near_plane=0.1, render_bkgd=bkgd, stratified=False,
    )
    out_ref, pl_ref = render_rays_prop(
        field_fn, field_packed_fn=packed_fn, **kwargs
    )
    out_vr, pl_vr = render_rays_prop(
        field_fn, field_packed_vr_fn=packed_vr_fn, **kwargs
    )
    assert set(out_vr) == set(out_ref)
    for k in out_ref:
        np.testing.assert_allclose(
            np.asarray(out_vr[k]), np.asarray(out_ref[k]),
            rtol=3e-2, atol=3e-2, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(pl_vr), np.asarray(pl_ref), rtol=3e-2, atol=3e-2
    )


def test_supports_fused_volrend_shapes():
    """Lane-alignment plan: S divides the tile, whole 128-ray acc blocks."""
    assert supports_fused_volrend(128 * 8, 8)
    assert supports_fused_volrend(256 * 8, 8)
    assert supports_fused_volrend(128 * 128, 128)
    assert not supports_fused_volrend(64 * 8, 8)  # 64 rays < one block
    assert not supports_fused_volrend(130 * 8, 8)  # ragged ray count
    # one whole 128-ray acc block per tile (128*12 = 1536 = the tile)
    assert supports_fused_volrend(128 * 12, 12)
    # 3 ray blocks at S=24: tile halves to 1024, not a multiple of 24
    assert not supports_fused_volrend(384 * 24, 24)


def test_use_packed_volrend_gate(monkeypatch):
    cfg, params, _, _, _, _, _ = _setup()
    # default: off on the CPU backend (auto = TPU only)
    assert not spectral.use_packed_volrend(cfg, params, 128, 8)
    monkeypatch.setenv("APNERF_FUSED_VR", "1")
    assert spectral.use_packed_volrend(cfg, params, 128, 8)
    assert not spectral.use_packed_volrend(cfg, params, 130, 8)
    monkeypatch.setenv("APNERF_FUSED_VR", "0")
    assert not spectral.use_packed_volrend(cfg, params, 128, 8)
