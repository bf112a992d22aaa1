"""Flagship path tests: spectral field, gather-free PDF ops, proposal
renderer, and the flagship train phase (loss drops, occ grid still
updates for the planner)."""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.config import PipelineConfig
from apnerf_tpu.models import spectral
from apnerf_tpu.ops.pdf import (
    importance_sampling,
    importance_sampling_onehot,
    sample_from_weighted,
    sample_from_weighted_onehot,
    searchsorted,
    searchsorted_onehot,
    take_onehot,
)


def tiny_cfg(**kw):
    base = dict(
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        img_w=32,
        img_h=32,
        num_rays=64,
        max_samples_train=16,
        num_prop_samples=16,
        prop_neurons=16,
        prop_layers=1,
        spectral_neurons=32,
        spectral_layers=2,
        spectral_freqs_per_level=2,
        n_levels=4,
        base_resolution=4,
        max_resolution=16,
        render_step_size=0.05,
        near_plane=0.1,
        main_grid_size=0.25,
        geo_feat_dim=7,
        num_semantic_classes=4,
        n_ensembles=2,
        max_images=8,
        training_steps=64,
        occ_warmup_steps=4,
        occ_every_n=2,
    )
    base.update(kw)
    return PipelineConfig(**base)


# ---------------------------------------------------------------- pdf ops


def test_searchsorted_onehot_matches_gather_path():
    key = jax.random.PRNGKey(0)
    keys_ = jnp.sort(jax.random.uniform(key, (8, 33)), axis=-1)
    q = jax.random.uniform(jax.random.PRNGKey(1), (8, 17))
    l0, r0 = searchsorted(keys_, q)
    l1, r1 = searchsorted_onehot(keys_, q)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_take_onehot_matches_take_along_axis():
    arr = jax.random.normal(jax.random.PRNGKey(0), (6, 20))
    idx = jax.random.randint(jax.random.PRNGKey(1), (6, 9), 0, 20)
    np.testing.assert_allclose(
        np.asarray(take_onehot(arr, idx)),
        np.asarray(jnp.take_along_axis(arr, idx, axis=-1)),
        rtol=1e-6,
    )


def test_sample_from_weighted_onehot_matches_gather_path():
    R, B, S = 16, 32, 24
    bins = jnp.broadcast_to(jnp.linspace(0.0, 4.0, B + 1), (R, B + 1))
    w = jax.random.uniform(jax.random.PRNGKey(0), (R, B)) ** 2
    s0, _ = sample_from_weighted(bins, w, S)
    s1 = sample_from_weighted_onehot(bins, w, S)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
    # stratified draws agree too (same key → same jitter)
    k = jax.random.PRNGKey(7)
    s0, _ = sample_from_weighted(bins, w, S, key=k, stratified=True)
    s1 = sample_from_weighted_onehot(bins, w, S, key=k, stratified=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)


def test_importance_sampling_onehot_matches():
    R, B, S = 8, 16, 12
    edges = jnp.broadcast_to(jnp.linspace(0.1, 3.0, B + 1), (R, B + 1))
    w = jax.random.uniform(jax.random.PRNGKey(2), (R, B))
    e0, m0 = importance_sampling(edges, w, S)
    e1, m1 = importance_sampling_onehot(edges, w, S)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-5)


# ------------------------------------------------------------ spectral


def test_spectral_field_shapes_and_selector():
    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), neurons=32, layers=2,
        n_levels=4, freqs_per_level=2, num_semantic_classes=5,
        geo_feat_dim=7,
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3), minval=-0.9,
                           maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb, sigma, sem = spectral.forward(params, cfg, x, d)
    assert rgb.shape == (10, 3) and sigma.shape == (10, 1)
    assert sem.shape == (10, 5)
    assert np.all(np.asarray(sigma) >= 0)
    # outside the aabb the selector zeroes density
    x_out = jnp.full((4, 3), 5.0)
    sig_out = spectral.query_density(params, cfg, x_out)
    np.testing.assert_allclose(np.asarray(sig_out), 0.0)


def test_spectral_gradients_flow_to_spectrum():
    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), neurons=16, layers=1,
        n_levels=2, freqs_per_level=2, num_semantic_classes=0,
        geo_feat_dim=3,
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.5,
                           maxval=0.5)

    g = jax.grad(
        lambda p: jnp.sum(spectral.query_density(p, cfg, x))
    )(params)
    assert np.abs(np.asarray(g["W"])).sum() > 0
    assert np.abs(np.asarray(g["mlp_base"]["w0"])).sum() > 0


# -------------------------------------------------------- prop renderer


def test_prop_renderer_miss_rays_get_background():
    from apnerf_tpu.render.prop_renderer import render_rays_prop

    cfg = spectral.SpectralConfig(
        aabb=(-1, -1, -1, 1, 1, 1), neurons=16, layers=1,
        n_levels=2, freqs_per_level=2, num_semantic_classes=3,
        geo_feat_dim=3,
    )
    pcfg = spectral.SpectralDensityConfig(
        aabb=(-1, -1, -1, 1, 1, 1), neurons=8, layers=1,
        n_levels=2, freqs_per_level=2,
    )
    params = spectral.init_spectral(jax.random.PRNGKey(0), cfg)
    pparams = spectral.init_spectral_density(jax.random.PRNGKey(1), pcfg)
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    # rays pointing away from the box
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]]), (4, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    bkgd = jnp.asarray([1.0, 0.5, 0.25])
    outs, p_loss = render_rays_prop(
        lambda pos, dirs: spectral.forward(params, cfg, pos, dirs),
        lambda pos: spectral.query_density_field(pparams, pcfg, pos),
        rays_o, rays_d, aabb, jax.random.PRNGKey(2),
        num_samples=8, num_prop_samples=8, render_bkgd=bkgd,
    )
    np.testing.assert_allclose(
        np.asarray(outs["rgb"]), np.tile(np.asarray(bkgd), (4, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(outs["opacity"]), 0.0, atol=1e-6)
    assert np.isfinite(float(p_loss))


# ------------------------------------------------------ flagship phase


def test_flagship_phase_learns_and_updates_occ():
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_occ_update,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = tiny_cfg()
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    rng = np.random.RandomState(0)
    n = 4
    images = (rng.rand(n, 32, 32, 3) * 255).astype(np.uint8)
    depths = rng.rand(n, 32, 32).astype(np.float32) * 2
    sems = rng.randint(0, cfg.num_semantic_classes, (n, 32, 32))
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    ds.update_data(images, depths, sems, c2ws)

    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    phase_fn = make_flagship_train_phase(cfg)
    pools, counts = pools_from_dataset(ds)
    keys = jax.random.split(jax.random.PRNGKey(1), 40)
    state, losses = phase_fn(
        state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
        pools, counts, jnp.asarray(ds.size, jnp.int32), keys,
        jnp.asarray(1e-3), jnp.asarray(False),
    )
    losses = np.asarray(losses)  # [steps, E]
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[:5].mean(), (
        losses[:5].mean(), losses[-5:].mean()
    )
    assert int(state.step) == 40
    # the phase itself leaves occ untouched (r3: the EMA update runs once
    # per chunk via make_flagship_occ_update, outside the scan)
    assert np.asarray(state.occ.occs).max() == 0
    occ_fn = make_flagship_occ_update(cfg)
    state = occ_fn(state, jax.random.PRNGKey(2), jnp.asarray(1e-3))
    # occupancy EMA ran (planner consumes these binaries)
    assert np.asarray(state.occ.occs).max() > 0


def test_sem_reassociation_parity():
    """sem_hidden + sem_final (accumulate bf16 hidden, final linear after)
    must equal plain per-sample logits accumulation — the final layer is
    linear so the reassociation is exact up to bf16 rounding
    (models/spectral.query_semantic_hidden, volrend.render_outputs)."""
    import jax
    import jax.numpy as jnp

    from apnerf_tpu.models import spectral
    from apnerf_tpu.render.prop_renderer import render_rays_prop

    aabb_t = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    s_cfg = spectral.SpectralConfig(
        aabb=aabb_t, neurons=32, layers=2, n_levels=4, freqs_per_level=2,
        base_freq=4.0, max_freq=32.0, num_semantic_classes=9, fused="off",
    )
    p_cfg = spectral.SpectralDensityConfig(
        aabb=aabb_t, neurons=16, layers=1, max_freq=16.0
    )
    params = {
        "main": spectral.init_spectral(jax.random.PRNGKey(0), s_cfg),
        "prop": spectral.init_spectral_density(jax.random.PRNGKey(1), p_cfg),
    }
    R = 64
    ro = jax.random.uniform(jax.random.PRNGKey(2), (R, 3), minval=-0.5, maxval=0.5)
    rd = jax.random.normal(jax.random.PRNGKey(3), (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    aabb = jnp.asarray(aabb_t, jnp.float32)
    kw = dict(num_samples=16, num_prop_samples=8, near_plane=0.1,
              render_bkgd=jnp.ones(3), stratified=False)
    out0, _ = render_rays_prop(
        lambda p, d: spectral.forward(params["main"], s_cfg, p, d),
        lambda p: spectral.query_density_field(params["prop"], p_cfg, p),
        ro, rd, aabb, jax.random.PRNGKey(7), **kw,
    )
    out1, _ = render_rays_prop(
        lambda p, d: spectral.forward(
            params["main"], s_cfg, p, d, sem_hidden=True
        ),
        lambda p: spectral.query_density_field(params["prop"], p_cfg, p),
        ro, rd, aabb, jax.random.PRNGKey(7),
        sem_final=spectral.semantic_final(params["main"]), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(out0["sem"]), np.asarray(out1["sem"]),
        rtol=2e-2, atol=2e-2,
    )
    # rgb/depth/opacity untouched by the sem path
    np.testing.assert_allclose(
        np.asarray(out0["rgb"]), np.asarray(out1["rgb"]), rtol=1e-6
    )
