"""Train-step tests: ensemble step runs, losses drop, NaN skip, schedules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apnerf_tpu.config import PipelineConfig
from apnerf_tpu.data.dataset import RayDataset
from apnerf_tpu.train.schedule import cyclic_lr, multistep_lr
from apnerf_tpu.train.step import init_ensemble, make_train_step


def tiny_cfg(**kw):
    base = dict(
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        img_w=32,
        img_h=32,
        num_rays=64,
        max_samples_train=16,
        n_candidates=128,
        render_step_size=0.05,
        cone_angle=0.0,
        near_plane=0.1,
        main_grid_size=0.25,
        main_neurons=16,
        main_layer=1,
        n_levels=4,
        n_features=2,
        log2_hashmap_size=10,
        base_resolution=4,
        max_resolution=16,
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


def synthetic_obs(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    images = (rng.rand(n, h, w, 3) * 255).astype(np.uint8)
    depths = rng.rand(n, h, w).astype(np.float32) * 2
    sems = rng.randint(0, 4, (n, h, w))
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2ws[:, :3, 3] = rng.rand(n, 3) * 0.2
    return images, depths, sems, c2ws


def test_schedules():
    sched = cyclic_lr(1e-4, 1e-3, 500)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(250)), 5.5e-4, rtol=1e-5)

    ms = multistep_lr(1e-3, [300, 800])
    np.testing.assert_allclose(float(ms(0)), 1e-3)
    np.testing.assert_allclose(float(ms(300)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(ms(900)), 1e-5, rtol=1e-6)


def test_occ_thre_schedule():
    cfg = tiny_cfg()
    assert cfg.occ_thre_for_phase(-1) == 1e-3
    assert cfg.occ_thre_for_phase(-10) == 1e-2
    assert cfg.occ_thre_for_phase(3) == 1e-3
    assert cfg.occ_thre_for_phase(7) == 3e-3


def test_train_step_runs_and_learns():
    cfg = tiny_cfg()
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    ds.update_data(*synthetic_obs(4, cfg.img_h, cfg.img_w))
    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(ds.sample_image_indices(False, cfg.sample_disc))
        out = step_fn(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            idx, sub, jnp.asarray(1e-3),
        )
        state = out.state
        losses.append(np.array(out.loss))
        assert not np.array(out.skipped).any()
    losses = np.array(losses)  # [steps, E]
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[:5].mean()
    assert int(state.step) == 30


def test_nan_grad_step_is_skipped():
    """Inject a NaN into member 1's params: its grads go non-finite, the
    step must be flagged skipped and leave that member's params AND
    optimizer state bit-identical (pipeline.py:518-532 semantics), while
    member 0 still trains. Locks the reduction-only guard (no
    nan_to_num): NaN updates must not leak through the keep-select."""
    cfg = tiny_cfg()
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
    )
    ds.update_data(*synthetic_obs(4, cfg.img_h, cfg.img_w))
    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    w = np.array(state.params["mlp_base"]["w0"])
    w[1].flat[0] = np.nan
    params = dict(state.params)
    params["mlp_base"] = dict(state.params["mlp_base"], w0=jnp.asarray(w))
    state = state._replace(params=params)
    mu_before = np.array(state.opt_state[0].mu["mlp_base"]["w0"])

    step_fn = make_train_step(cfg)
    idx = jnp.asarray(ds.sample_image_indices(False, cfg.sample_disc))
    out = step_fn(
        state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
        idx, jax.random.PRNGKey(3), jnp.asarray(1e-3),
    )
    skipped = np.array(out.skipped)
    assert skipped[1], "poisoned member must skip"
    assert not skipped[0], "clean member must train"
    w_after = np.array(out.state.params["mlp_base"]["w0"])
    np.testing.assert_array_equal(w_after[1], w[1])  # untouched (NaN stays)
    assert not np.array_equal(w_after[0], w[0])  # member 0 updated
    mu_after = np.array(out.state.opt_state[0].mu["mlp_base"]["w0"])
    np.testing.assert_array_equal(mu_after[1], mu_before[1])
    assert np.isfinite(mu_after).all()  # no NaN leaked into Adam moments
    assert not np.array_equal(mu_after[0], mu_before[0])


def test_ensemble_members_diverge():
    cfg = tiny_cfg()
    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    w0 = np.array(state.params["mlp_base"]["w0"])
    assert not np.allclose(w0[0], w0[1])


def test_dataset_store_and_bootstrap():
    cfg = tiny_cfg()
    ds = RayDataset(
        training=True, num_models=3, width=cfg.img_w, height=cfg.img_h,
        max_images=8,
    )
    ds.update_data(*synthetic_obs(4, cfg.img_h, cfg.img_w))
    assert len(ds) == 4
    assert list(ds.bootstrap(0)) == [0, 1, 2, 3]
    b1 = ds.bootstrap(1)
    assert len(b1) == int(4 * 0.7)
    assert (b1 >= 0).all() and (b1 < 4).all()
    ds.update_data(*synthetic_obs(2, cfg.img_h, cfg.img_w, seed=1))
    assert len(ds) == 6
    b1b = ds.bootstrap(1)
    assert len(b1b) == int(4 * 0.7) + int(2 * 0.7)
    assert (b1b[len(b1):] >= 4).all()  # new draws index the new images


def test_dataset_save_load_roundtrip(tmp_path):
    cfg = tiny_cfg()
    ds = RayDataset(
        training=True, save_fp=str(tmp_path), num_models=2,
        width=cfg.img_w, height=cfg.img_h, max_images=8,
    )
    obs = synthetic_obs(3, cfg.img_h, cfg.img_w)
    ds.update_data(*obs)
    path = ds.save()
    ds2 = RayDataset.load(path, num_models=2)
    assert len(ds2) == 3
    np.testing.assert_array_equal(np.array(ds2.images[:3]), obs[0])
    np.testing.assert_array_equal(np.array(ds2.semantics[:3]), obs[2])
    np.testing.assert_allclose(np.array(ds2.camtoworlds[:3]), obs[3])


def test_capacity_guard():
    ds = RayDataset(training=True, width=8, height=8, max_images=2)
    with pytest.raises(ValueError):
        ds.update_data(*synthetic_obs(3, 8, 8))
