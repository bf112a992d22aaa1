"""Combined loss+grad Pallas kernel vs the autodiff oracle.

``ops/pallas/fused_field_volrend.fused_field_volrend_lossgrad`` runs the
ENTIRE train render — field, volume rendering, the 3-term loss
(train/flagship.py loss_fn: huber rgb/depth + softmax CE), and the full
parameter backward — in one kernel pass, deleting the separate forward
kernel from the train step. These tests pin its loss values and gradients
to ``jax.value_and_grad`` over the unfused XLA chain (interpret mode on
CPU), and pin the flagship member core's fused branch to the autodiff
branch end-to-end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from apnerf_tpu.models import spectral
from apnerf_tpu.ops import volrend

R, S = 128, 8
LOSS_W = (10.0, 1.0 / 5.0, 1.0 / 2.0)


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
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), 7)
    pos = jax.random.uniform(keys[0], (R, S, 3), minval=-1.3, maxval=1.3)
    dirs = jax.random.normal(keys[1], (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    edges = jnp.sort(
        jax.random.uniform(keys[2], (R, S + 1), minval=0.1, maxval=3.0),
        axis=-1,
    )
    t0, t1 = edges[:, :-1], edges[:, 1:]
    miss = (jnp.arange(R) % 17) == 0
    pix = jax.random.uniform(keys[3], (R, 3))
    # depth targets far enough to exercise huber's linear branch too
    dgt = jax.random.uniform(keys[4], (R,), minval=0.0, maxval=4.0)
    lab = jax.random.randint(
        keys[5], (R,), 0, cfg.num_semantic_classes
    )
    bkgd = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    return cfg, params, pos, dirs, t0, t1, miss, pix, dgt, lab, bkgd


def _oracle_loss(params, cfg, pos, rays_d, t0, t1, miss, pix, dgt, lab,
                 bkgd):
    """train/flagship.py loss_fn over the unfused XLA chain."""
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    rgb, density, sem = spectral.forward(params, cfg, pos, dirs)
    sigmas = density[..., 0] * (~miss[:, None])
    w, _, _ = volrend.render_weight_from_density(t0, t1, sigmas)
    t_mid = 0.5 * (t0 + t1)
    rgb_acc = jnp.einsum("rs,rsc->rc", w, rgb)
    op = jnp.sum(w, axis=-1, keepdims=True)
    depth = jnp.einsum("rs,rs->r", w, t_mid)[:, None] / jnp.clip(
        op, min=jnp.finfo(jnp.float32).eps
    )
    sem_acc = jnp.einsum("rs,rsc->rc", w, sem)
    rgb_full = rgb_acc + bkgd * (1.0 - op)
    l_rgb = jnp.mean(optax.huber_loss(rgb_full, pix))
    l_dep = jnp.mean(optax.huber_loss(depth[:, 0], dgt))
    l_sem = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(sem_acc, lab)
    )
    loss = LOSS_W[0] * l_rgb + LOSS_W[1] * l_dep + LOSS_W[2] * l_sem
    return loss, (l_rgb, l_dep, l_sem, w)


@pytest.mark.parametrize("layers", [2, 3])
def test_lossgrad_matches_autodiff(layers):
    (cfg, params, pos, dirs, t0, t1, miss, pix, dgt, lab,
     bkgd) = _setup(layers=layers)
    lossrows, w, grads = spectral.forward_packed_lossgrad(
        params, cfg, pos, dirs, t0, t1, miss, pix, dgt, lab, bkgd,
        loss_weights=LOSS_W,
    )
    assert lossrows.shape == (3, R)
    assert w.shape == (R, S)

    (loss_ref, (l_rgb, l_dep, l_sem, w_ref)), grads_ref = (
        jax.value_and_grad(
            lambda p: _oracle_loss(
                p, cfg, pos, dirs, t0, t1, miss, pix, dgt, lab, bkgd
            ),
            has_aux=True,
        )(params)
    )
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(w_ref), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        float(jnp.sum(lossrows[0]) / (3 * R)), float(l_rgb),
        rtol=3e-2, atol=3e-3,
    )
    np.testing.assert_allclose(
        float(jnp.sum(lossrows[1]) / R), float(l_dep),
        rtol=3e-2, atol=3e-3,
    )
    np.testing.assert_allclose(
        float(jnp.sum(lossrows[2]) / R), float(l_sem),
        rtol=3e-2, atol=3e-3,
    )
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(grads_ref))
    for path, a in jax.tree_util.tree_leaves_with_path(grads):
        b = flat_ref[path]
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=str(path))


@pytest.mark.slow
def test_member_core_fused_branch_matches_autodiff(monkeypatch):
    """make_flagship_member_core's combined-kernel branch vs its autodiff
    branch: same loss/aux and parameter updates (same RNG, same batch)."""
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayBatch
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_member_core,
    )

    cfg = PipelineConfig(
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        img_w=32, img_h=32, num_rays=128, max_samples_train=8,
        num_prop_samples=8, num_semantic_classes=5, n_ensembles=1,
        max_images=4, n_levels=4, spectral_freqs_per_level=2,
        base_resolution=4, max_resolution=32, spectral_neurons=32,
        spectral_layers=3, geo_feat_dim=7,
    )
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    p0 = jax.tree.map(lambda x: x[0], state.params)
    o0 = jax.tree.map(lambda x: x[0], state.opt_state)
    occ0 = jax.tree.map(lambda x: x[0], state.occ)
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    origins = jax.random.uniform(keys[0], (128, 3), minval=-2, maxval=2)
    vd = jax.random.normal(keys[1], (128, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    batch = RayBatch(
        origins=origins, viewdirs=vd,
        pixels=jax.random.uniform(keys[2], (128, 3)),
        depth=jax.random.uniform(keys[3], (128,), minval=0.1, maxval=3.0),
        sem=jax.random.randint(keys[4], (128,), 0, 5),
        color_bkgd=jnp.ones(3),
    )
    k_occ = keys[5]
    step = jnp.asarray(0)
    thre = jnp.asarray(1e-3)

    monkeypatch.setenv("APNERF_FUSED_LOSSGRAD", "0")
    core_ref = make_flagship_member_core(cfg)
    out_ref = core_ref(p0, o0, occ0, batch, k_occ, step, thre)

    # force the fused branch on CPU (interpret mode)
    monkeypatch.setenv("APNERF_FUSED_LOSSGRAD", "1")
    monkeypatch.setenv("APNERF_FUSED_VR", "1")
    core_lg = make_flagship_member_core(cfg)
    out_lg = core_lg(p0, o0, occ0, batch, k_occ, step, thre)

    # loss + per-term aux agree (bf16 kernel vs f32-accumulated XLA)
    for a, b, name in [
        (out_lg[3], out_ref[3], "loss"),
        (out_lg[4], out_ref[4], "l_rgb"),
        (out_lg[5], out_ref[5], "l_dep"),
        (out_lg[6], out_ref[6], "l_sem"),
        (out_lg[7], out_ref[7], "n_samples"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-3,
            err_msg=name,
        )
    # updated params agree on the tensor scale
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(out_ref[0]))
    for path, a in jax.tree_util.tree_leaves_with_path(out_lg[0]):
        b = flat_ref[path]
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-2,
                                   err_msg=str(path))


def test_use_packed_lossgrad_gate(monkeypatch):
    cfg, params, *_ = _setup()
    assert not spectral.use_packed_lossgrad(cfg, params, R, S)
    monkeypatch.setenv("APNERF_FUSED_VR", "1")
    assert spectral.use_packed_lossgrad(cfg, params, R, S)
    monkeypatch.setenv("APNERF_FUSED_LOSSGRAD", "0")
    assert not spectral.use_packed_lossgrad(cfg, params, R, S)
    monkeypatch.delenv("APNERF_FUSED_LOSSGRAD")
    # no semantic classes -> the in-kernel CE cannot apply
    cfg_nosem = _cfg(num_semantic_classes=0)
    assert not spectral.use_packed_lossgrad(cfg_nosem, params, R, S)


@pytest.mark.slow
def test_prop_reuse_matches_recompute(monkeypatch):
    """APNERF_PROP_REUSE=1 (vjp through the sampling forward) must match
    the recompute path (a second prop-MLP eval at the same level-0
    midpoints) — identical ops, so loss and updated prop params agree
    tightly."""
    from apnerf_tpu.config import PipelineConfig
    from apnerf_tpu.data.dataset import RayBatch
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_member_core,
    )

    cfg = PipelineConfig(
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        img_w=32, img_h=32, num_rays=128, max_samples_train=8,
        num_prop_samples=8, num_semantic_classes=5, n_ensembles=1,
        max_images=4, n_levels=4, spectral_freqs_per_level=2,
        base_resolution=4, max_resolution=32, spectral_neurons=32,
        spectral_layers=3, geo_feat_dim=7,
    )
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    p0 = jax.tree.map(lambda x: x[0], state.params)
    o0 = jax.tree.map(lambda x: x[0], state.opt_state)
    occ0 = jax.tree.map(lambda x: x[0], state.occ)
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    origins = jax.random.uniform(keys[0], (128, 3), minval=-2, maxval=2)
    vd = jax.random.normal(keys[1], (128, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    batch = RayBatch(
        origins=origins, viewdirs=vd,
        pixels=jax.random.uniform(keys[2], (128, 3)),
        depth=jax.random.uniform(keys[3], (128,), minval=0.1, maxval=3.0),
        sem=jax.random.randint(keys[4], (128,), 0, 5),
        color_bkgd=jnp.ones(3),
    )
    args = (p0, o0, occ0, batch, keys[5], jnp.asarray(0), jnp.asarray(1e-3))

    monkeypatch.setenv("APNERF_FUSED_LOSSGRAD", "1")
    monkeypatch.setenv("APNERF_FUSED_VR", "1")
    monkeypatch.setenv("APNERF_PROP_REUSE", "0")
    out_rec = make_flagship_member_core(cfg)(*args)
    monkeypatch.setenv("APNERF_PROP_REUSE", "1")
    out_reuse = make_flagship_member_core(cfg)(*args)

    np.testing.assert_allclose(
        np.asarray(out_reuse[3]), np.asarray(out_rec[3]), rtol=1e-5,
        err_msg="loss",
    )
    flat_rec = dict(jax.tree_util.tree_leaves_with_path(out_rec[0]["prop"]))
    for path, a in jax.tree_util.tree_leaves_with_path(out_reuse[0]["prop"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_rec[path]), rtol=1e-4,
            atol=1e-6, err_msg=str(path),
        )
