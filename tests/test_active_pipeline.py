"""End-to-end active-perception pipeline test on FakeSim (tiny config).

The layer the reference never had (SURVEY.md §4): the full loop —
initial scan → ensemble training → candidate trajectories → predictive
information → fly → retrain — runs on CPU with no Habitat and no GPU.
"""

import os

import numpy as np
import pytest

from apnerf_tpu.config import PipelineConfig
from apnerf_tpu.sim.fake import FakeSim


AABB = (-4.0, 0.0, -4.0, 0.0, 3.0, 0.0)


def tiny_pipeline_cfg(tmp):
    return PipelineConfig(
        save_path=str(tmp),
        aabb=AABB,
        near_plane=0.1,
        main_grid_size=0.25,
        main_neurons=32,
        main_layer=2,
        planning_step=2,
        num_traj=2,
        sample_disc=10,
        training_steps=40,
        render_step_size=0.05,
        alpha_thre=0.01,
        cone_angle=0.0,
        n_ensembles=2,
        img_w=48,
        img_h=48,
        num_rays=128,
        max_samples_train=24,
        max_samples_test=48,
        n_candidates=256,
        n_levels=4,
        n_features=2,
        log2_hashmap_size=11,
        base_resolution=4,
        max_resolution=32,
        geo_feat_dim=7,
        num_semantic_classes=8,
        max_images=256,
        occ_warmup_steps=8,
        occ_every_n=4,
        test_loc=((-2.0, 1.5, -2.0), (-1.0, 1.5, -3.0)),
        global_origin=(-2.0, 1.5, -2.0, 0.0, 0.0, 0.0, 1.0),
    )


@pytest.fixture(scope="module")
def mapper(tmp_path_factory):
    from apnerf_tpu.active.mapper import ActiveNeRFMapper

    tmp = tmp_path_factory.mktemp("run")
    cfg = tiny_pipeline_cfg(tmp)
    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    m = ActiveNeRFMapper(
        cfg, sim, save_path=str(tmp / "out"), seed=9,
        eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
        checkpoint_every=10_000,
    )
    m.initialization(initial_samples=8)
    return m


def test_initialization(mapper):
    assert len(mapper.train_dataset) == 8
    assert len(mapper.test_dataset) == 8  # 2 loc x 4 quat
    # cost map saw free space around the origin
    assert (mapper.cost_map == 0).sum() > 0
    assert mapper.visiting_map.sum() > 0


@pytest.mark.slow
def test_training_reduces_loss_and_evaluates(mapper):
    losses = mapper.nerf_training(60, initial_train=True, planning_step=-1)
    assert losses[-1] < losses[0]
    assert len(mapper.errors_hist) == 1
    ps, depth_err, sem_ce = mapper.errors_hist[0][1:]
    assert np.isfinite(ps) and np.isfinite(depth_err) and np.isfinite(sem_ce)


def test_eval_split_renderer_parity(mapper, monkeypatch):
    """APNERF_EVAL_SPLIT=1 (one jitted view per dispatch — the fallback
    for the remote compile helper OOM-killing the all-views occ eval
    program) must produce the exact same outputs as the all-views
    program."""
    import jax.numpy as jnp

    poses = mapper._test_poses
    oh = ow = 12
    rays = mapper._pose7_to_grid_rays(poses, oh, ow)
    bkgd = jnp.ones(3)
    base = mapper._render_eval(
        mapper.state.params, mapper.state.occ,
        rays.origins, rays.viewdirs, bkgd,
    )
    monkeypatch.setenv("APNERF_EVAL_SPLIT", "1")
    split_render = mapper._build_ensemble_renderer(
        mapper.cfg.max_samples_test, with_variance=False
    )
    split = split_render(
        mapper.state.params, mapper.state.occ,
        rays.origins, rays.viewdirs, bkgd,
    )
    for k in ("rgb", "depth", "opacity", "sem"):
        np.testing.assert_allclose(
            np.asarray(split[k]), np.asarray(base[k]), rtol=1e-6, atol=1e-6
        )
    assert split["n_samples"].shape == base["n_samples"].shape


def test_uncertainty_scoring(mapper):
    traj = np.tile(
        np.array([-2.0, 1.5, -2.0, 0, 0, 0, 1.0]), (40, 1)
    )
    pi = mapper.probablistic_uncertainty(traj, step=1)
    assert np.isfinite(pi)
    assert len(mapper.trajector_uncertainty_list[0]) == 1
    comps = mapper.trajector_uncertainty_list[0][0]
    assert len(comps) == 4 and all(np.isfinite(c) for c in comps)


@pytest.mark.slow
def test_planning_loop_and_artifacts(mapper):
    n_before = len(mapper.train_dataset)
    # like the reference, the loop runs cfg.planning_step steps (=2 here)
    steps = mapper.planning(mapper.cfg.planning_step, training_steps_per_step=20)
    assert steps >= 1
    assert len(mapper.train_dataset) == n_before + 40 * steps  # 40 poses/step
    mapper.save_artifacts()
    out = mapper.save_path
    assert os.path.exists(os.path.join(out, "errors.npy"))
    assert os.path.exists(os.path.join(out, "uncertainty.npy"))
    assert os.path.exists(os.path.join(out, "checkpoints", "model_0.npz"))
    assert os.path.exists(os.path.join(out, "checkpoints", "model_1.npz"))
    assert os.path.exists(os.path.join(out, "maps"))
    # per-step viz artifacts in the reference layout (pipeline.py:918-1023)
    assert os.path.exists(os.path.join(out, "viz", "0.png"))
    assert os.path.exists(os.path.join(out, "viz", "top", "0.png"))
    for sub in ("gt_rgb", "gt_dep", "gt_sem",
                "pd_rgb", "pd_dep", "pd_sem", "pd_occ"):
        assert os.path.exists(os.path.join(out, "viz", "fpv", sub, "0.png")), sub
    # train dataset npz roundtrips with the reference schema
    import glob

    npz = glob.glob(os.path.join(out, "train", "data0.npz"))
    assert npz
    data = np.load(npz[0], allow_pickle=True)
    for k in ("images", "depths", "semantics", "camtoworlds", "K",
              "bootstrap_indices"):
        assert k in data


def test_checkpoint_roundtrip(mapper):
    from apnerf_tpu.active.mapper import ActiveNeRFMapper

    mapper.save_checkpoints()  # independent of the planning test's output
    before = np.asarray(mapper.state.params["main"]["mlp_base"]["w0"])
    cfg = mapper.cfg
    sim = mapper.sim
    m2 = ActiveNeRFMapper(cfg, sim, save_path=mapper.save_path + "_2", seed=1)
    m2.load_checkpoints(os.path.join(mapper.save_path, "checkpoints"))
    after = np.asarray(m2.state.params["main"]["mlp_base"]["w0"])
    np.testing.assert_allclose(before, after)
    np.testing.assert_array_equal(
        np.asarray(mapper.state.occ.binaries), np.asarray(m2.state.occ.binaries)
    )
    # optimizer state (Adam moments + count) and step survive the roundtrip
    # — the reference contract is {occ_grid, model, optimizer_state_dict}
    # (reference scripts/pipeline.py:616-636)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(mapper.state.opt_state),
        jax.tree_util.tree_leaves(m2.state.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(m2.state.step) == int(mapper.state.step)


@pytest.mark.slow
def test_mapper_ngp_occ_parity_path(tmp_path):
    """The reference-parity configuration (NGP hash field + occupancy-grid
    marching) drives the full mapper END-TO-END: train, eval, the whole
    planning loop with viz/maps artifacts, checkpoint, and resume — the
    same coverage the flagship path gets (VERDICT r2 weak #3)."""
    from apnerf_tpu.active.mapper import ActiveNeRFMapper

    cfg = tiny_pipeline_cfg(tmp_path)
    cfg.field_type = "ngp"
    cfg.sampler_type = "occ"
    cfg.planning_step = 1
    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    m = ActiveNeRFMapper(
        cfg, sim, save_path=str(tmp_path / "occ"), seed=1,
        eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
        checkpoint_every=10_000,
    )
    m.initialization(initial_samples=4)
    losses = m.nerf_training(20, initial_train=True, planning_step=-1)
    assert all(np.isfinite(l) for l in losses)
    traj = np.tile(np.array([-2.0, 1.5, -2.0, 0, 0, 0, 1.0]), (40, 1))
    pi = m.probablistic_uncertainty(traj, step=1)
    assert np.isfinite(pi)

    # full planning loop + artifact layout
    n_before = len(m.train_dataset)
    steps = m.planning(1, training_steps_per_step=10)
    assert steps == 1
    assert len(m.train_dataset) == n_before + 40
    m.save_artifacts()
    out = m.save_path
    for rel in (
        "errors.npy", "uncertainty.npy", "checkpoints/model_0.npz",
        "viz/0.png", "viz/top/0.png", "viz/fpv/pd_rgb/0.png", "maps",
    ):
        assert os.path.exists(os.path.join(out, rel)), rel

    # kill-and-resume on the occ path
    m2 = ActiveNeRFMapper(
        cfg, sim, save_path=str(tmp_path / "occ_resume"), seed=3,
        eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
        checkpoint_every=10_000,
    )
    m2.load_checkpoints(os.path.join(out, "checkpoints"))
    np.testing.assert_allclose(
        np.asarray(m.state.params["mlp_base"]["w0"]),
        np.asarray(m2.state.params["mlp_base"]["w0"]),
    )
    m2.train_dataset = m.train_dataset
    m2.test_dataset = m.test_dataset
    m2._test_poses = m._test_poses
    step_before = int(m2.state.step)
    losses = m2.nerf_training(10, planning_step=1, evaluate=False)
    assert int(m2.state.step) == step_before + 10
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_mesh_mapper_e2e(tmp_path):
    """The mesh-mode mapper (sharded flagship phase + sharded candidate
    renderer) runs the full planning loop on the 8-virtual-CPU mesh and
    produces the same artifact layout as the single-device mapper
    (VERDICT r2 missing #3)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.parallel.mesh import make_mesh

    cfg = tiny_pipeline_cfg(tmp_path)
    cfg.planning_step = 1
    mesh = make_mesh(n_ens=2)
    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    with jax.set_mesh(mesh):
        m = ActiveNeRFMapper(
            cfg, sim, save_path=str(tmp_path / "mesh"), seed=9,
            eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
            checkpoint_every=10_000, mesh=mesh,
        )
        m.initialization(initial_samples=8)
        losses = m.nerf_training(40, initial_train=True, planning_step=-1)
        assert losses[-1] < losses[0]
        steps = m.planning(1, training_steps_per_step=10)
        assert steps == 1
        m.save_artifacts()
    out = m.save_path
    for rel in (
        "errors.npy", "uncertainty.npy", "metrics_ext.npy",
        "throughput.json", "checkpoints/model_0.npz",
        "checkpoints/model_1.npz", "viz/0.png", "viz/top/0.png",
        "viz/fpv/pd_rgb/0.png", "maps",
    ):
        assert os.path.exists(os.path.join(out, rel)), rel
    # state stayed ens-sharded through the loop
    shard_shape = (
        m.state.params["main"]["mlp_base"]["w0"]
        .addressable_shards[0].data.shape
    )
    assert shard_shape[0] == 1


@pytest.mark.slow
def test_mesh_mapper_occ_path(tmp_path):
    """Mesh mode on the reference-parity path (NGP hash + occ lattice):
    the sharded occ phase drives train + planning end-to-end on the
    8-virtual-CPU mesh (closes the r3 'mesh covers flagship only' gap)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.parallel.mesh import make_mesh

    cfg = tiny_pipeline_cfg(tmp_path)
    cfg.field_type = "ngp"
    cfg.sampler_type = "occ"
    cfg.planning_step = 1
    mesh = make_mesh(n_ens=2)
    sim = FakeSim(aabb=AABB, img_w=cfg.img_w, img_h=cfg.img_h)
    with jax.set_mesh(mesh):
        m = ActiveNeRFMapper(
            cfg, sim, save_path=str(tmp_path / "mesh_occ"), seed=5,
            eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
            checkpoint_every=10_000, mesh=mesh,
        )
        m.initialization(initial_samples=4)
        losses = m.nerf_training(20, initial_train=True, planning_step=-1)
        assert all(np.isfinite(l) for l in losses)
        steps = m.planning(1, training_steps_per_step=10)
        assert steps == 1
        m.save_artifacts()
    out = m.save_path
    for rel in (
        "errors.npy", "uncertainty.npy", "checkpoints/model_0.npz",
        "viz/0.png", "maps",
    ):
        assert os.path.exists(os.path.join(out, rel)), rel
    # state stayed ens-sharded through the loop
    shard_shape = (
        m.state.params["mlp_base"]["w0"].addressable_shards[0].data.shape
    )
    assert shard_shape[0] == 1


@pytest.mark.slow
def test_resume_continues_training(mapper, tmp_path):
    """Kill-and-resume: a freshly constructed mapper that loads the
    checkpoint can keep training (Adam moments intact, loss finite)."""
    from apnerf_tpu.active.mapper import ActiveNeRFMapper

    mapper.save_checkpoints()
    cfg = mapper.cfg
    m2 = ActiveNeRFMapper(
        cfg, mapper.sim, save_path=str(tmp_path / "resume"), seed=3,
        eval_scale=0.25, unc_scale=0.15, max_samples_unc=32,
        checkpoint_every=10_000,
    )
    m2.load_checkpoints(os.path.join(mapper.save_path, "checkpoints"))
    m2.train_dataset = mapper.train_dataset
    m2.test_dataset = mapper.test_dataset
    m2._test_poses = mapper._test_poses
    step_before = int(m2.state.step)
    losses = m2.nerf_training(10, planning_step=1, evaluate=False)
    assert int(m2.state.step) == step_before + 10
    assert all(np.isfinite(l) for l in losses)


def test_final_refit_divergence_guard(mapper):
    """The final refit's divergence guard: a loss explosion mid-refit
    rolls back to the best state and restarts at a cut LR; a repeat
    explosion stops the refit at the best state (the replayed-trajectory
    collapse class, docs/PERFORMANCE.md 16.88 -> 5.98)."""
    import jax.numpy as jnp

    calls = {"n": 0}
    good_state = {"v": None}
    n_ens = mapper.cfg.n_ensembles

    def stub_phase(cfg, schedule=None):
        def phase(state, *args):
            keys = args[8]
            chunk = keys.shape[0]
            calls["n"] += 1
            if calls["n"] == 3:
                # simulate divergence: corrupt params, explode the loss
                bad = state._replace(
                    params=jax.tree.map(lambda x: x * jnp.nan, state.params)
                )
                return bad, jnp.full((chunk, n_ens), 1e6, jnp.float32)
            loss = 1.0 - 0.01 * calls["n"]
            if good_state["v"] is None:
                good_state["v"] = state
            return (
                state._replace(step=state.step + chunk),
                jnp.full((chunk, n_ens), loss, jnp.float32),
            )

        return phase

    import jax

    orig = mapper._make_phase
    orig_fn = mapper.train_phase_fn
    try:
        mapper._make_phase = stub_phase
        losses = mapper.nerf_training(100, final_train=True, evaluate=False)
        # the exploded chunk was rolled back: no 1e6 entries in the curve,
        # the refit completed all 100 steps, params are finite
        assert len(losses) == 100
        assert max(losses) < 10.0
        # full coverage + at least one redo of the exploded chunk
        # (chunk count derives from steps_per_call — r5 default 100,
        # capped by the tiny cfg's training_steps)
        min_calls = -(-100 // mapper.steps_per_call) + 1
        assert calls["n"] >= min_calls
        leaf = jax.tree_util.tree_leaves(mapper.state.params)[0]
        assert bool(jnp.isfinite(leaf).all())
    finally:
        mapper._make_phase = orig
        mapper.train_phase_fn = orig_fn


def test_final_refit_guard_stops_after_repeat_divergence(mapper):
    """Two LR cuts that both re-diverge stop the refit at the best state
    instead of shipping a collapsed field."""
    import jax
    import jax.numpy as jnp

    calls = {"n": 0}
    n_ens = mapper.cfg.n_ensembles

    def stub_phase(cfg, schedule=None):
        def phase(state, *args):
            keys = args[8]
            chunk = keys.shape[0]
            calls["n"] += 1
            if calls["n"] >= 2:
                bad = state._replace(
                    params=jax.tree.map(lambda x: x * jnp.nan, state.params)
                )
                return bad, jnp.full((chunk, n_ens), jnp.nan, jnp.float32)
            return (
                state._replace(step=state.step + chunk),
                jnp.full((chunk, n_ens), 0.5, jnp.float32),
            )

        return phase

    orig = mapper._make_phase
    orig_fn = mapper.train_phase_fn
    try:
        mapper._make_phase = stub_phase
        losses = mapper.nerf_training(100, final_train=True, evaluate=False)
        # only the first (good) chunk made it into the curve; the state
        # the mapper keeps is the pre-divergence one (finite)
        assert len(losses) < 100
        leaf = jax.tree_util.tree_leaves(mapper.state.params)[0]
        assert bool(jnp.isfinite(leaf).all())
    finally:
        mapper._make_phase = orig
        mapper.train_phase_fn = orig_fn
