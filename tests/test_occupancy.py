"""Occupancy-grid estimator tests (EMA update, binarization, cadence).

Oracle: the documented semantics of ``occ_grid.py:377-437`` — EMA
max-update, thresholding at clamp(mean of visible occs, occ_thre).
"""

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.ops.occupancy import (
    init_occ_grid,
    maybe_update_occ_grid,
    update_occ_grid,
)


AABB = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]


def test_warmup_updates_all_cells():
    state = init_occ_grid(AABB, (4, 4, 4))

    # occupancy 1.0 inside a corner sub-box, 0 elsewhere
    def occ_fn(x):
        return jnp.where(jnp.all(x < 0.5, axis=-1), 1.0, 0.0)[..., None]

    state = update_occ_grid(
        state, occ_fn, jax.random.PRNGKey(0), jnp.asarray(0), occ_thre=1e-2
    )
    binaries = np.array(state.binaries)
    # all cells fully inside the sub-box must be occupied
    assert binaries[0, 0, 0]
    assert not binaries[3, 3, 3]
    # mean thresholding: thre = min(mean, 1e-2); occupied cells have occ=1
    occs = np.array(state.occs).reshape(4, 4, 4)
    assert occs[0, 0, 0] == 1.0


def test_ema_decay():
    state = init_occ_grid(AABB, (4, 4, 4))
    one = lambda x: jnp.ones(x.shape[:-1] + (1,))
    zero = lambda x: jnp.zeros(x.shape[:-1] + (1,))
    k = jax.random.PRNGKey(0)
    state = update_occ_grid(state, one, k, jnp.asarray(0))
    np.testing.assert_allclose(np.array(state.occs), 1.0)
    # warmup: all cells decay by 0.95 when the field answers 0
    state = update_occ_grid(state, zero, k, jnp.asarray(1))
    np.testing.assert_allclose(np.array(state.occs), 0.95, rtol=1e-6)


def test_post_warmup_partial_update():
    state = init_occ_grid(AABB, (8, 8, 8))
    one = lambda x: jnp.ones(x.shape[:-1] + (1,))
    state = update_occ_grid(
        state, one, jax.random.PRNGKey(1), jnp.asarray(300)
    )  # past warmup
    occs = np.array(state.occs)
    # only a subset (≤ 2 * n/4 distinct cells) was touched
    assert 0 < (occs > 0).sum() <= 2 * (512 // 4)


def test_update_cadence():
    state = init_occ_grid(AABB, (4, 4, 4))
    one = lambda x: jnp.ones(x.shape[:-1] + (1,))
    k = jax.random.PRNGKey(0)
    s1 = maybe_update_occ_grid(state, one, k, jnp.asarray(1), 1e-2)
    np.testing.assert_allclose(np.array(s1.occs), 0.0)  # step 1: no update
    s16 = maybe_update_occ_grid(state, one, k, jnp.asarray(16), 1e-2)
    np.testing.assert_allclose(np.array(s16.occs), 1.0)  # step 16: update


def test_threshold_clamped_by_occ_thre():
    state = init_occ_grid(AABB, (4, 4, 4))

    def occ_fn(x):
        # all cells get occ = 0.5 → mean = 0.5 > occ_thre = 0.01
        return jnp.full(x.shape[:-1] + (1,), 0.5)

    state = update_occ_grid(
        state, occ_fn, jax.random.PRNGKey(0), jnp.asarray(0), occ_thre=1e-2
    )
    # thre = min(0.5, 0.01) = 0.01; occ 0.5 > 0.01 → everything occupied
    assert np.array(state.binaries).all()


def test_update_is_jittable_and_vmappable():
    def occ_fn(x):
        return jnp.where(jnp.all(x < 0.5, axis=-1), 1.0, 0.0)[..., None]

    states = jax.vmap(lambda _: init_occ_grid(AABB, (4, 4, 4)))(jnp.arange(2))

    @jax.jit
    def step(states, key):
        keys = jax.random.split(key, 2)
        return jax.vmap(
            lambda s, k: update_occ_grid(s, occ_fn, k, jnp.asarray(0))
        )(states, keys)

    out = step(states, jax.random.PRNGKey(0))
    assert out.binaries.shape == (2, 4, 4, 4)
    assert np.array(out.binaries[:, 0, 0, 0]).all()


def test_mark_invisible_cells_frustum_semantics():
    """Cells behind or outside every camera get occ = -1 and can never be
    occupied by the EMA update (``occ_grid.py:279-343``)."""
    from apnerf_tpu.ops.occupancy import mark_invisible_cells
    from apnerf_tpu.ops.rays import make_intrinsics

    state = init_occ_grid(AABB, (8, 8, 8))
    W = H = 32
    K = jnp.asarray(make_intrinsics(W, H, np.pi / 2))
    # one OpenGL camera at the +z face center looking down -z (into the box)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, 0.5, 1.0]
    marked = mark_invisible_cells(
        state, K, jnp.asarray(c2w)[None], W, H, near_plane=0.05
    )
    occs = np.asarray(marked.occs).reshape(8, 8, 8)
    # cells in front of the camera (z < 1) near the axis are visible
    assert occs[4, 4, 2] == 0.0
    # the hfov=90deg frustum from z=1.0 cannot cover the far corners of
    # the near face
    assert occs[0, 0, 7] == -1.0
    # invisible cells never become occupied
    after = update_occ_grid(
        marked, lambda x: jnp.ones(x.shape[:-1] + (1,)),
        jax.random.PRNGKey(0), jnp.asarray(0), occ_thre=1e-2,
    )
    occs_a = np.asarray(after.occs).reshape(8, 8, 8)
    bin_a = np.asarray(after.binaries)
    assert occs_a[0, 0, 7] == -1.0 and not bin_a[0, 0, 7]
    assert bin_a[4, 4, 2]


def test_mark_invisible_wired_into_initialization():
    """cfg.mark_invisible=True marks never-observed cells at init."""
    import tests.test_active_pipeline as tap
    from apnerf_tpu.active.mapper import ActiveNeRFMapper
    from apnerf_tpu.sim.fake import FakeSim
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        cfg = tap.tiny_pipeline_cfg(tmp)
        cfg.mark_invisible = True
        sim = FakeSim(aabb=tap.AABB, img_w=cfg.img_w, img_h=cfg.img_h)
        m = ActiveNeRFMapper(cfg, sim, save_path=tmp + "/out", seed=0)
        m.initialization(initial_samples=4)
        occs = np.asarray(m.state.occ.occs)
        assert (occs == -1.0).any(), "some cells should be invisible"
        assert (occs == 0.0).any(), "some cells should be visible"
