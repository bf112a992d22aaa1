"""ActiveNeRFMapper — the top-level active-perception loop.

Capability parity with the reference orchestrator
(``scripts/pipeline.py:91-1274``), re-structured so all hot compute is a
handful of jitted programs built once in ``__init__``:

  * ``initialization``: 39-pose 360° scan with ±0.2 m uniform jitter
    (``pipeline.py:245-264``), per-view cost-map fusion (``:272-292``),
    train + 56-view test datasets (``:294-350``).
  * ``nerf_training``: the ensemble train loop (``:354-664``) — here one
    jitted vmapped step per iteration; occ-threshold schedule by phase
    (``:447-470``); periodic checkpoints (``:616-636``).
  * ``planning``: candidate-trajectory sampling → predictive-information
    scoring → fly best → observe → cost-map + dataset update → retrain
    (``:1025-1224``); stop when max-mean uncertainty stays above 0.05 for
    5 consecutive steps (``:1216-1224``).
  * ``pipeline``: init → train → plan → 5x final train → save artifacts
    (``:1226-1274``) with the reference's on-disk layout (SURVEY.md §5).

Documented fixes vs the reference (SURVEY.md §7 "known quirks"):
  * The reference's in-training eval blocks are dead code
    (``step == steps + 1`` never holds, ``pipeline.py:538,638``), leaving
    ``errors.npy`` empty. Here evaluation actually runs at the end of each
    ``nerf_training`` call (same cadence the dead code intended).
  * ``n_ensembles`` members train *in parallel* via vmap, not sequentially.
"""

from __future__ import annotations

import datetime
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..data.dataset import RayDataset
from ..models import ngp
from ..ops.grid_march import candidate_lattice
from ..ops.rays import Rays, make_intrinsics, pose_matrix_from_quat
from ..planning.cost_map import depth_scan_angles, update_cost_map
from ..planning.traj import sample_traj
from ..render.renderer import render_rays
from ..train.schedule import multistep_lr
from ..train.step import (
    EnsembleState,
    init_ensemble,
    make_ngp_config,
    make_train_step,
    reset_opt_state,
)
from ..utils.metrics import depth_mse, psnr, semantic_ce
from .uncertainty import predictive_information


def _euler_yzx_yaw(R_m: np.ndarray) -> float:
    """Yaw (rotation about world y) matching scipy's
    ``R.from_matrix(R).as_euler("yzx")[0]`` used by the reference
    (``pipeline.py:276-279``)."""
    # yzx intrinsic: first angle about y
    return float(np.arctan2(-R_m[2, 0], R_m[0, 0]))


def _yaw_quat_deg(angle_deg: float) -> np.ndarray:
    a = np.deg2rad(angle_deg) / 2
    return np.array([0.0, np.sin(a), 0.0, np.cos(a)])


class ActiveNeRFMapper:
    def __init__(
        self,
        cfg: PipelineConfig,
        sim,
        save_path: Optional[str] = None,
        seed: int = 9,
        eval_scale: float = 0.25,
        unc_scale: float = 0.1,
        max_samples_unc: int = 256,
        checkpoint_every: int = 1000,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with ("ens", "data")
        axes (``parallel/mesh.make_mesh``). When given, the train phase and
        the candidate/eval renderers run sharded — members over ``ens``,
        rays over ``data`` — and the ensemble state + observation stores
        are placed accordingly. Flagship (spectral+prop) path only; the
        reference has no distributed mode at all (SURVEY.md §2.5)."""
        self.cfg = cfg
        self.sim = sim
        self.mesh = mesh
        self.save_path = save_path or os.path.join(
            cfg.save_path, datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        )
        os.makedirs(self.save_path, exist_ok=True)
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        self.eval_scale = eval_scale
        self.unc_scale = unc_scale
        self.max_samples_unc = max_samples_unc
        self.checkpoint_every = checkpoint_every

        # field/sampler selection: "spectral"+"prop" is the TPU flagship
        # (models/spectral.py, render/prop_renderer.py); "ngp"+"occ" is the
        # exact reference-parity path. Mixed combinations are not wired.
        if (cfg.field_type, cfg.sampler_type) not in (
            ("spectral", "prop"), ("ngp", "occ")
        ):
            raise ValueError(
                "supported (field_type, sampler_type): (spectral, prop) "
                f"or (ngp, occ); got ({cfg.field_type}, {cfg.sampler_type})"
            )
        self.use_prop = cfg.sampler_type == "prop"
        from ..train.phase import make_train_phase
        from ..train.schedule import cyclic_lr

        if self.use_prop:
            from ..train.flagship import (
                init_flagship_ensemble,
                make_flagship_train_phase,
                make_prop_config,
                make_spectral_config,
            )

            from ..train.flagship import make_flagship_occ_update

            # Mesh mode: the TRAIN phase runs under shard_map, where the
            # program is per-device — the fused Pallas field kernel works
            # unchanged on each device's local rays (r4; previously mesh
            # forced fused_field="off" because GSPMD has no pallas_call
            # partitioning rule). The GSPMD-sharded paths that remain
            # (candidate/eval renderers, occ EMA update) still need the
            # plain XLA chain, so they build from ``cfg_gspmd``.
            import dataclasses

            cfg_gspmd = (
                dataclasses.replace(cfg, fused_field="off")
                if mesh is not None else cfg
            )
            self._cfg_gspmd = cfg_gspmd
            self.spectral_cfg = make_spectral_config(cfg_gspmd)
            self.prop_cfg = make_prop_config(cfg)
            self.state: EnsembleState = init_flagship_ensemble(
                self._next_key(), cfg
            )
            self._make_phase = make_flagship_train_phase
            # flagship occ EMA runs once per scan chunk, outside the scan
            # (train/flagship.py make_flagship_occ_update)
            self._occ_update_fn = make_flagship_occ_update(cfg_gspmd)
            if mesh is not None:
                from ..parallel.mesh import shard_ensemble_state
                from ..parallel.sharding import make_shardmap_flagship_phase

                self._make_phase = partial(
                    make_shardmap_flagship_phase, mesh=mesh
                )
                self.state = shard_ensemble_state(self.state, mesh)
        else:
            self.ngp_cfg = make_ngp_config(cfg)
            self.state = init_ensemble(self._next_key(), cfg)
            self._make_phase = make_train_phase
            self._occ_update_fn = None  # occ path updates in-scan
            if mesh is not None:
                # occ path under GSPMD: members over "ens", rays over
                # "data" (parallel/sharding.make_sharded_occ_phase).
                # The renderers stay on the plain GSPMD chain (they
                # consume the occ grid, which the flagship sharded
                # renderers ignore).
                from ..parallel.mesh import shard_ensemble_state
                from ..parallel.sharding import make_sharded_occ_phase

                self._make_phase = partial(make_sharded_occ_phase, mesh=mesh)
                self.state = shard_ensemble_state(self.state, mesh)

        # the active LR schedule — swapped by nerf_training(final_train=True)
        if self.use_prop:
            from ..train.flagship import default_spectral_schedule

            self._schedule = default_spectral_schedule(cfg)
        else:
            self._schedule = cyclic_lr(
                cfg.lr_base, cfg.lr, max(cfg.training_steps // 4, 1)
            )
        self.train_phase_fn = self._make_phase(cfg)
        # steps per compiled scan chunk: large enough to amortize dispatch,
        # small enough to keep checkpoint/LR bookkeeping cadence. The occ
        # path caps at 5: the full bisect sweep (scripts/bisect_occ_fault
        # .py, 2026-08-17, docs/PERFORMANCE.md "occ-path TPU fault") shows
        # any >=10-step scan containing the HASH FIELD crashes the v5e
        # worker — with or without lattice march / compaction / occ
        # update — while every hash-free program runs 25-step chunks
        # cleanly. The cap is a workaround for the hash gather/scatter
        # fault, not a traversal property.
        # Flagship chunk default 100 (r5): at 25 the ~30 ms per-call
        # readback floor plus the ~40 ms per-chunk occ update cost
        # ~1.9 ms/step against an 8.3 ms device step; 100-step chunks
        # measured 3.03x vs 2.88x same-sitting (scripts/r5_batch_a.sh;
        # 250 was parity with 100). Occ-EMA cadence moves with the chunk
        # (~100 steps — planner-only consumer, see make_flagship_occ_update).
        cap = (
            int(os.environ.get("APNERF_CHUNK", "100"))
            if self.use_prop else 5
        )
        self.steps_per_call = min(cap, max(cfg.training_steps, 1))

        aabb = np.asarray(cfg.aabb)
        res = cfg.main_grid_resolution
        # cost map over (x, z) (pipeline.py:123-126)
        self.cost_map = np.full((res[0], res[2]), 0.5)
        self.visiting_map = np.zeros(self.cost_map.shape)
        self.align_angles = depth_scan_angles(cfg.img_w)
        self.global_origin = np.asarray(cfg.global_origin, dtype=np.float64)
        self.current_pose = self.global_origin.copy()
        self.focal = cfg.focal
        self.K = jnp.asarray(make_intrinsics(cfg.img_w, cfg.img_h, cfg.hfov))

        self.lattice = jnp.asarray(
            candidate_lattice(
                cfg.n_candidates, cfg.near_plane, cfg.render_step_size,
                cfg.cone_angle,
            )
        )
        self.train_dataset: Optional[RayDataset] = None
        self.test_dataset: Optional[RayDataset] = None
        self.errors_hist: List[List[float]] = []
        # [planning_step, LPIPS(VGG), mIoU] per eval (reference tracks
        # LPIPS in its dead eval blocks, pipeline.py:596-613)
        self.metrics_ext_hist: List[List[float]] = []
        self.learning_rate_lst: List[float] = []
        self.trajector_uncertainty_list: List[List[List[float]]] = [
            [] for _ in range(cfg.planning_step)
        ]
        self.policy_type = "uncertainty"  # pipeline.py:140-143
        # overlapped planning loop (see planning()): host sample_traj runs
        # while the device trains; False restores strict alternation
        self.overlap_planning = True
        # per-planning-step visualization dumps (pipeline.py:918-1023)
        self.save_viz = True
        self.viz_scale = eval_scale
        self.sim_step = 0
        # per-phase wall-clock + samples/s (written to throughput.json by
        # save_artifacts; the reference has no throughput observability)
        self.throughput_log: List[dict] = []
        self.profile_dir: Optional[str] = None

        # jitted ensemble renderers, built once. Signature:
        # render(params, occ, origins [V,P,3], viewdirs, bkgd, key=None)
        # — key seeds the sampler (None → deterministic PRNGKey(0),
        # matching the reference's test-mode rendering).
        if mesh is not None and self.use_prop:
            from ..parallel.sharding import make_sharded_candidate_renderer

            r_unc = make_sharded_candidate_renderer(
                self._cfg_gspmd, mesh, max_samples_unc, with_variance=True
            )
            r_eval = make_sharded_candidate_renderer(
                self._cfg_gspmd, mesh, cfg.max_samples_test,
                with_variance=False,
            )
            # the sharded renderer ignores occ (flagship path: the grid is
            # planner-only state, not in the sampling path)
            self._render_unc = (
                lambda params, occ, o, v, bkgd, key=None:
                r_unc(params, o, v, bkgd, key)
            )
            self._render_eval = (
                lambda params, occ, o, v, bkgd, key=None:
                r_eval(params, o, v, bkgd, key)
            )
        else:
            self._render_unc = self._build_ensemble_renderer(
                max_samples_unc, with_variance=True
            )
            self._render_eval = self._build_ensemble_renderer(
                cfg.max_samples_test, with_variance=False
            )

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _build_ensemble_renderer(self, max_samples: int, with_variance: bool):
        cfg, lattice = self.cfg, self.lattice

        if self.use_prop:
            from ..models import spectral
            from ..render.prop_renderer import render_rays_prop

            s_cfg, p_cfg = self.spectral_cfg, self.prop_cfg
            aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)

            import os as _os

            @jax.jit
            def render_jit(params, occ, origins, viewdirs, bkgd, key):
                reassoc = _os.environ.get("APNERF_SEM_REASSOC", "0") == "1"

                def member(p, o):
                    def field_fn(pos, dirs):
                        return spectral.forward(
                            p["main"], s_cfg, pos, dirs, sem_hidden=reassoc
                        )

                    def prop_fn(pos):
                        return spectral.query_density_field(
                            p["prop"], p_cfg, pos
                        )

                    def one_view(rays):
                        ro, rd = rays
                        outs, _ = render_rays_prop(
                            field_fn, prop_fn, ro, rd, aabb, key,
                            num_samples=max_samples,
                            num_prop_samples=cfg.num_prop_samples,
                            near_plane=cfg.near_plane,
                            render_bkgd=bkgd, stratified=False,
                            with_variance=with_variance,
                            sem_final=(
                                spectral.semantic_final(p["main"])
                                if reassoc else None
                            ),
                        )
                        return outs

                    return jax.lax.map(one_view, (origins, viewdirs))

                return jax.vmap(member)(params, occ)

            def render(params, occ, origins, viewdirs, bkgd, key=None):
                if key is None:
                    key = jax.random.PRNGKey(0)
                return render_jit(params, occ, origins, viewdirs, bkgd, key)

            return render

        ngp_cfg = self.ngp_cfg

        def _member_view(p, o, ro, rd, bkgd):
            def field_fn(pos, dirs):
                return ngp.forward(p, ngp_cfg, pos, dirs)

            return render_rays(
                field_fn, ro, rd, o, lattice, max_samples,
                render_bkgd=bkgd, alpha_thre=cfg.alpha_thre,
                occ_mean=jnp.mean(o.occs),
                with_variance=with_variance,
            )

        @jax.jit
        def render_jit(params, occ, origins, viewdirs, bkgd):
            # origins/viewdirs: [V, P, 3]; map over views to bound memory,
            # vmap over ensemble members.
            def member(p, o):
                def one_view(rays):
                    ro, rd = rays
                    return _member_view(p, o, ro, rd, bkgd)

                return jax.lax.map(one_view, (origins, viewdirs))

            return jax.vmap(member)(params, occ)

        @jax.jit
        def render_one_view_jit(params, occ, ro, rd, bkgd):
            return jax.vmap(
                lambda p, o: _member_view(p, o, ro, rd, bkgd)
            )(params, occ)

        # APNERF_EVAL_SPLIT=1: jit ONE view at a time (Python loop over
        # views) instead of the all-views program — 16x smaller HLO. The
        # remote tpu_compile_helper gets OOM-killed (SIGKILL) compiling the
        # full vmap(members) x lax.map(views) hash-march eval program on
        # this part; per-view programs compile. Same math, same output
        # pytree ([E, V, ...] leaves), more dispatches — eval-cadence only.
        #
        # APNERF_EVAL_RAY_CHUNK=N (with SPLIT=1): additionally dispatch N
        # rays at a time within each view and read each chunk back to host
        # immediately. The hash-encode gather fault is probabilistic per
        # gather volume (docs/PERFORMANCE.md "occ-path TPU fault"); a full
        # 160^2x256-sample view is one ~1.7e9-row program — past the
        # measured fault threshold — while 3200-ray chunks (~210M rows)
        # match the surviving 3-5-step train-chunk volume, and the per-
        # chunk readback surfaces a worker crash as an exception instead
        # of a wedged tunnel.
        split_views = os.environ.get("APNERF_EVAL_SPLIT", "0") == "1"
        ray_chunk = int(os.environ.get("APNERF_EVAL_RAY_CHUNK", "0"))

        def _one_view_host(params, occ, ro, rd, bkgd):
            import numpy as np_

            if not ray_chunk or ro.shape[0] <= ray_chunk:
                return jax.tree.map(
                    np_.asarray,
                    render_one_view_jit(params, occ, ro, rd, bkgd),
                )
            parts = [
                jax.tree.map(
                    np_.asarray,
                    render_one_view_jit(
                        params, occ, ro[i : i + ray_chunk],
                        rd[i : i + ray_chunk], bkgd,
                    ),
                )
                for i in range(0, ro.shape[0], ray_chunk)
            ]

            def merge(*xs):
                if xs[0].ndim == 1:  # n_samples [E]
                    return sum(xs)
                return np_.concatenate(xs, axis=1)

            return jax.tree.map(merge, *parts)

        def render(params, occ, origins, viewdirs, bkgd, key=None):
            # lattice marching is deterministic (test-mode); key accepted
            # for signature parity with the flagship renderer
            del key
            if split_views:
                outs = [
                    _one_view_host(
                        params, occ, origins[v], viewdirs[v], bkgd
                    )
                    for v in range(origins.shape[0])
                ]
                # host-side stack: every downstream consumer
                # (_evaluate_finish, viz dumps) converts to numpy anyway
                return jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs], axis=1),
                    *outs,
                )
            return render_jit(params, occ, origins, viewdirs, bkgd)

        return render

    def _pose7_to_rays(self, poses: np.ndarray, scale: float) -> Rays:
        """Subsampled image rays for [N, 7] pose arrays
        (``habitat_to_data.py:304-354``: even flat-index subsampling)."""
        cfg = self.cfg
        W, H = cfg.img_w, cfg.img_h
        out_n = int(H * scale) * int(W * scale)
        idx = np.round(np.linspace(0, H * W - 1, out_n)).astype(np.int32)
        origins, dirs = [], []
        from ..ops.rays import image_rays

        for p in poses:
            c2w = jnp.asarray(
                pose_matrix_from_quat(p[:3], p[3:]), dtype=jnp.float32
            )
            rays = image_rays(c2w, self.K, W, H)
            origins.append(rays.origins[idx])
            dirs.append(rays.viewdirs[idx])
        return Rays(
            origins=jnp.stack(origins), viewdirs=jnp.stack(dirs)
        )

    def _update_cost_map_from_depth(self, c2w_mat: np.ndarray, depth_img: np.ndarray):
        """One depth scan into the shared cost map (``pipeline.py:272-292``)."""
        d_points = depth_img[int(depth_img.shape[0] / 2)]
        yaw = _euler_yzx_yaw(c2w_mat[:3, :3])
        d_angles = (self.align_angles + yaw) % (2 * np.pi)
        w_loc = c2w_mat[:3, 3]
        aabb = np.asarray(self.cfg.aabb)
        grid_loc = np.array(
            (w_loc - aabb[:3]) // self.cfg.main_grid_size, dtype=int
        )
        self.cost_map, visiting = update_cost_map(
            self.cost_map, d_points, d_angles, grid_loc, w_loc, aabb,
            self.cfg.main_grid_size,
        )
        self.visiting_map += visiting

    # ------------------------------------------------------------------
    # phase 1: initialization (pipeline.py:245-352)
    # ------------------------------------------------------------------

    def _snap(self, poses):
        """Replay-aware pose hook: simulators that serve recorded frames
        (``sim/replay.py``) cannot render novel views — they expose
        ``snap_poses`` returning the TRUE camera of the frame each request
        will receive, and the NeRF must be supervised at that pose.
        Rendering simulators (Habitat, FakeSim) pass through unchanged."""
        snap = getattr(self.sim, "snap_poses", None)
        if snap is None:
            return [np.asarray(p, dtype=np.float64) for p in poses]
        return list(snap(poses))

    def initialization(self, initial_samples: int = 39):
        cfg = self.cfg
        poses_quat = []
        g = self.global_origin
        base_yaw = 0.0
        for i in range(initial_samples):
            ang = (base_yaw + 9.0 * i) % 360.0
            pos = g[:3] + self.rng.uniform(-0.2, 0.2, 3)
            quat = _yaw_quat_deg(ang)
            poses_quat.append(np.concatenate([pos, quat]))
        poses_quat = self._snap(poses_quat)
        poses_mat = [pose_matrix_from_quat(p[:3], p[3:]) for p in poses_quat]

        images, depths, sems = self.sim.sample_images_from_poses(poses_quat)
        for mat, d in zip(poses_mat, depths):
            self._update_cost_map_from_depth(mat, d)

        self.train_dataset = RayDataset(
            training=True,
            save_fp=os.path.join(self.save_path, "train"),
            num_rays=cfg.init_batch_size,
            num_models=cfg.n_ensembles,
            width=cfg.img_w, height=cfg.img_h, hfov=cfg.hfov,
            max_images=cfg.max_images,
        )
        self.train_dataset.update_data(
            images[..., :3], depths, sems, np.array(poses_mat)
        )

        if cfg.mark_invisible:
            # camera-coverage occupancy init (nerfacc occ_grid.py:279-343):
            # cells outside every initial-scan frustum stay unoccupied
            from ..ops.occupancy import mark_invisible_cells

            occ0 = jax.tree.map(lambda x: x[0], self.state.occ)
            marked = mark_invisible_cells(
                occ0, self.K,
                jnp.asarray(np.array(poses_mat), dtype=jnp.float32),
                cfg.img_w, cfg.img_h, cfg.near_plane,
            )
            occs = jnp.broadcast_to(
                marked.occs[None], self.state.occ.occs.shape
            )
            self.state = self.state._replace(
                occ=self.state.occ._replace(occs=occs)
            )

        test_poses = [
            np.array(list(loc) + list(quat))
            for loc in cfg.test_loc
            for quat in cfg.test_quat
        ]
        if test_poses:
            test_poses = self._snap(test_poses)
            t_imgs, t_deps, t_sems = self.sim.sample_images_from_poses(test_poses)
            t_mats = [pose_matrix_from_quat(p[:3], p[3:]) for p in test_poses]
            self.test_dataset = RayDataset(
                training=False,
                save_fp=os.path.join(self.save_path, "test"),
                num_models=cfg.n_ensembles,
                width=cfg.img_w, height=cfg.img_h, hfov=cfg.hfov,
                max_images=max(len(test_poses), 1),
            )
            self.test_dataset.update_data(
                t_imgs[..., :3], t_deps, t_sems, np.array(t_mats)
            )
            self._test_poses = np.array(test_poses)

        if self.mesh is not None:
            from ..parallel.sharding import place_training

            self.state, self.train_dataset = place_training(
                self.state, self.train_dataset, self.mesh
            )

    # ------------------------------------------------------------------
    # phase 2: training (pipeline.py:354-664)
    # ------------------------------------------------------------------

    def nerf_training(
        self,
        steps: int,
        final_train: bool = False,
        initial_train: bool = False,
        planning_step: int = -1,
        evaluate: bool = True,
        pre_sync_hook=None,
        deferred: bool = False,
    ):
        """``pre_sync_hook``: optional host-side callable run AFTER all
        train chunks are dispatched but BEFORE the loss readback — JAX
        dispatch is async, so host work in the hook (viz encoding,
        simulator rendering) overlaps device training instead of
        serializing against it (SURVEY.md §7 "host/device loop structure";
        the reference strictly alternates, ``pipeline.py:1025-1224``).

        ``deferred``: dispatch-only mode for the overlapped planning loop —
        all chunks (and per-chunk occ updates) are enqueued and a
        ``finalize()`` closure is returned instead of the loss list; the
        host is free to run planning work (``sample_traj``) while the
        device trains. In this mode evaluation and checkpoints are the
        caller's responsibility (the planning loop dispatches them with
        the settled phase state), and the mid-phase checkpoint cadence
        becomes per-phase (a mid-dispatch ``np.asarray`` would serialize
        the device queue)."""
        cfg = self.cfg
        from ..train.phase import make_train_phase, pools_from_dataset

        if final_train:
            # MultiStepLR refit (pipeline.py:359-369); the flagship field
            # anchors at its own lr (see config.spectral_lr)
            base_lr = cfg.spectral_lr if self.use_prop else cfg.lr
            sched = multistep_lr(base_lr, [int(steps * 0.3), int(steps * 0.8)])
            self.state = reset_opt_state(self.state, cfg, sched)
            if self.mesh is not None:
                from ..parallel.mesh import shard_ensemble_state

                self.state = shard_ensemble_state(self.state, self.mesh)
            self.train_phase_fn = self._make_phase(cfg, schedule=sched)
            self._schedule = sched

        occ_thre = jnp.asarray(cfg.occ_thre_for_phase(planning_step))
        ds = self.train_dataset
        recent_bias = jnp.asarray(
            not final_train and not initial_train and planning_step > 0
        )
        pools, counts = pools_from_dataset(ds)
        size = jnp.asarray(ds.size, dtype=jnp.int32)

        losses = []
        done = 0
        import time as _time

        t_phase = _time.perf_counter()
        # host-side step mirror: reading int(self.state.step) per chunk
        # would force a device sync and serialize chunk dispatch
        step0 = int(self.state.step)
        # Divergence guard for the final refit: the LR-restarted 5x refit
        # can collapse a healthy field when the scene aabb is oversized
        # (measured: replayed-trajectory run, PSNR 16.88 -> 5.98 during the
        # refit — docs/PERFORMANCE.md "Replayed-trajectory anchor"). Guard
        # only runs in final_train serial mode, where the per-chunk scalar
        # readback it needs costs ~30 ms/chunk against a multi-second chunk.
        guard_on = final_train and not deferred
        guard_best = None  # lowest chunk-mean loss seen this refit
        guard_state = None  # state snapshot at guard_best
        guard_cuts = 0
        while done < steps:
            chunk = min(self.steps_per_call, steps - done)
            keys = jax.random.split(self._next_key(), chunk)
            self.state, chunk_losses = self.train_phase_fn(
                self.state, ds.images, ds.depths, ds.semantics,
                ds.camtoworlds, ds.K, pools, counts, size, keys,
                occ_thre, recent_bias,
            )
            if guard_on:
                m = float(jnp.mean(chunk_losses))
                exploded = (not np.isfinite(m)) or (
                    guard_best is not None and m > 5.0 * guard_best + 1e-3
                )
                if exploded and guard_state is not None:
                    if guard_cuts >= 2:
                        print(
                            f"[divergence-guard] final refit diverged again "
                            f"(chunk loss {m:.3g} vs best {guard_best:.3g}) "
                            f"after {guard_cuts} LR cuts — stopping the "
                            f"refit at the best state (step {done}/{steps})",
                            flush=True,
                        )
                        self.state = guard_state
                        break
                    guard_cuts += 1
                    base_lr = (
                        cfg.spectral_lr if self.use_prop else cfg.lr
                    ) * 0.25**guard_cuts
                    print(
                        f"[divergence-guard] final refit loss exploded "
                        f"({m:.3g} vs best {guard_best:.3g}) at step "
                        f"{done}/{steps} — rolling back to the best state "
                        f"and restarting the refit schedule at lr "
                        f"{base_lr:.2e} (cut #{guard_cuts})",
                        flush=True,
                    )
                    sched = multistep_lr(
                        base_lr, [int(steps * 0.3), int(steps * 0.8)]
                    )
                    self.state = reset_opt_state(guard_state, cfg, sched)
                    if self.mesh is not None:
                        from ..parallel.mesh import shard_ensemble_state

                        self.state = shard_ensemble_state(
                            self.state, self.mesh
                        )
                    self.train_phase_fn = self._make_phase(cfg, schedule=sched)
                    self._schedule = sched
                    continue  # redo this chunk's steps at the cut LR
                if np.isfinite(m) and (guard_best is None or m < guard_best):
                    guard_best = m
                    guard_state = self.state
            losses.append(jnp.mean(chunk_losses, axis=-1))  # [chunk]
            done += chunk
            if self._occ_update_fn is not None:
                self.state = self._occ_update_fn(
                    self.state, self._next_key(), occ_thre
                )
            # lr curve bookkeeping (pipeline.py:534-536)
            self.learning_rate_lst.append(
                float(self._schedule(step0 + done))
            )
            if not deferred and done % self.checkpoint_every < chunk:
                self.save_checkpoints()

        if deferred:
            def finalize():
                vals = [float(v) for arr in losses for v in np.asarray(arr)]
                dt = _time.perf_counter() - t_phase
                samples = (
                    steps * cfg.n_ensembles * cfg.num_rays
                    * cfg.max_samples_train
                )
                self.throughput_log.append({
                    "planning_step": planning_step,
                    "steps": steps,
                    "seconds": dt,
                    "samples_per_sec": samples / max(dt, 1e-9),
                    "rays_per_sec": steps * cfg.n_ensembles * cfg.num_rays
                    / max(dt, 1e-9),
                    # dispatch→finalize wall-clock: host planning work ran
                    # inside this window, so samples_per_sec here is a
                    # lower bound on device throughput
                    "overlapped": True,
                })
                return vals

            return finalize

        hook_s = 0.0
        if pre_sync_hook is not None:
            t_hook = _time.perf_counter()
            pre_sync_hook()
            hook_s = _time.perf_counter() - t_hook
        losses = [float(v) for arr in losses for v in np.asarray(arr)]
        # throughput observability (SURVEY.md §5: rays/sec/chip is the
        # north-star metric the reference never measured)
        dt = _time.perf_counter() - t_phase
        samples = steps * cfg.n_ensembles * cfg.num_rays * cfg.max_samples_train
        entry = {
            "planning_step": planning_step,
            "steps": steps,
            "seconds": dt,
            "samples_per_sec": samples / max(dt, 1e-9),
            "rays_per_sec": steps * cfg.n_ensembles * cfg.num_rays
            / max(dt, 1e-9),
        }
        if pre_sync_hook is not None:
            # wall-clock the hook's host work shared with device training;
            # samples_per_sec is a lower bound for such entries
            entry["overlapped_host_seconds"] = hook_s
        self.throughput_log.append(entry)
        if evaluate and self.test_dataset is not None and (
            final_train or planning_step == 0 or (planning_step + 1) % 2 == 0
            or planning_step == -1
        ):
            self._evaluate(planning_step)
        return [float(l) for l in losses]

    def _current_lr(self) -> float:
        return float(self._schedule(int(self.state.step)))

    def _evaluate(self, planning_step: int, state: Optional[EnsembleState] = None):
        return self._evaluate_start(planning_step, state)()

    def _evaluate_start(
        self, planning_step: int, state: Optional[EnsembleState] = None
    ):
        """PSNR / depth-MSE / semantic-CE over the test set with member 0
        (the reference's intended-but-dead eval, ``pipeline.py:546-613``),
        rendered as proper eval_scale-resolution images so LPIPS(VGG) and
        mIoU are also computed (reference tracks LPIPS at
        ``pipeline.py:596-613``; gated off gracefully without weights).

        Dispatches the test-set render asynchronously and returns a closure
        that reads it back and computes/records the metrics — the
        overlapped planning loop dispatches it before the next train
        phase's chunks so the readback never queues behind training."""
        state = state if state is not None else self.state
        ds = self.test_dataset
        poses = self._test_poses
        cfg = self.cfg
        W, H = cfg.img_w, cfg.img_h
        oh = max(int(H * self.eval_scale), 1)
        ow = max(int(W * self.eval_scale), 1)
        rays = self._pose7_to_grid_rays(poses, oh, ow)
        bkgd = jnp.ones(3)
        out = self._render_eval(
            state.params, state.occ, rays.origins, rays.viewdirs, bkgd
        )

        def finish():
            return self._evaluate_finish(out, planning_step, oh, ow)

        return finish

    def _evaluate_finish(self, out, planning_step: int, oh: int, ow: int):
        from ..utils.metrics import lpips_vgg, miou

        ds = self.test_dataset
        poses = self._test_poses
        cfg = self.cfg
        W, H = cfg.img_w, cfg.img_h
        # member 0 predictions (reference evaluates model_idx == 0)
        ys = (np.arange(oh) * H) // oh
        xs = (np.arange(ow) * W) // ow
        n_img = len(poses)
        gt_rgb = np.asarray(ds.images[:n_img])[:, np.ix_(ys, xs)[0],
                                               np.ix_(ys, xs)[1]] / 255.0
        gt_dep = np.asarray(ds.depths[:n_img])[:, np.ix_(ys, xs)[0],
                                               np.ix_(ys, xs)[1]]
        gt_sem = np.asarray(ds.semantics[:n_img])[:, np.ix_(ys, xs)[0],
                                                  np.ix_(ys, xs)[1]]
        pd_rgb = np.asarray(out["rgb"][0]).reshape(n_img, oh, ow, 3)
        pd_dep = np.asarray(out["depth"][0]).reshape(n_img, oh, ow)
        pd_sem_logits = np.asarray(out["sem"][0]).reshape(n_img, oh, ow, -1)
        row = [
            float(planning_step),
            float(psnr(pd_rgb, gt_rgb)),
            float(depth_mse(pd_dep, gt_dep)),
            float(semantic_ce(pd_sem_logits, gt_sem)),
        ]
        self.errors_hist.append(row)
        lp = float(
            np.mean([lpips_vgg(pd_rgb[i], gt_rgb[i]) for i in range(n_img)])
        )
        mi = miou(
            np.argmax(pd_sem_logits, axis=-1), gt_sem,
            cfg.num_semantic_classes,
        )
        self.metrics_ext_hist.append([float(planning_step), lp, float(mi)])
        # test-view prediction dumps (the reference creates prediction/
        # inside its dead eval block, pipeline.py:646-648; we also fill it)
        import imageio.v2 as imageio

        from ..viz.render_views import colorize_depth, colorize_semantics

        pred_dir = os.path.join(self.save_path, "prediction")
        os.makedirs(pred_dir, exist_ok=True)
        tag = f"p{planning_step}"
        for i in range(n_img):
            imageio.imwrite(
                os.path.join(pred_dir, f"{tag}_{i}_rgb.png"),
                (np.clip(pd_rgb[i], 0, 1) * 255).astype(np.uint8),
            )
            imageio.imwrite(
                os.path.join(pred_dir, f"{tag}_{i}_dep.png"),
                colorize_depth(pd_dep[i]),
            )
            imageio.imwrite(
                os.path.join(pred_dir, f"{tag}_{i}_sem.png"),
                colorize_semantics(
                    np.argmax(pd_sem_logits[i], axis=-1),
                    cfg.num_semantic_classes,
                ),
            )
        return row

    # ------------------------------------------------------------------
    # phase 3: uncertainty scoring (pipeline.py:666-798)
    # ------------------------------------------------------------------

    def dispatch_uncertainty(self, trajectory: np.ndarray):
        """Asynchronously dispatch one candidate's predictive-information
        render+score; returns the un-synced device PI tuple.

        The reference scores candidates strictly sequentially with a host
        sync per trajectory (``pipeline.py:666-798``, 20 syncs per planning
        step). JAX dispatch is async, so queuing all candidates and
        converting once overlaps the host-side ray building of candidate
        k+1 with the device render of candidate k (SURVEY.md §7
        "host/device loop structure")."""
        n = len(trajectory)
        a = np.linspace(0, n - 20, 20)
        b = np.linspace(n - 20, n - 1, 20)
        unc_idx = np.hstack((a, b)).astype(int)
        rays = self._pose7_to_rays(trajectory[unc_idx], self.unc_scale)
        out = self._render_unc(
            self.state.params, self.state.occ, rays.origins, rays.viewdirs,
            jnp.zeros(3),
        )
        return predictive_information(
            rgb_var=out["rgb_var"],
            depth_var=out["depth_var"][..., 0],
            sem_logits=out["sem"],
            acc=out["opacity"][..., 0],
        )

    def probablistic_uncertainty(self, trajectory: np.ndarray, step: int):
        """Predictive information of one candidate trajectory (blocking;
        the planning loop uses dispatch_uncertainty to pipeline)."""
        pi = self.dispatch_uncertainty(trajectory)
        self.trajector_uncertainty_list[step - 1].append(
            [float(pi.rgb), float(pi.depth), float(pi.sem), float(pi.occ)]
        )
        return float(pi.total)

    # ------------------------------------------------------------------
    # per-step visualization (pipeline.py:918-1023)
    # ------------------------------------------------------------------

    def render(self, traj: np.ndarray, state: Optional[EnsembleState] = None):
        self.render_start(traj, state)()

    def render_start(
        self, traj: np.ndarray, state: Optional[EnsembleState] = None
    ):
        """Dump the reference's per-planning-step viz artifacts: chase-cam
        frames ``viz/<n>.png``, top-down ``viz/top/<n>.png``, and
        first-person GT-vs-NeRF panels under ``viz/fpv/{gt,pd}_{rgb,dep,
        sem}`` + ``viz/fpv/pd_occ`` (layout: reference README.md:81-91,
        writer ``pipeline.py:918-1023``). Predictions render member 0 at
        ``viz_scale`` resolution; GT is stride-downsampled to match.

        The device prediction render dispatches immediately (with
        ``state`` — the overlapped planning loop passes the settled
        pre-train state, matching the reference's render-before-train
        order, ``pipeline.py:918-1224``); the returned closure does the
        host-side simulator renders + PNG encoding."""
        state = state if state is not None else self.state
        cfg = self.cfg
        W, H = cfg.img_w, cfg.img_h
        oh, ow = max(int(H * self.viz_scale), 1), max(int(W * self.viz_scale), 1)
        traj = np.asarray(traj)
        rays = self._pose7_to_grid_rays(traj, oh, ow)
        out = self._render_eval(
            state.params, state.occ, rays.origins, rays.viewdirs,
            jnp.ones(3),
        )

        def finish():
            return self._render_finish(traj, out, oh, ow)

        return finish

    def _render_finish(self, traj: np.ndarray, out, oh: int, ow: int):
        import imageio.v2 as imageio

        viz = os.path.join(self.save_path, "viz")
        fpv = os.path.join(viz, "fpv")
        os.makedirs(os.path.join(viz, "top"), exist_ok=True)
        for sub in ("gt_rgb", "gt_dep", "gt_sem",
                    "pd_rgb", "pd_dep", "pd_sem", "pd_occ"):
            os.makedirs(os.path.join(fpv, sub), exist_ok=True)

        step = self.sim_step
        for img in np.asarray(self.sim.render_tpv(traj)):
            imageio.imwrite(
                os.path.join(viz, f"{self.sim_step}.png"), img[..., :3]
            )
            self.sim_step += 1
        for s, img in enumerate(np.asarray(self.sim.render_top_tpv(traj))):
            imageio.imwrite(
                os.path.join(viz, "top", f"{step + s}.png"), img[..., :3]
            )

        from ..viz.render_views import colorize_depth, colorize_semantics

        cfg = self.cfg
        W, H = cfg.img_w, cfg.img_h
        gt_rgb, gt_dep, gt_sem = self.sim.sample_images_from_poses(traj)
        # strided downsample to the prediction resolution
        ys = (np.arange(oh) * H) // oh
        xs = (np.arange(ow) * W) // ow
        pd_rgb = np.asarray(out["rgb"][0]).reshape(len(traj), oh, ow, 3)
        pd_dep = np.asarray(out["depth"][0]).reshape(len(traj), oh, ow)
        pd_sem = np.argmax(
            np.asarray(out["sem"][0]).reshape(len(traj), oh, ow, -1), axis=-1
        )
        pd_occ = np.asarray(out["opacity"][0]).reshape(len(traj), oh, ow)
        C = cfg.num_semantic_classes
        for st in range(len(traj)):
            n = step + st
            g_rgb = np.asarray(gt_rgb[st])[..., :3][np.ix_(ys, xs)]
            g_dep = np.asarray(gt_dep[st])[np.ix_(ys, xs)]
            g_sem = np.asarray(gt_sem[st])[np.ix_(ys, xs)]
            imageio.imwrite(
                os.path.join(fpv, "gt_rgb", f"{n}.png"), g_rgb.astype(np.uint8)
            )
            imageio.imwrite(
                os.path.join(fpv, "pd_rgb", f"{n}.png"),
                (np.clip(pd_rgb[st], 0, 1) * 255).astype(np.uint8),
            )
            # depth scaled by 25 like the reference writer
            imageio.imwrite(
                os.path.join(fpv, "gt_dep", f"{n}.png"),
                np.clip(g_dep * 25, 0, 255).astype(np.uint8),
            )
            imageio.imwrite(
                os.path.join(fpv, "pd_dep", f"{n}.png"),
                np.clip(pd_dep[st] * 25, 0, 255).astype(np.uint8),
            )
            imageio.imwrite(
                os.path.join(fpv, "gt_sem", f"{n}.png"),
                colorize_semantics(g_sem, C),
            )
            imageio.imwrite(
                os.path.join(fpv, "pd_sem", f"{n}.png"),
                colorize_semantics(pd_sem[st], C),
            )
            imageio.imwrite(
                os.path.join(fpv, "pd_occ", f"{n}.png"),
                np.clip(pd_occ[st] * 255, 0, 255).astype(np.uint8),
            )

    def _pose7_to_grid_rays(self, poses: np.ndarray, oh: int, ow: int) -> Rays:
        """Clean axis-aligned low-res image rays (for viz panels that must
        reshape to [oh, ow] images, unlike the reference's flat-linspace
        subsampling used for uncertainty)."""
        from ..ops.rays import image_rays

        K_s = jnp.asarray(make_intrinsics(ow, oh, self.cfg.hfov))
        origins, dirs = [], []
        for p in np.asarray(poses):
            c2w = jnp.asarray(
                pose_matrix_from_quat(p[:3], p[3:]), dtype=jnp.float32
            )
            rays = image_rays(c2w, K_s, ow, oh)
            origins.append(rays.origins)
            dirs.append(rays.viewdirs)
        return Rays(origins=jnp.stack(origins), viewdirs=jnp.stack(dirs))

    # ------------------------------------------------------------------
    # phase 4: the planning loop (pipeline.py:1025-1224)
    # ------------------------------------------------------------------

    def _sample_candidates(self, binaries_host, current_state):
        """Host-side trajectory candidate generation from a settled
        binaries snapshot (pipeline.py:1043-1060 layout swap +
        planning_funcs.sample_traj)."""
        cfg = self.cfg
        vg = np.swapaxes(binaries_host[0], 1, 2)
        vg1 = np.swapaxes(
            binaries_host[1] if binaries_host.shape[0] > 1 else binaries_host[0],
            1, 2,
        )
        xyz_state = current_state[[0, 2, 1]]
        aabb = np.asarray(cfg.aabb)[[0, 2, 1, 3, 5, 4]]
        return sample_traj(
            voxel_grid=np.array([vg, vg1]),
            current_state=xyz_state,
            N_traj=cfg.num_traj,
            aabb=aabb,
            cost_map=self.cost_map,
            visiting_map=self.visiting_map,
            save_path=self.save_path,
            N_sample_disc=cfg.sample_disc,
            voxel_grid_size=cfg.main_grid_size,
            sim=self.sim,
            rng=self.rng,
        )

    def _score_candidates(self, candidates, step):
        """Queue every candidate's render+score, then sync once — the
        device renders candidate k while the host builds rays for k+1
        (vs the reference's 20 blocking syncs, pipeline.py:666)."""
        pis = [self.dispatch_uncertainty(c) for c in candidates]
        comps = np.asarray(
            [[p.rgb, p.depth, p.sem, p.occ] for p in pis], dtype=float
        )
        self.trajector_uncertainty_list[step - 1].extend(comps.tolist())
        best = int(np.argmax(comps.sum(axis=1)))
        chosen = candidates[best]
        n = len(chosen)
        a = np.linspace(0, n - 20, 20)
        b = np.linspace(n - 20, n - 1, 20)
        unc_idx = np.hstack((a, b)).astype(int)
        return chosen, chosen[unc_idx]

    def _observe_and_update(self, fly_poses):
        """Fly the chosen trajectory: render observations in the simulator,
        fuse depth scans into the cost map (last 6 views,
        pipeline.py:1115-1138), append to the train dataset."""
        fly_poses = self._snap(fly_poses)
        images, depths, sems = self.sim.sample_images_from_poses(fly_poses)
        mats = [pose_matrix_from_quat(p[:3], p[3:]) for p in fly_poses]
        for mat, d in zip(mats[-6:], depths[-6:]):
            self._update_cost_map_from_depth(mat, d)
        self.train_dataset.update_data(
            images[..., :3], depths, sems, np.array(mats)
        )

    def _should_stop(self, step) -> bool:
        """Stop criterion (pipeline.py:1213-1224)."""
        past = [
            np.mean(np.asarray(u), axis=0)
            for u in self.trajector_uncertainty_list[:step]
            if len(u) > 0
        ]
        if len(past) >= 5:
            unc = np.max(np.asarray(past), axis=1)
            if np.all(unc[-5:] > 0.05):
                return True
        return False

    def _eval_due(self, planning_step: int) -> bool:
        return self.test_dataset is not None and (
            planning_step == 0 or (planning_step + 1) % 2 == 0
        )

    def planning(self, steps: int, training_steps_per_step: int):
        """The active loop. Default (``overlap_planning=True``): each
        step's train phase is dispatched asynchronously and the NEXT
        step's host planning (``sample_traj``: Dijkstra + MinSnap + SE3
        rollouts × num_traj) runs while the device trains; candidate
        renders queue behind the chunks, so the single sync point per
        step is the PI readback. Eval/viz prediction renders dispatch
        with the settled phase state BEFORE the next phase's chunks, so
        their readbacks never block on training. Dataflow parity with the
        reference (``pipeline.py:1025-1224``) except: (a) ``sample_traj``
        consumes the binaries snapshot from before the in-flight phase
        (one train phase stale — the grid is EMA-consolidated and the
        planner dilates it anyway), (b) checkpoints save once per phase
        instead of every 1000 steps (a mid-dispatch save would serialize
        the device queue). ``overlap_planning=False`` restores strict
        alternation for A/B timing."""
        if not self.overlap_planning:
            return self._planning_serial(steps, training_steps_per_step)
        cfg = self.cfg
        current_state = self.global_origin[:3].copy()
        step = 0
        flag = True
        # settled post-initial-train snapshot (device idle here)
        binaries_host = np.asarray(self.state.occ.binaries)
        pending = None          # finalize() of the in-flight train phase
        pending_step = 0
        deferred_host = []      # host work for renders dispatched pre-phase
        # checkpoint cadence mirror: overlap mode saves once per phase,
        # but only when the phase crosses a checkpoint_every boundary
        # (each save fetches the full ensemble state through the tunnel —
        # an unconditional per-step save measured 0.91x in the no-viz A/B)
        steps_done = int(self.state.step)
        last_ckpt = steps_done
        while flag and step < cfg.planning_step:
            step += 1
            # ---- host planning; overlaps the in-flight train phase ----
            candidates = self._sample_candidates(binaries_host, current_state)
            chosen, fly_poses = self._score_candidates(candidates, step)
            # ^ the PI readback inside is the step's one device sync
            if pending is not None:
                pending()       # losses already computed; no device wait
                pending = None
            state_k = self.state        # settled post-phase ensemble state
            prev_step = pending_step
            for fn in deferred_host:    # PNG/metric work, renders settled
                fn()
            deferred_host = []
            # ---- observe (host; the next phase needs this data) ----
            self._observe_and_update(fly_poses)
            current_state = fly_poses[-1, :3]
            self.current_pose = chosen[-1]
            binaries_host = np.asarray(state_k.occ.binaries)
            # ---- dispatch quick renders BEFORE the next phase's chunks ----
            if prev_step > 0 and self._eval_due(prev_step):
                deferred_host.append(
                    self._evaluate_start(prev_step, state=state_k)
                )
            if self.save_viz:
                deferred_host.append(
                    self.render_start(fly_poses, state=state_k)
                )
            if steps_done - last_ckpt >= self.checkpoint_every:
                deferred_host.append(
                    lambda s=state_k: self.save_checkpoints(state=s)
                )
                last_ckpt = steps_done
            # ---- dispatch this step's train phase (async) ----
            pending = self.nerf_training(
                training_steps_per_step, planning_step=step, deferred=True,
            )
            pending_step = step
            steps_done += training_steps_per_step
            flag = not self._should_stop(step)
        if pending is not None:
            pending()
            for fn in deferred_host:
                fn()
            deferred_host = []
            if self._eval_due(pending_step):
                self._evaluate(pending_step)
            self.save_checkpoints()
        return step

    def _planning_serial(self, steps: int, training_steps_per_step: int):
        """r3 behavior: strict plan→score→fly→train alternation (the
        reference's structure, pipeline.py:1025-1224), with the viz dump
        overlapped via pre_sync_hook."""
        cfg = self.cfg
        current_state = self.global_origin[:3].copy()
        step = 0
        flag = True
        while flag and step < cfg.planning_step:
            step += 1
            binaries = np.asarray(self.state.occ.binaries)  # [E, X, Y, Z]
            candidates = self._sample_candidates(binaries, current_state)
            chosen, fly_poses = self._score_candidates(candidates, step)
            self._observe_and_update(fly_poses)
            current_state = fly_poses[-1, :3]
            self.current_pose = chosen[-1]

            # the viz dump (simulator chase-cam renders + PNG encoding —
            # pure host work except its final prediction render, which
            # queues on-device AFTER the train chunks) runs while the
            # device trains: nerf_training dispatches all chunks first and
            # only then calls the hook (vs the reference's strict
            # alternation, pipeline.py:918-1224)
            viz_hook = (
                (lambda: self.render(fly_poses)) if self.save_viz else None
            )
            self.nerf_training(
                training_steps_per_step, planning_step=step,
                pre_sync_hook=viz_hook,
            )
            flag = not self._should_stop(step)
        return step

    # ------------------------------------------------------------------
    # persistence (pipeline.py:1226-1274; SURVEY.md §5 layout)
    # ------------------------------------------------------------------

    def save_checkpoints(self, state: Optional[EnsembleState] = None):
        """Per-member checkpoint with the full reference contract
        ``{occ_grid, model, optimizer_state_dict}`` plus the step counter
        (``pipeline.py:616-636``) — enough to resume mid-training without
        resetting Adam moments. ``state`` lets the overlapped planning
        loop checkpoint the settled phase state while the next phase is
        in flight."""
        state = state if state is not None else self.state
        ckpt_dir = os.path.join(self.save_path, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
        for i in range(self.cfg.n_ensembles):
            member_params = jax.tree.map(lambda x: np.asarray(x[i]),
                                         state.params)
            flat = {}

            def _flatten(prefix, tree):
                for k, v in tree.items():
                    if isinstance(v, dict):
                        _flatten(f"{prefix}{k}/", v)
                    else:
                        flat[f"{prefix}{k}"] = v

            _flatten("", member_params)
            for j, leaf in enumerate(opt_leaves):
                arr = np.asarray(leaf)
                # optimizer leaves carry the stacked ensemble axis when
                # shaped like a per-member stat; scalars (e.g. count) don't
                flat[f"__opt__{j}"] = arr[i] if arr.ndim > 0 and arr.shape[
                    0
                ] == self.cfg.n_ensembles else arr
            np.savez(
                os.path.join(ckpt_dir, f"model_{i}.npz"),
                occ_grid=np.asarray(state.occ.binaries[i]),
                occs=np.asarray(state.occ.occs[i]),
                step=int(state.step),
                **flat,
            )

    def load_checkpoints(self, ckpt_dir: str):
        """Restore params, occupancy grids, optimizer state, and step —
        the full resume path the reference lacks (load existed only in its
        viewer, ``visualization/vis_nerf_habitat.py:124-126``)."""
        states = []
        params_template = jax.tree.map(np.asarray, self.state.params)
        opt_leaves, opt_treedef = jax.tree_util.tree_flatten(
            self.state.opt_state
        )
        opt_members = []
        step = None
        for i in range(self.cfg.n_ensembles):
            data = np.load(os.path.join(ckpt_dir, f"model_{i}.npz"))

            def _unflatten(prefix, tree):
                out = {}
                for k, v in tree.items():
                    if isinstance(v, dict):
                        out[k] = _unflatten(f"{prefix}{k}/", v)
                    else:
                        out[k] = data[f"{prefix}{k}"]
                return out

            member = _unflatten("", jax.tree.map(lambda x: x[i],
                                                 params_template))
            states.append((member, data["occ_grid"], data["occs"]))
            if f"__opt__0" in data:
                opt_members.append(
                    [data[f"__opt__{j}"] for j in range(len(opt_leaves))]
                )
            step = int(data["step"])
        params = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[s[0] for s in states],
        )
        occ = self.state.occ._replace(
            binaries=jnp.stack([jnp.asarray(s[1]) for s in states]),
            occs=jnp.stack([jnp.asarray(s[2]) for s in states]),
        )
        opt_state = self.state.opt_state
        if opt_members:
            new_leaves = []
            for j, tmpl in enumerate(opt_leaves):
                tmpl_arr = np.asarray(tmpl)
                if tmpl_arr.ndim > 0 and tmpl_arr.shape[0] == self.cfg.n_ensembles:
                    leaf = jnp.stack(
                        [jnp.asarray(m[j]) for m in opt_members]
                    )
                else:
                    leaf = jnp.asarray(opt_members[0][j])
                new_leaves.append(leaf.astype(tmpl.dtype))
            opt_state = jax.tree_util.tree_unflatten(opt_treedef, new_leaves)
        self.state = self.state._replace(
            params=params, occ=occ, opt_state=opt_state,
            step=jnp.asarray(step if step is not None else int(self.state.step)),
        )
        if self.mesh is not None:
            from ..parallel.mesh import shard_ensemble_state

            self.state = shard_ensemble_state(self.state, self.mesh)

    def save_artifacts(self):
        self.train_dataset.save()
        if self.test_dataset is not None:
            self.test_dataset.save()
        np.save(
            os.path.join(self.save_path, "uncertainty.npy"),
            np.asarray(
                [np.asarray(u, dtype=object)
                 for u in self.trajector_uncertainty_list],
                dtype=object,
            ),
            allow_pickle=True,
        )
        np.save(
            os.path.join(self.save_path, "errors.npy"),
            np.asarray(self.errors_hist),
        )
        np.save(
            os.path.join(self.save_path, "metrics_ext.npy"),
            np.asarray(self.metrics_ext_hist),
        )
        import json

        with open(os.path.join(self.save_path, "throughput.json"), "w") as f:
            json.dump(self.throughput_log, f, indent=1)
        self.save_checkpoints()

    # ------------------------------------------------------------------

    def pipeline(self):
        """Full active-perception run (``pipeline.py:1226-1274``)."""
        cfg = self.cfg
        self.initialization()
        self.nerf_training(cfg.training_steps, initial_train=True,
                           planning_step=-1)
        self.planning(cfg.planning_step, cfg.training_steps)
        self.nerf_training(cfg.training_steps * 5, final_train=True,
                           planning_step=-10)
        self.save_artifacts()
