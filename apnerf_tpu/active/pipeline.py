"""CLI entry: python -m apnerf_tpu.active.pipeline

Mirrors the reference CLI (``scripts/pipeline.py:65-88,1277-1285``:
``--sem-num``, ``--habitat-scene``, ``--habitat-config-file``) plus:
  * ``--sim {habitat,fake}`` — the analytic FakeSim needs no Habitat.
  * ``--config`` — explicit YAML path (defaults to
    ``configs/config_<scene>.yaml``, same naming scheme as the reference).
  * ``--platform`` — force a JAX platform (e.g. cpu for smoke runs).
"""

from __future__ import annotations

import argparse
import pathlib
import random

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sem-num", type=int, default=0,
                   help="number of semantic classes")
    p.add_argument("--habitat-scene", type=str, default="102344250")
    p.add_argument(
        "--habitat-config-file", type=str,
        default=str(
            pathlib.Path.cwd()
            / "data/scene_datasets/hssd-hab/hssd-hab.scene_dataset_config.json"
        ),
    )
    p.add_argument("--sim", choices=["habitat", "fake"], default="habitat")
    p.add_argument("--config", type=str, default=None,
                   help="scene YAML path (reference schema)")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--seed", type=int, default=9)
    p.add_argument(
        "--profile", type=str, default=None, metavar="DIR",
        help="write a jax.profiler trace of the run to DIR "
        "(view with tensorboard or xprof)",
    )
    p.add_argument(
        "--mesh", type=str, default=None, metavar="ENS,DATA",
        help="run the active loop multi-chip: an (ens, data) device mesh, "
        "e.g. --mesh 2,4 on an 8-chip slice (flagship shard_map phase; "
        "the ngp+occ parity path runs GSPMD-sharded)",
    )
    return p.parse_args(argv)


def build_mapper(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config import PipelineConfig, load_scene_config
    from .mapper import ActiveNeRFMapper

    cfg_path = args.config or f"configs/config_{args.habitat_scene}.yaml"
    if pathlib.Path(cfg_path).exists():
        cfg = load_scene_config(cfg_path, num_semantic_classes=args.sem_num)
    else:
        cfg = PipelineConfig(num_semantic_classes=args.sem_num)

    if args.sim == "fake":
        from ..sim.fake import FakeSim

        sim = FakeSim(aabb=tuple(cfg.aabb), img_w=cfg.img_w, img_h=cfg.img_h,
                      hfov=cfg.hfov)
        if args.sem_num == 0:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, num_semantic_classes=sim.num_semantic_classes
            )
    else:
        from ..sim.habitat import HabitatSim

        sim = HabitatSim(args.habitat_scene, args.habitat_config_file,
                         cfg.img_w, cfg.img_h)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        n_ens, n_data = (int(v) for v in args.mesh.split(","))
        if n_ens * n_data > len(jax.devices()):
            raise SystemExit(
                f"--mesh {args.mesh} needs {n_ens * n_data} devices, "
                f"have {len(jax.devices())}"
            )
        mesh = make_mesh(n_ens=n_ens, n_data=n_data)

    return ActiveNeRFMapper(cfg, sim, seed=args.seed, mesh=mesh)


def main(argv=None):
    args = parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)
    mapper = build_mapper(args)
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            mapper.pipeline()
    else:
        mapper.pipeline()
    if mapper.throughput_log:
        last = mapper.throughput_log[-1]
        print(
            f"throughput: {last['samples_per_sec']:.3e} samples/s, "
            f"{last['rays_per_sec']:.3e} rays/s"
        )
    print(f"done; artifacts in {mapper.save_path}")


if __name__ == "__main__":
    main()
