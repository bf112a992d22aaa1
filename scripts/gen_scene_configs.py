"""Generate per-scene YAML configs for the three HSSD scenes.

Counterpart of the reference's ``simulator/yaml_gen.py`` (which emits
``scripts/config_<scene>.yaml``). Scene constants (aabb, start pose, test
poses) are scene facts taken from the reference configs
(``scripts/config_1023442{50,80},config_102344529.yaml``); shared
hyperparameters follow ``config_102344250.yaml:1-33``. Usage:

  python scripts/gen_scene_configs.py [--out configs/]
"""

import argparse
import os

import numpy as np
import yaml

SCENES = {
    # scene id: (aabb, global_origin)
    "102344250": (
        [-19.1, -0.2, -19.1, 0.5, 3.2, 0.5],
        [-14.79389263, 1.5, -10.6045085, 0.0, 0.0, 0.0, 1.0],
    ),
    "102344280": (
        [-13, -0.2, -13, 14, 4.2, 15],
        [1, 1.5, 3, 0.0, 0.0, 0.0, 1.0],
    ),
    "102344529": (
        [-12, -0.2, -12, 12, 4.2, 12],
        [-3, 1.5, -7, 0.0, 0.0, 0.0, 1.0],
    ),
}

TEST_QUAT = [
    [0, 0, 0, 1],
    [0, 0.707, 0, 0.707],
    [0, 1, 0, 0],
    [0, 0.707, 0, -0.707],
]


def sample_test_locations(aabb, n=14, height=1.5, margin=2.0, seed=0):
    """Evenly spread in-bounds test locations (the reference hand-picks
    14 per scene; regenerate deterministically when not provided)."""
    rng = np.random.RandomState(seed)
    lo = np.array([aabb[0] + margin, height, aabb[2] + margin])
    hi = np.array([aabb[3] - margin, height, aabb[5] - margin])
    pts = lo + rng.rand(n, 3) * (hi - lo)
    pts[:, 1] = height
    return [[round(float(v), 4) for v in p] for p in pts]


def scene_config(scene_id: str) -> dict:
    aabb, origin = SCENES[scene_id]
    return {
        "save_path": "data/habitat_collection",
        "init_batch_size": 1024,
        "target_sample_batch_size": 262144,
        "weight_decay": 0.0,
        "aabb": aabb,
        "near_plane": 0.1,
        "far_plane": 1e10,
        "main_grid_nlvl": 1,
        "main_grid_size": 0.2,
        "main_neurons": 128,
        "main_layer": 2,
        "minor_grid_nlvl": 1,
        "minor_grid_size": 0.2,
        "minor_neurons": 64,
        "minor_layer": 2,
        "planning_step": 25,
        "num_traj": 20,
        "sample_disc": 30,
        "training_steps": 2000,
        "render_step_size": 0.001,
        "alpha_thre": 0.01,
        "cone_angle": 0.004,
        "n_ensembles": 2,
        "img_w": 640,
        "img_h": 640,
        "hfov": 1.5707963267948966,
        # TPU batching (static rays x samples = the reference's
        # 262144-sample budget)
        "num_rays": 2048,
        "max_samples_train": 128,
        "max_samples_test": 512,
        "n_candidates": 2048,
        "max_images": 512,
        "global_origin": origin,
        "test_loc": sample_test_locations(aabb),
        "test_quat": TEST_QUAT,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="configs")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for scene in SCENES:
        path = os.path.join(args.out, f"config_{scene}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(scene_config(scene), f, sort_keys=False)
        print("wrote", path)


if __name__ == "__main__":
    main()
