"""D-NeRF synthetic (time-conditioned) dataset loader.

Capability parity with ``perception/models/datasets/dnerf_synthetic.py``:
transforms_<split>.json frames carry a ``time`` field consumed by the
TNeRF field (``models/mlp.py:tnerf_forward``).
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple, Optional

import numpy as np


class DNeRFData(NamedTuple):
    images: np.ndarray  # [N, H, W, 4] uint8
    camtoworlds: np.ndarray  # [N, 4, 4]
    times: np.ndarray  # [N] in [0, 1]
    focal: float
    width: int
    height: int


def load_dnerf_subject(root: str, subject: str, split: str = "train",
                       max_images: Optional[int] = None) -> DNeRFData:
    with open(os.path.join(root, subject, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    try:
        import imageio.v2 as imageio
    except ImportError:  # pragma: no cover
        import imageio

    frames = meta["frames"][:max_images] if max_images else meta["frames"]
    images, c2ws, times = [], [], []
    for i, frame in enumerate(frames):
        images.append(
            imageio.imread(os.path.join(root, subject,
                                        frame["file_path"] + ".png"))
        )
        c2ws.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
        times.append(
            float(frame.get("time", i / max(len(frames) - 1, 1)))
        )
    images = np.stack(images)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return DNeRFData(
        images=images,
        camtoworlds=np.stack(c2ws),
        times=np.asarray(times, dtype=np.float32),
        focal=focal, width=w, height=h,
    )
