"""ctypes bindings for the native planning core (planning_core.cpp).

The reference ships its native code as CUDA kernels JIT-compiled through
``torch.utils.cpp_extension`` (``perception/nerfacc/nerfacc/cuda/
_backend.py:17-89``); the analogue here is a host-side C++ library built
with g++ on first use (device compute belongs to XLA/Pallas, not hand
CUDA).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "planning_core.cpp")
_SO = os.path.join(_HERE, "libplanning_core.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.dijkstra_plan.restype = ctypes.c_int32
    lib.dijkstra_plan.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32,
    ]
    lib.raycast_update.restype = None
    lib.raycast_update.argtypes = [
        f64p, ctypes.c_int32, ctypes.c_int32,
        f64p, f64p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.voxel_traverse.restype = ctypes.c_int32
    lib.voxel_traverse.argtypes = [
        f64p, f64p, i32p, i32p, ctypes.c_double, i32p, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def dijkstra_plan_native(
    obstacle: np.ndarray, sx: int, sy: int, gx: int, gy: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """→ (xs, ys) goal→start grid indices, or None (unreachable /
    native lib unavailable)."""
    lib = _load()
    if lib is None:
        return None
    obstacle = np.ascontiguousarray(obstacle != 0, dtype=np.uint8)
    X, Y = obstacle.shape
    cap = X * Y
    out_x = np.zeros(cap, dtype=np.int32)
    out_y = np.zeros(cap, dtype=np.int32)
    n = lib.dijkstra_plan(
        obstacle, X, Y, int(sx), int(sy), int(gx), int(gy), out_x, out_y, cap
    )
    if n == 0:
        return None
    return out_x[:n].copy(), out_y[:n].copy()


def raycast_update_native(
    occupancy: np.ndarray,
    ox: np.ndarray,
    oy: np.ndarray,
    loc_x: int,
    loc_y: int,
    min_x: float,
    min_y: float,
    resolution: float,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    occupancy = np.ascontiguousarray(occupancy, dtype=np.float64)
    ox = np.ascontiguousarray(ox, dtype=np.float64)
    oy = np.ascontiguousarray(oy, dtype=np.float64)
    X, Y = occupancy.shape
    lib.raycast_update(
        occupancy, X, Y, ox, oy, len(ox), int(loc_x), int(loc_y),
        float(min_x), float(min_y), float(resolution),
    )
    return occupancy


def voxel_traverse_native(
    start_pos, end_pos, start_voxel, end_voxel, voxel_size: float,
    max_voxels: int = 65536,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((max_voxels, 3), dtype=np.int32)
    n = lib.voxel_traverse(
        np.ascontiguousarray(start_pos, dtype=np.float64),
        np.ascontiguousarray(end_pos, dtype=np.float64),
        np.ascontiguousarray(start_voxel, dtype=np.int32),
        np.ascontiguousarray(end_voxel, dtype=np.int32),
        float(voxel_size),
        out.reshape(-1),
        max_voxels,
    )
    return out[:n].copy()
