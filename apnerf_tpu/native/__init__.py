"""Native (C++) host runtime components, loaded via ctypes.

Build with ``make -C apnerf_tpu/native`` (or it auto-builds on first
import when g++ is available). Every native entry point has a pure-Python
fallback with identical semantics — the native path is a performance
accelerator, never a functional requirement.
"""

from .lib import (
    dijkstra_plan_native,
    is_available,
    raycast_update_native,
    voxel_traverse_native,
)

__all__ = [
    "dijkstra_plan_native",
    "is_available",
    "raycast_update_native",
    "voxel_traverse_native",
]
