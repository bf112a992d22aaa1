"""Device mesh construction and sharding layouts.

The reference is single-process single-GPU (SURVEY.md §2.5: no
torch.distributed anywhere); its only "parallelism" is the 2-member
ensemble trained sequentially. The TPU-native design promotes that
structure to hardware axes:

  * ``ens`` axis — ensemble members are embarrassingly parallel (separate
    params/grids/optimizers); each member lives on its own mesh slice.
  * ``data`` axis — each member's ray batch (and candidate-view rendering)
    is sharded across chips; parameter gradients are all-reduced over
    ``data`` by XLA-inserted psums riding ICI.

Layouts (P = PartitionSpec):
  params / opt_state / occ leaves [E, ...]  → P("ens")
  ray batches [E, R, ...]                   → P("ens", "data")
  observation store (images, poses)         → replicated
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_ens: int = 2, n_data: Optional[int] = None, devices=None
) -> Mesh:
    """(ens, data) mesh over the available devices.

    If the device count doesn't divide by ``n_ens`` (e.g. a single chip),
    the ensemble axis collapses to 1 and members run stacked on each chip —
    the vmapped math is identical either way.
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_dev % n_ens != 0:
        n_ens = 1
    if n_data is None:
        n_data = n_dev // n_ens
    devs = np.asarray(devices[: n_ens * n_data]).reshape(n_ens, n_data)
    return Mesh(devs, axis_names=("ens", "data"))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ensemble sharding for state leaves [E, ...]."""
    return NamedSharding(mesh, P("ens"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[E, R, ...] ray batches: members over ens, rays over data."""
    return NamedSharding(mesh, P("ens", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ensemble_state(state, mesh: Mesh):
    """Place an EnsembleState: array leaves with leading E axis → P('ens'),
    scalars replicated."""
    ens = ensemble_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == mesh.shape["ens"]:
            return jax.device_put(x, ens)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)
