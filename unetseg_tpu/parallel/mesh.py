"""Device-mesh helpers.

The reference is single-process/single-GPU with zero collectives (SURVEY §2
parallelism table); scale-out here is pure `jax.sharding`: pick a mesh,
annotate shardings, let XLA insert the ICI collectives.

Axes:
  * ``dp`` — data (batch of slices); the primary throughput axis.
  * ``sp`` — spatial (image rows); XLA spatially partitions the convolutions
    and inserts halo exchanges automatically, the sequence-parallel analog
    for a model with no sequence dimension (SURVEY §5 long-context note).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, sp) mesh over the first n devices.

    dp is laid out over the slower-varying device index so dp collectives
    ride contiguous ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % sp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by sp={sp}")
    dp = n_devices // sp
    arr = np.asarray(devices[:n_devices]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def batch_spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C): batch over dp, rows over sp (conv halos via XLA SPMD)."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
