"""Device mesh construction for multi-chip / multi-host training.

The reference is single-GPU (SURVEY §2.4) — scale here comes from JAX
sharding: a ("data", "model") mesh where the data axis shards training views
(one view per chip-group per step) and the model axis can shard the Gaussian
arrays for preprocessing/binning. Round-1 default is pure view-parallelism:
params replicated, per-view gradients psum-reduced over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def view_sharded(mesh: Mesh) -> NamedSharding:
    """Shard a leading per-view batch axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def gaussian_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the gaussian (capacity) axis over the model axis."""
    return NamedSharding(mesh, P("model"))
