"""Multi-host initialization + host-side data sharding helpers.

The reference is single-process (SURVEY §2.4/§5.8). For pod-slice training:
`jax.distributed.initialize` wires processes (ICI within a slice, DCN
across), each process feeds only its local shard of cameras, and
`multihost_utils` assembles global arrays when needed.
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-process JAX. No-ops for single-process runs.

    On TPU pods the three args are auto-detected from the environment; on
    CPU/GPU fleets pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def local_camera_indices(n_cameras: int, seed: int = 0) -> List[int]:
    """Deterministic partition of camera indices across processes: every
    process loads/decodes only its own views (host-side data sharding,
    SURVEY §5.8)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n_cameras)
    pid = jax.process_index()
    n_proc = jax.process_count()
    return [int(i) for i in order[pid::n_proc]]


def assert_same_across_hosts(x, name: str = "value"):
    """Cheap consistency check for replicated host-side state."""
    from jax.experimental import multihost_utils

    arr = np.asarray(x, dtype=np.float32).ravel()[:16]
    gathered = multihost_utils.process_allgather(arr)
    if not np.allclose(gathered, gathered[0], atol=1e-6):
        raise AssertionError(f"{name} differs across hosts")
