"""Buffer-allocation helpers.

JAX 0.9 deduplicates identical constant arrays (two `jnp.zeros` of the same
shape can share one device buffer). Training states that are *donated* to
jitted steps must not alias, or XLA raises "Attempt to donate the same buffer
twice". `fresh_zeros` guarantees a unique buffer per call by materializing
through NumPy.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fresh_zeros(shape, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(np.zeros(shape, dtype=np.dtype(dtype)))


def fresh_zeros_like(x) -> jnp.ndarray:
    return fresh_zeros(x.shape, x.dtype)
