"""Morton-order approximate 3-NN mean distance, for initial scale estimation.

TPU-native replacement of simple-knn's `distCUDA2`
(submodules/simple-knn/simple_knn.cu:44-87, spatial.cu:15-26): the CUDA
version Morton-sorts points and searches nearby boxes; here we Morton-sort
and scan a ±`window` neighborhood in sorted order — an O(N·W) gather/sort
pipeline with no data-dependent shapes. Both are approximations; this one
only seeds initial scales (gaussian_model.py:213-216) so approximate is fine.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of each int over 30 bits (every 3rd position)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) float points → (N,) int32 Morton codes on a 1024³ grid."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((q * 1023.0), 0, 1023).astype(jnp.uint32)
    code = (
        (_expand_bits_10(q[:, 0]) << 2)
        | (_expand_bits_10(q[:, 1]) << 1)
        | _expand_bits_10(q[:, 2])
    )
    return code.astype(jnp.int32)


@partial(jax.jit, static_argnames=("window", "k"))
def mean_knn_sq_dist(points: jnp.ndarray, window: int = 16, k: int = 3) -> jnp.ndarray:
    """Per-point mean squared distance to its ~k nearest neighbors.

    Returns (N,) — the quantity the reference feeds into
    sqrt→log→initial scaling. Approximate: neighbors are searched within
    ±window positions in Morton order.
    """
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points))
    sorted_pts = points[order]

    cands = []
    for d in range(1, window + 1):
        for sign in (-1, 1):
            idx = jnp.arange(n) + sign * d
            valid = (idx >= 0) & (idx < n)
            idx_c = jnp.clip(idx, 0, n - 1)
            diff = sorted_pts - sorted_pts[idx_c]
            d2 = jnp.sum(diff * diff, axis=-1)
            cands.append(jnp.where(valid, d2, jnp.inf))
    d2 = jnp.stack(cands, axis=-1)  # (N, 2*window)
    d2_sorted = jnp.sort(d2, axis=-1)[:, :k]
    finite = jnp.isfinite(d2_sorted)
    mean_d2 = jnp.sum(jnp.where(finite, d2_sorted, 0.0), axis=-1) / jnp.maximum(
        finite.sum(axis=-1), 1
    )
    # un-permute back to input order
    out = jnp.zeros((n,), points.dtype).at[order].set(mean_d2)
    return out


def initial_scales(points: jnp.ndarray, window: int = 16) -> jnp.ndarray:
    """sqrt(mean 3-NN squared distance), clamped — the reference's initial
    isotropic scale (gaussian_model.py:213-216)."""
    return jnp.sqrt(jnp.maximum(mean_knn_sq_dist(points, window=window), 1e-7))
