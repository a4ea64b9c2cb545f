"""Synthetic toy scenes for tests and benchmarks.

Plays the role the reference has no equivalent of (it has no tests, SURVEY §4)
— a deterministic gaussian-cloud + ring-of-cameras generator sized for the
BASELINE config-1 workload (10k gaussians, one 800x800 view, CPU-runnable).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.core.camera_math import CameraParams, make_camera
from hidegs_tpu.core.sh import NUM_SH_COEFFS, rgb_to_sh_dc


class ToyScene(NamedTuple):
    means3d: jnp.ndarray  # (N, 3)
    scales: jnp.ndarray  # (N, 3) linear
    quats: jnp.ndarray  # (N, 4) wxyz
    opacities: jnp.ndarray  # (N,)
    shs: jnp.ndarray  # (N, 16, 3)


def make_toy_gaussians(
    n: int,
    key=None,
    extent: float = 2.0,
    scale_range=(0.02, 0.12),
    seed: int = 0,
) -> ToyScene:
    if key is None:
        key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    log_lo, log_hi = np.log(scale_range[0]), np.log(scale_range[1])
    scales = jnp.exp(jax.random.uniform(k2, (n, 3), minval=log_lo, maxval=log_hi))
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(k4, (n,), minval=0.3, maxval=0.95)
    rgb = jax.random.uniform(k5, (n, 3), minval=0.05, maxval=0.95)
    shs = jnp.zeros((n, NUM_SH_COEFFS, 3)).at[:, 0, :].set(rgb_to_sh_dc(rgb))
    return ToyScene(means, scales, quats, opac, shs)


def ring_camera(
    idx: int,
    n_cams: int = 8,
    radius: float = 6.0,
    height: int = 128,
    width: int = 128,
    focal: float = None,
    target=(0.0, 0.0, 0.0),
) -> CameraParams:
    """Camera `idx` on a horizontal ring looking at the origin."""
    if focal is None:
        focal = 0.9 * max(height, width)
    theta = 2.0 * np.pi * idx / n_cams
    pos = np.array([radius * np.sin(theta), -0.5, -radius * np.cos(theta)])
    tgt = np.asarray(target, dtype=np.float64)
    fwd = tgt - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # image +y is down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows of R are camera axes in world coords (x=right, y=down, z=fwd)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ pos
    return make_camera(R, t, fx=focal, fy=focal, height=height, width=width)
