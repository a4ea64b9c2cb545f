"""Per-Gaussian screen-space preprocessing shared by all rasterizer paths.

Covers what the reference's `preprocessCUDA` does (cuda_rasterizer/
forward.cu:218-435) minus tile binning: frustum cull, EWA projection, conic,
radius, SH→RGB, and the planar-geometry channels (camera-space normal +
signed plane distance, gaussian_renderer/__init__.py:161-169). Batched pure
JAX; autodiff provides the entire `BACKWARD::preprocess` equivalent.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hidegs_tpu.core import sh as shm
from hidegs_tpu.core.camera_math import CameraParams
from hidegs_tpu.core.ewa import H_VAR, NEAR_Z, Projected2D, project_gaussians_scq


class PreprocessedGaussians(NamedTuple):
    """Screen-space per-Gaussian data consumed by binning + blending."""

    mean2d: jnp.ndarray  # (N, 2)
    conic: jnp.ndarray  # (N, 3)
    depth: jnp.ndarray  # (N,) camera z
    inv_depth: jnp.ndarray  # (N,)
    opacity: jnp.ndarray  # (N,) post-AA opacity
    rgb: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3) camera-space plane normal (zeros if geo off)
    distance: jnp.ndarray  # (N,) signed plane distance (zeros if geo off)
    radius: jnp.ndarray  # (N,) int32 pixel radius (0 = culled)
    visible: jnp.ndarray  # (N,) bool


def preprocess_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    cam: CameraParams,
    active_sh_degree=shm.MAX_SH_DEGREE,
    render_geo: bool = False,
    colors_precomp: Optional[jnp.ndarray] = None,
    antialias: bool = True,
    h_var: float = H_VAR,
    near_z: float = NEAR_Z,
    mean2d_offset: Optional[jnp.ndarray] = None,
    boxmin: Optional[jnp.ndarray] = None,
    boxmax: Optional[jnp.ndarray] = None,
    box_exempt: Optional[jnp.ndarray] = None,
) -> PreprocessedGaussians:
    """means3d (N,3) world; scales (N,3) linear; quats (N,4) wxyz;
    opacities (N,) in [0,1]; shs (N,K,3).

    `colors_precomp` bypasses SH evaluation (reference allows either SHs or
    precomputed colors, diff_gaussian_rasterization/__init__.py:194-205).
    `mean2d_offset` is an all-zeros (N, 2) tensor whose gradient exposes the
    screenspace positional gradient for densification — the JAX equivalent of
    the reference's retain_grad'd screenspace_points
    (gaussian_renderer/__init__.py:45-49).
    `boxmin`/`boxmax` ((3,) world coords) enable the chunk-AABB cull
    (forward.cu:319-321): gaussians whose MEAN falls outside the box are
    invisible — per-chunk training confines rasterization to the chunk cell
    so scaffold/padding gaussians outside it cannot soak up gradient.
    `box_exempt` ((N,) bool) spares rows from the cull (skybox/scaffold —
    the reference's skybox lives at 10x scene radius and an unexempted box
    would delete the sky from every chunk render).
    """
    # scalar-expanded fused covariance+projection (see ewa.project_gaussians_scq:
    # VPU-only, no (N,3,3) intermediates, full f32)
    proj: Projected2D = project_gaussians_scq(
        means3d, scales, quats, cam, h_var=h_var, near_z=near_z
    )
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        dirs = means3d - cam.camera_center
        rgb = shm.sh_to_rgb(active_sh_degree, shs, dirs)

    opac = opacities * (proj.aa_factor if antialias else 1.0)

    if render_geo:
        # Per-Gaussian plane: normal = smallest principal axis rotated to
        # camera frame, flipped toward the camera; distance = n · p_cam
        # (gaussian_renderer/__init__.py:161-169, scene/gaussian_model.py:153-166).
        # Scalar-expanded like project_gaussians_scq (XLA CSEs the shared
        # quaternion/rotation/camera-transform subexpressions).
        q = quats * jax.lax.rsqrt(jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-12)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        r = [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
        idx = jnp.argmin(scales, axis=-1)
        sel = [(idx == j).astype(jnp.float32) for j in range(3)]
        n_w = [r[i][0] * sel[0] + r[i][1] * sel[1] + r[i][2] * sel[2] for i in range(3)]
        R, t = cam.R, cam.t
        mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
        ncam = [R[i, 0] * n_w[0] + R[i, 1] * n_w[1] + R[i, 2] * n_w[2] for i in range(3)]
        pcam = [R[i, 0] * mx + R[i, 1] * my + R[i, 2] * mz + t[i] for i in range(3)]
        dot = ncam[0] * pcam[0] + ncam[1] * pcam[1] + ncam[2] * pcam[2]
        # flip so the normal faces the camera (n · p < 0)
        flip = jnp.where(dot > 0, -1.0, 1.0)
        n_cam = jnp.stack([ncam[0] * flip, ncam[1] * flip, ncam[2] * flip], axis=-1)
        # POSITIVE plane distance |n·p| (gaussian_renderer/__init__.py:165
        # local_distance = (...).sum(-1).abs()); with the flip above n·p ≤ 0,
        # so |n·p| = −(n·p). The sign matters: plane_depth divides by
        # −(n·ray) > 0, and a negative distance would flip every depth.
        distance = -flip * dot
    else:
        n_cam = jnp.zeros_like(means3d)
        distance = jnp.zeros_like(proj.depth)

    visible = proj.in_frustum & (proj.radius > 0)
    if boxmin is not None and boxmax is not None:
        inside = jnp.all((means3d >= boxmin) & (means3d <= boxmax), axis=-1)
        if box_exempt is not None:
            inside = inside | box_exempt
        visible = visible & inside
    safe_z = jnp.maximum(proj.depth, near_z)
    return PreprocessedGaussians(
        mean2d=proj.mean2d,
        conic=proj.conic,
        depth=proj.depth,
        inv_depth=jnp.where(visible, 1.0 / safe_z, 0.0),
        opacity=jnp.where(visible, opac, 0.0),
        rgb=rgb,
        normal=n_cam,
        distance=distance,
        radius=jnp.where(visible, proj.radius, 0.0).astype(jnp.int32),
        visible=visible,
    )
