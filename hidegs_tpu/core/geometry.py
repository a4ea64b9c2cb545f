"""Planar-depth geometry: depth↔points, depth→normal, homography patch warps.

Functional parity with the reference's PGSR-style machinery
(utils/graphics_utils.py:93-165, scene/gaussian_model.py:153-166,767-799),
rebuilt as batched JAX image ops (shifted-slice cross products instead of
gather loops so XLA fuses everything).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hidegs_tpu.core.camera_math import CameraParams, depth_to_points_cam


def depth_to_normal_cam(depth: jnp.ndarray, cam: CameraParams, offset: int = 1) -> jnp.ndarray:
    """(H, W) z-depth → (H, W, 3) camera-space unit normals.

    Cross product of central differences of the unprojected point map
    (reference: utils/graphics_utils.py:130-157 depth_pcd2normal). Border
    pixels get zero normals.
    """
    pts = depth_to_points_cam(depth, cam)  # (H, W, 3)
    H, W = depth.shape
    o = offset
    # central differences via shifted slices
    dx = pts[o:-o, 2 * o :, :] - pts[o:-o, : -2 * o, :]  # (H-2o, W-2o, 3)
    dy = pts[2 * o :, o:-o, :] - pts[: -2 * o, o:-o, :]
    n = jnp.cross(dx, dy)
    # eps-inside-rsqrt: smooth gradient at the zero vectors of empty pixels
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    # orient towards camera: camera at origin, points have +z; normal should
    # face the camera (n · p < 0)
    flip = jnp.where(jnp.sum(n * pts[o:-o, o:-o, :], axis=-1, keepdims=True) > 0, -1.0, 1.0)
    n = n * flip
    out = jnp.zeros((H, W, 3), dtype=depth.dtype)
    return out.at[o:-o, o:-o, :].set(n)


def normal_to_world(normal_cam: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Rotate camera-frame normals to world frame."""
    return normal_cam @ cam.R


def plane_depth_from_blend(
    blended_distance: jnp.ndarray,
    blended_normal: jnp.ndarray,
    cam: CameraParams,
    eps: float = 1e-8,
    max_depth: float = 1e4,
) -> jnp.ndarray:
    """Per-pixel plane-intersection depth from alpha-blended (distance, normal).

    Mirrors forward.cu:607: depth = distance / -(normal · ray + eps), where
    `distance` is the blended signed plane offset -(n·p) and ray the unit-z
    pixel ray. Shapes: (H, W) and (H, W, 3) → (H, W). The output is clamped
    to [-max_depth, max_depth]: empty pixels have near-zero normals, and the
    unclamped quotient overflows f32 downstream (depth→normal squares it).
    """
    from hidegs_tpu.core.camera_math import pixel_rays

    rays = pixel_rays(cam)
    denom = -(jnp.sum(blended_normal * rays, axis=-1) + eps)
    sign = jnp.where(denom >= 0, 1.0, -1.0)
    d = blended_distance / (sign * jnp.maximum(jnp.abs(denom), eps))
    return jnp.clip(d, -max_depth, max_depth)


def patch_offsets(half_window: int) -> jnp.ndarray:
    """((2h+1)^2, 2) integer (du, dv) offsets of a square patch (graphics_utils.py:93-98)."""
    r = jnp.arange(-half_window, half_window + 1)
    du, dv = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([du.reshape(-1), dv.reshape(-1)], axis=-1).astype(jnp.float32)


def homography_from_plane(
    normal_ref: jnp.ndarray,
    distance_ref: jnp.ndarray,
    cam_ref: CameraParams,
    cam_src: CameraParams,
) -> jnp.ndarray:
    """Plane-induced homography mapping ref pixels → src pixels.

    For a plane nᵀX = d in the REF camera frame, a point X on it satisfies
    nᵀX/d = 1, so X_src = R_rel X + t_rel = (R_rel + t_rel nᵀ/d) X, giving
        H = K_src (R_rel + t_rel nᵀ / d) K_ref⁻¹
    (the − form belongs to the nᵀX + d = 0 convention; using it here warps
    patches hundreds of pixels off — caught by the homography-vs-projection
    consistency check in tests). Works for either sign convention of d as
    long as (n, d) satisfy nᵀX = d together — our sampled normals face the
    camera so d < 0, which cancels consistently.
    normal_ref: (..., 3), distance_ref: (...,) → (..., 3, 3) homographies.
    (reference: utils/graphics_utils.py:100-106 patch_warp usage in the
    multi-view NCC loss.)
    """
    R_rel = cam_src.R @ cam_ref.R.T  # ref-cam → src-cam rotation
    t_rel = cam_src.t - R_rel @ cam_ref.t
    K_src = cam_src.K
    K_ref_inv = jnp.linalg.inv(cam_ref.K)
    d = distance_ref[..., None, None]
    n = normal_ref[..., None, :]  # (..., 1, 3)
    M = R_rel + (t_rel[:, None] * n) / jnp.where(jnp.abs(d) < 1e-8, 1e-8, d)
    return jnp.einsum("ij,...jk,kl->...il", K_src, M, K_ref_inv)


def apply_homography(H: jnp.ndarray, uv: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Apply (..., 3, 3) homographies to (..., 2) pixel coords."""
    ones = jnp.ones_like(uv[..., :1])
    p = jnp.concatenate([uv, ones], axis=-1)
    q = jnp.einsum("...ij,...j->...i", H, p)
    w = q[..., 2:3]
    w = jnp.where(jnp.abs(w) < eps, jnp.sign(w) * eps + (w == 0) * eps, w)
    return q[..., :2] / w


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray, pad_value: float = 0.0):
    """Bilinear lookup of (H, W) or (H, W, C) image at float pixel coords.

    uv: (..., 2) in pixel units (u = x/col, v = y/row), pixel centers at
    half-integers. Returns (..., C) (C squeezed if input was 2D) and an
    in-bounds mask (...,). Replaces the reference's grid_sample calls
    (scene/gaussian_model.py:779-784).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    x = uv[..., 0] - 0.5
    y = uv[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = img[yi_c, xi_c]
        return jnp.where(inb[..., None], vals, pad_value)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    out = (
        v00 * (1 - wx_) * (1 - wy_)
        + v01 * wx_ * (1 - wy_)
        + v10 * (1 - wx_) * wy_
        + v11 * wx_ * wy_
    )
    in_bounds = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    if squeeze:
        out = out[..., 0]
    return out, in_bounds
