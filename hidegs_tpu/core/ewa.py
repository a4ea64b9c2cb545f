"""EWA splatting math: 3D covariance → screen-space 2D covariance / conic.

Re-derivation of the reference kernel math (cuda_rasterizer/forward.cu:141-176
computeCov2D, :355-382 dilation + radius), batched over all Gaussians.

Design notes (TPU-first):
  * Everything is (N,)-vectorized elementwise math → VPU; no 3x3 matmul loop
    is needed because the EWA Jacobian has a closed 2x2 form.
  * Anti-aliasing follows the reference's DGR_FIX_AA convolution-rescale: the
    low-pass dilation adds `h_var` to the diagonal and opacity is rescaled by
    sqrt(det(cov)/det(cov_dilated)). The reference inconsistently uses
    h_var=0.1 in forward and 0.3 in backward (forward.cu:356 vs
    backward.cu:211); we use a single consistent H_VAR (autodiff keeps
    forward/backward consistent by construction) — documented deviation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidegs_tpu.core.camera_math import CameraParams

# Low-pass dilation variance (pixels^2). See module docstring.
H_VAR = 0.1
# Frustum limits matching forward.cu:113-135 (in_frustum): cull z <= 0.2.
NEAR_Z = 0.2


class Projected2D(NamedTuple):
    mean2d: jnp.ndarray  # (N, 2) pixel coords
    depth: jnp.ndarray  # (N,) camera z
    cov2d: jnp.ndarray  # (N, 3) (a, b, c) of [[a, b], [b, c]] AFTER dilation
    conic: jnp.ndarray  # (N, 3) inverse covariance (a, b, c)
    radius: jnp.ndarray  # (N,) float extent radius in pixels (3 sigma)
    aa_factor: jnp.ndarray  # (N,) opacity rescale from AA dilation
    in_frustum: jnp.ndarray  # (N,) bool


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: CameraParams,
    h_var: float = H_VAR,
    near_z: float = NEAR_Z,
) -> Projected2D:
    """Project 3D Gaussians into screen space (EWA approximation).

    means3d: (N, 3) world;  cov3d: (N, 3, 3) world-frame covariance.
    """
    p_cam = means3d @ cam.R.T + cam.t  # (N, 3)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    in_frustum = z > near_z
    zs = jnp.maximum(z, near_z)  # safe z for math on culled points

    # Mirror the reference's tangent-plane clamp (forward.cu:147-155): limit
    # x/z, y/z to 1.3x the frustum half-extent before building the Jacobian.
    # frustum_* = full-frame dims even for band crops (core/camera_math.py).
    tan_half_x = cam.frustum_width / (2.0 * cam.fx)
    tan_half_y = cam.frustum_height / (2.0 * cam.fy)
    txz = jnp.clip(x / zs, -1.3 * tan_half_x, 1.3 * tan_half_x)
    tyz = jnp.clip(y / zs, -1.3 * tan_half_y, 1.3 * tan_half_y)

    # J = d(pixel)/d(world) = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]] @ R
    # Build T = J_cam (2x3) then M = T @ R (2x3); cov2d = M Σ Mᵀ.
    j00 = cam.fx / zs
    j11 = cam.fy / zs
    j02 = -cam.fx * txz / zs
    j12 = -cam.fy * tyz / zs
    zero = jnp.zeros_like(zs)
    J = jnp.stack(
        [
            jnp.stack([j00, zero, j02], axis=-1),
            jnp.stack([zero, j11, j12], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    M = jnp.einsum("nij,jk->nik", J, cam.R)  # (N, 2, 3)
    cov = jnp.einsum("nij,njk,nlk->nil", M, cov3d, M)  # (N, 2, 2)
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 1, 1]

    det_raw = a * c - b * b
    a_d = a + h_var
    c_d = c + h_var
    det_d = a_d * c_d - b * b
    # AA opacity rescale (forward.cu:359-364): sqrt(det / det_dilated).
    aa_factor = jnp.sqrt(jnp.maximum(det_raw / jnp.maximum(det_d, 1e-12), 0.0))

    det_safe = jnp.maximum(det_d, 1e-12)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c_d * inv_det, -b * inv_det, a_d * inv_det], axis=-1)

    # radius = ceil(3 sqrt(max eigenvalue)) (forward.cu:374-382)
    mid = 0.5 * (a_d + c_d)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_d))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # splat centers come from the UNCLAMPED projection (forward.cu:383
    # ndc2Pix of p_proj) — the tangent clamp above exists only to tame the
    # EWA Jacobian; projecting clamped tangents would pin off-frustum
    # gaussians to a border band and kill their position gradients
    u = cam.fx * (x / zs) + cam.cx
    v = cam.fy * (y / zs) + cam.cy
    mean2d = jnp.stack([u, v], axis=-1)

    valid = in_frustum & (det_d > 0.0)
    radius = jnp.where(valid, radius, 0.0)

    return Projected2D(
        mean2d=mean2d,
        depth=z,
        cov2d=jnp.stack([a_d, b, c_d], axis=-1),
        conic=conic,
        radius=radius,
        aa_factor=aa_factor,
        in_frustum=valid,
    )


def project_gaussians_scq(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: CameraParams,
    h_var: float = H_VAR,
    near_z: float = NEAR_Z,
) -> Projected2D:
    """Scalar-expanded EWA projection straight from (scales, quats).

    Numerically equivalent to build_covariance_3d + project_gaussians but
    TPU-shaped: every intermediate is an (N,) component array, so the whole
    chain is VPU elementwise math. The einsum formulation materializes
    (N,2,3)/(N,3,3) intermediates whose 3-wide minor dim pads to 128 lanes —
    a ~42x memory blowup that made preprocess ~5x slower at 500k gaussians —
    and its (N,3)x(3,3) matmuls run at bf16 MXU precision, while this path is
    full f32. Covers forward.cu:141-215 (computeCov2D + computeCov3D) in one
    fused form: cov2d = B Bᵀ with B = J·R_cam·R(q)·diag(s).
    """
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    R, t = cam.R, cam.t
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    pz = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]
    in_frustum = pz > near_z
    zs = jnp.maximum(pz, near_z)

    tan_half_x = cam.frustum_width / (2.0 * cam.fx)
    tan_half_y = cam.frustum_height / (2.0 * cam.fy)
    txz = jnp.clip(px / zs, -1.3 * tan_half_x, 1.3 * tan_half_x)
    tyz = jnp.clip(py / zs, -1.3 * tan_half_y, 1.3 * tan_half_y)
    j00 = cam.fx / zs
    j11 = cam.fy / zs
    j02 = -cam.fx * txz / zs
    j12 = -cam.fy * tyz / zs

    # A = J @ R_cam (2x3); camera R entries are compile-time scalars
    A = [
        [j00 * R[0, k] + j02 * R[2, k] for k in range(3)],
        [j11 * R[1, k] + j12 * R[2, k] for k in range(3)],
    ]
    # rotation components from the (normalized) quaternion
    q = quats * jax.lax.rsqrt(jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    s = [scales[:, 0], scales[:, 1], scales[:, 2]]
    # B = A @ R(q) * diag(s): (2x3) of (N,) arrays
    Brow = [
        [(A[a][0] * r[0][j] + A[a][1] * r[1][j] + A[a][2] * r[2][j]) * s[j] for j in range(3)]
        for a in range(2)
    ]
    a_ = Brow[0][0] ** 2 + Brow[0][1] ** 2 + Brow[0][2] ** 2
    b_ = Brow[0][0] * Brow[1][0] + Brow[0][1] * Brow[1][1] + Brow[0][2] * Brow[1][2]
    c_ = Brow[1][0] ** 2 + Brow[1][1] ** 2 + Brow[1][2] ** 2

    det_raw = a_ * c_ - b_ * b_
    a_d = a_ + h_var
    c_d = c_ + h_var
    det_d = a_d * c_d - b_ * b_
    aa_factor = jnp.sqrt(jnp.maximum(det_raw / jnp.maximum(det_d, 1e-12), 0.0))
    inv_det = 1.0 / jnp.maximum(det_d, 1e-12)
    conic = jnp.stack([c_d * inv_det, -b_ * inv_det, a_d * inv_det], axis=-1)

    mid = 0.5 * (a_d + c_d)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_d))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    u = cam.fx * (px / zs) + cam.cx
    v = cam.fy * (py / zs) + cam.cy

    valid = in_frustum & (det_d > 0.0)
    return Projected2D(
        mean2d=jnp.stack([u, v], axis=-1),
        depth=pz,
        cov2d=jnp.stack([a_d, b_, c_d], axis=-1),
        conic=conic,
        radius=jnp.where(valid, radius, 0.0),
        aa_factor=aa_factor,
        in_frustum=valid,
    )


def gaussian_alpha(
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    pix: jnp.ndarray,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
) -> jnp.ndarray:
    """Evaluate splat alpha at pixel centers.

    mean2d/conic/opacity broadcast against pix (..., 2). Implements the
    reference's per-pixel alpha (forward.cu:530-545): the positive-power guard
    and the 0.99 clamp; the 1/255 cut is returned as a zeroing mask so tiny
    contributions vanish exactly like in the CUDA kernel.
    """
    d = pix - mean2d
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) - conic[..., 1] * dx * dy
    alpha = jnp.minimum(alpha_max, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    keep = (power <= 0.0) & (alpha >= alpha_min)
    return jnp.where(keep, alpha, 0.0)
