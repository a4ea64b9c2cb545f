"""Rotation / scaling / covariance math for 3D Gaussians.

Functional equivalents of the reference's quaternion+scale covariance builders
(reference: utils/general_utils.py:82-114, cuda_rasterizer/forward.cu:181-215),
re-derived here as batched pure-JAX ops (everything is (N, ...) vectorized so
XLA maps it onto the VPU/MXU; no per-element loops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # sqrt(Σv²+eps) rather than max(‖v‖,eps): jnp.linalg.norm has a NaN
    # gradient at exactly 0, and zero vectors do occur (empty pixels, padded
    # slots) — the eps-inside-sqrt form is smooth everywhere.
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 4) quaternions in (w, x, y, z) order to (..., 3, 3) rotations.

    Quaternions are normalized internally (matching the model's rotation
    activation). Batched; works for any leading shape.
    """
    q = normalize(q, axis=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3, 3) rotation matrices to (..., 4) (w,x,y,z) quaternions.

    Branch-free batched Shepperd's method: compute all four candidate
    quaternions and select by the largest denominator (stable under jit).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _stack(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Candidate 0: trace-dominant
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    q0 = _stack(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    # Candidate 1: m00-dominant
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = _stack((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    # Candidate 2: m11-dominant
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
    q2 = _stack((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    # Candidate 3: m22-dominant
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
    q3 = _stack((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q_rest = jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3))
    q = jnp.where((tr > 0.0)[..., None], q0, q_rest)
    return normalize(q, axis=-1)


def build_scaling_rotation(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """M = R(q) @ diag(s): the Gaussian's local-to-world linear map, (..., 3, 3)."""
    R = quat_to_rotmat(quat)
    return R * scale[..., None, :]


def build_covariance_3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Full 3D covariance Σ = M Mᵀ with M = R diag(s), shape (..., 3, 3)."""
    M = build_scaling_rotation(scale, quat)
    return jnp.einsum("...ij,...kj->...ik", M, M)


def covariance_to_symm6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack a symmetric (..., 3, 3) covariance into the 6-vector layout
    (xx, xy, xz, yy, yz, zz) used by the reference's storage format."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def symm6_to_covariance(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`covariance_to_symm6`."""
    xx, xy, xz, yy, yz, zz = (s[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def smallest_axis(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Unit direction of each Gaussian's smallest principal axis, (..., 3).

    This is the per-Gaussian normal used by the planar (PGSR-style) geometry
    path (reference: scene/gaussian_model.py:153-166). Batched and
    branch-free: one-hot select of the argmin column of R.
    """
    R = quat_to_rotmat(quat)
    idx = jnp.argmin(scale, axis=-1)
    sel = (jnp.arange(3) == idx[..., None]).astype(R.dtype)  # (..., 3)
    # columns of R are the principal axes
    return jnp.einsum("...ij,...j->...i", R, sel)
