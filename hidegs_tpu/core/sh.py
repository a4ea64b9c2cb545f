"""Real spherical harmonics evaluation for view-dependent color.

Same SH basis/coefficients as the reference (utils/sh_utils.py, PlenOctree
constants; kernel-side eval at cuda_rasterizer/forward.cu:25-138), written as
a single batched polynomial evaluation so XLA fuses it into the preprocess.

Layout: sh coefficients are (N, K, 3) with K = (deg+1)^2 ≤ 16; index 0 is the
DC term. `eval_sh(deg, sh, dirs)` masks bands above `deg` so the buffer can be
allocated at full K=16 while the active degree ramps up during training
(reference: scene/gaussian_model.py:168-170 oneupSHdegree).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

MAX_SH_DEGREE = 3
NUM_SH_COEFFS = (MAX_SH_DEGREE + 1) ** 2  # 16


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate all 16 deg-0..3 SH basis functions at unit dirs (..., 3) → (..., 16)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            C0 * one,
            -C1 * y,
            C1 * z,
            -C1 * x,
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )


def degree_mask(active_degree, total_coeffs: int = NUM_SH_COEFFS) -> jnp.ndarray:
    """(K,) 0/1 mask keeping only bands ≤ active_degree; `active_degree` may be traced."""
    idx = jnp.arange(total_coeffs)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(jnp.float32)


def _sh_basis_components(dirs: jnp.ndarray):
    """The 16 deg-0..3 basis values as a list of (...,) arrays (no stack —
    keeps everything VPU-elementwise; see eval_sh's flat path)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return [
        C0 * jnp.ones_like(x),
        -C1 * y,
        C1 * z,
        -C1 * x,
        C2[0] * xy,
        C2[1] * yz,
        C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz,
        C2[4] * (xx - yy),
        C3[0] * y * (3.0 * xx - yy),
        C3[1] * xy * z,
        C3[2] * y * (4.0 * zz - xx - yy),
        C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        C3[4] * x * (4.0 * zz - xx - yy),
        C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3.0 * yy),
    ]


def eval_sh(active_degree, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH → RGB (before the +0.5 shift / clamp).

    sh: (..., K, 3) with K ≤ 16, or FLAT (..., 3K) with layout
    [k0_r, k0_g, k0_b, k1_r, ...];  dirs: (..., 3) (normalized internally).
    active_degree may be a traced int so the SH warm-up schedule does not
    trigger recompiles.

    The flat layout is the TPU fast path: an (N, K, 3) array pads its 3-wide
    minor dim to 128 lanes (~42x memory blowup — 4 GB of HBM traffic for 500k
    gaussians), while (N, 48) pads only to 128 (2.7x). The flat branch also
    avoids the (N, 16) basis stack: each coefficient column is one (N,)
    multiply-add on the VPU.
    """
    dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-24)
    if sh.ndim == dirs.ndim:
        # flat (..., 3K) layout
        K = sh.shape[-1] // 3
        basis = _sh_basis_components(dirs)
        mask = degree_mask(active_degree, K)
        rgb = []
        for c in range(3):
            acc = (basis[0] * mask[0]) * sh[..., c]
            for k in range(1, K):
                acc = acc + (basis[k] * mask[k]) * sh[..., 3 * k + c]
            rgb.append(acc)
        return jnp.stack(rgb, axis=-1)
    K = sh.shape[-2]
    basis = sh_basis(dirs)[..., :K]  # (..., K)
    mask = degree_mask(active_degree, K)
    return jnp.einsum("...k,...kc->...c", basis * mask, sh)


def sh_to_rgb(active_degree, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Full reference pipeline: eval, +0.5 shift, clamp at 0 (forward.cu:135-137).

    The clamp is a ReLU so autodiff reproduces the reference's clamp-mask
    backward for free.
    """
    return jnp.maximum(eval_sh(active_degree, sh, dirs) + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] → DC SH coefficient (reference: utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * C0 + 0.5
