"""Per-Gaussian screen-space preprocessing shared by all rasterizer paths.

Covers what the reference's `preprocessCUDA` does (cuda_rasterizer/
forward.cu:218-435) minus tile binning: frustum cull, EWA projection, conic,
radius, SH→RGB, and the planar-geometry channels (camera-space normal +
signed plane distance, gaussian_renderer/__init__.py:161-169). Batched pure
JAX; autodiff provides the entire `BACKWARD::preprocess` equivalent.
"""
from __future__ import annotations

from functools import partial
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
    screen_bounds: Optional[tuple] = None,
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
    if screen_bounds is not None:
        # off-screen cull, matching the reference's empty-rect early-out
        # (forward.cu:397-399: a zero-area clamped tile rect leaves radius 0,
        # so fully off-screen gaussians are NOT visible there either).
        # `screen_bounds` is the PADDED canvas (tiles_x·tile, tiles_y·tile):
        # conservative — rows touching only the crop margin are kept, so
        # padded-canvas outputs (and out_observe counts) are unchanged.
        # This is what lets compact_visible drop the typical ~half of the
        # model that a single view never sees.
        w_pad, h_pad = screen_bounds
        r = proj.radius.astype(jnp.float32)
        visible = (
            visible
            & (proj.mean2d[:, 0] + r > 0.0)
            & (proj.mean2d[:, 0] - r < w_pad)
            & (proj.mean2d[:, 1] + r > 0.0)
            & (proj.mean2d[:, 1] - r < h_pad)
        )
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


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _permute_rows(x, vidx, n_rows: int):
    """Row gather x[min(vidx, N-1)] whose TRANSPOSE is a unique-index
    scatter-SET instead of XLA's general scatter-add.

    The generic gather VJP emits scatter-add, which TPU lowers to a
    row-serial loop when it cannot prove the indices unique (~105 ns/row —
    the same pathology the instance-grad fold works around in pallas_vjp).
    Here vidx IS injective over real slots (each model row lands in at most
    one compacted slot) and sentinel entries (vidx == N) are out of bounds,
    so the cotangent can be written with `unique_indices=True, mode='drop'`
    — a fully parallel emission. Padding slots' cotangents are provably zero
    (no instance ever references them), so dropping them is exact."""
    safe = jnp.minimum(vidx, n_rows - 1)
    return jnp.take(x, safe, axis=0)


def _permute_rows_fwd(x, vidx, n_rows: int):
    return _permute_rows(x, vidx, n_rows), vidx


def _permute_rows_bwd(n_rows: int, vidx, ct):
    gx = jnp.zeros((n_rows,) + ct.shape[1:], ct.dtype).at[vidx].set(
        ct, mode="drop", unique_indices=True
    )
    return (gx, None)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def compact_visible(pre: PreprocessedGaussians, budget: int):
    """Pack the VISIBLE rows of `pre` into a (budget, ...) prefix buffer.

    The N-row streams downstream of preprocessing — tile rects, expansion
    cumsum, the 12-field pack, the I-row gather from an N-row table, the
    instance→gaussian gradient fold — all scale with the row count they are
    handed. Per view only ~30–60% of alive rows survive the frustum/radius/
    box cull, so compacting to the visible set before binning shrinks every
    one of those streams (the r4 prefix profile localized the superlinear
    6M-scale cost to exactly these stages, docs/profile_prefix_r4.json).

    Mechanics: dest slot = exclusive cumsum of the visible mask; one int32
    scatter builds the slot→row index map; each field is then a clamped-index
    gather, which is differentiable (its transpose is a unique-index
    scatter-add — no collisions, no serialization). Rows past `budget` are
    dropped deterministically (highest row indices first) and counted in
    `overflow` for host-side re-budgeting, same protocol as max_instances.

    Returns (pre_compact, vidx, num_visible, overflow):
      pre_compact — (budget,)-row PreprocessedGaussians; padding slots carry
        visible=False / opacity=0 / radius=0 so binning ignores them.
      vidx — (budget,) int32 slot → original row (N where padding); use it to
        scatter per-gaussian kernel outputs (out_observe) back to N-domain.
    """
    N = pre.visible.shape[0]
    vis = pre.visible
    visi = vis.astype(jnp.int32)
    pos = jnp.cumsum(visi) - visi  # exclusive cumsum: dest slot per row
    num_visible = pos[-1] + visi[-1] if N > 0 else jnp.int32(0)
    rows = jnp.arange(N, dtype=jnp.int32)
    # unique scatter destinations: visible rows land at their (strictly
    # increasing) cumsum slot, invisible rows at distinct out-of-bounds
    # slots — all-unique lets XLA emit the scatter fully parallel
    dest = jnp.where(vis, pos, budget + rows)
    vidx = jnp.full((budget,), N, jnp.int32)
    vidx = vidx.at[dest].set(rows, mode="drop", unique_indices=True)
    keep = vidx < N  # real rows (False on padding slots)

    # ONE (N, 16) packed gather instead of ten per-field gathers: row
    # gathers on this chip pay a large per-op/per-row cost at tiny minor
    # dims ((N,2)/(N,3) uses 2-3 of 128 lanes), so the field-by-field
    # version cost ~70 ms at 1M rows — batching the fields into a single
    # 16-wide matrix amortizes it
    packed = jnp.concatenate(
        [
            pre.mean2d,  # 0:2
            pre.conic,  # 2:5
            pre.depth[:, None],  # 5
            pre.inv_depth[:, None],  # 6
            pre.opacity[:, None],  # 7
            pre.rgb,  # 8:11
            pre.normal,  # 11:14
            pre.distance[:, None],  # 14
            pre.radius.astype(jnp.float32)[:, None],  # 15
        ],
        axis=-1,
    )
    rows_c = _permute_rows(packed, vidx, N)

    pre_c = PreprocessedGaussians(
        mean2d=rows_c[:, 0:2],
        conic=rows_c[:, 2:5],
        depth=rows_c[:, 5],
        inv_depth=rows_c[:, 6],
        opacity=jnp.where(keep, rows_c[:, 7], 0.0),
        rgb=rows_c[:, 8:11],
        normal=rows_c[:, 11:14],
        distance=rows_c[:, 14],
        radius=jnp.where(keep, rows_c[:, 15].astype(jnp.int32), 0),
        visible=keep,
    )
    overflow = jnp.maximum(num_visible - budget, 0).astype(jnp.int32)
    return pre_c, vidx, num_visible.astype(jnp.int32), overflow
