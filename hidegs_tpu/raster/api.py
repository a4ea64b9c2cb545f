"""Public differentiable render API.

Equivalent surface to the reference renderer (gaussian_renderer/__init__.py:36-214
`render()` and the GaussianRasterizer settings validation,
diff_gaussian_rasterization/__init__.py:178-230), output-dict compatible:
render / depth(invdepth) / plane_depth / rendered_normal / rendered_distance /
depth_normal / alpha / out_observe / radii / visibility.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax.numpy as jnp

from hidegs_tpu.core import sh as shm
from hidegs_tpu.core.camera_math import CameraParams
from hidegs_tpu.core.geometry import depth_to_normal_cam, plane_depth_from_blend
from hidegs_tpu.raster.binning import TILE, bin_gaussians, tile_grid
from hidegs_tpu.raster.blend_jnp import blend_tiles
from hidegs_tpu.raster.preprocess import preprocess_gaussians

RenderOutputs = Dict[str, jnp.ndarray]

# Production default decided round 2 (VERDICT r1 item 8): the moment-matmul
# backward wins at both scales on v5e hardware — 90.2 vs 92.7 ms fwd+bwd at
# 1M gaussians / 2.09 Mpix, 34.7 vs 34.6 Mpix/s on config-1 — by moving the
# five gradient reductions onto the MXU. The factored VPU path stays behind
# HIDEGS_MM_GEOM=0 as the interpret-mode/debugging reference.
_MM_GEOM_DEFAULT = os.environ.get("HIDEGS_MM_GEOM", "1") == "1"


@dataclass(frozen=True)
class RasterConfig:
    """Static rasterization settings (compile-time constants under jit)."""

    tile: int = TILE
    max_instances: int = 1 << 20  # static instance budget (SURVEY §7.3 #1)
    backend: str = "jnp"  # "jnp" | "pallas" | "oracle"
    antialias: bool = True
    # 0 = exact lexicographic (tile, depth) sort; >0 = single-key sort with
    # this many depth-quantization bits (faster, reorders near-equal depths);
    # -1 = auto (widest quantization that fits [tile|depth] in an int32 key)
    depth_sort_bits: int = 0
    # exact per-instance tile-intersection cull (bit-identical output; drops
    # instances whose alpha < 1/255 at every pixel of their tile)
    tile_cull: bool = True
    # pallas backend: static cap on kernel grid blocks (0 = worst case).
    # Sizing this near the actual post-cull load shrinks both kernels and
    # the gradient segment-sum; overflow is reported as `block_overflow`
    # for host-side re-budgeting (same policy as max_instances).
    max_blocks: int = 0
    # pallas backend: evaluate the per-pixel quadratic form and the backward's
    # gradient reductions as MXU matmuls against a tile-centered pixel basis
    # instead of VPU elementwise + cross-sublane reductions
    mm_geom: bool = _MM_GEOM_DEFAULT
    # pallas backend: store the kernel attribute stream as bfloat16 (half
    # the window-DMA bytes; mean2d rides tile-relative so pixel precision
    # survives — see expand_to_instances). ~0.4% rounding on conic/rgb/
    # opacity; forces the id-free "prefix" gradient fold. EXPERIMENTAL —
    # r4 VERDICT item #4; keep off unless the A/B shows a win.
    bf16_stream: bool = False
    # pallas backend: instance→gaussian gradient fold. "scatter" is XLA's
    # segment-sum (row-serial scatter-add on TPU: fast at small budgets,
    # 74.6 ms of a 126 ms step at 1M gaussians); "prefix" is the scatter-free
    # expansion-order prefix fold (pallas_vjp._prefix_fold); "auto" picks by
    # instance budget (crossover measured on v5e, docs/BENCHMARKS.md r2).
    grad_reduce: str = "auto"
    # visible-row compaction budget: with 0 < max_visible < N, the visible
    # rows are packed into a (max_visible,)-row buffer before binning, so
    # every downstream N-row stream (rects, expansion cumsum, attribute
    # pack, the I-row gather table, the gradient fold) scales with the
    # per-view VISIBLE count instead of the full model. Overflow is counted
    # in `visible_overflow` for host-side re-budgeting (same protocol as
    # max_instances); 0 disables. Bit-exact: culled rows contribute nothing.
    max_visible: int = 0
    # optional hook applied to the PreprocessedGaussians pytree before
    # binning. Used by gaussian-sharded (model-axis) runs to insert a
    # with_sharding_constraint that replicates the compacted screen-space
    # rows: one C×~16 all-gather instead of GSPMD's zero-fill+psum over the
    # V·max_instances expansion (docs/SHARDING.md). Must be a hashable
    # callable (module-level fn or functools.partial); None = no-op.
    pre_constraint: Optional[object] = None


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    cam: CameraParams,
    background: Optional[jnp.ndarray] = None,
    active_sh_degree=shm.MAX_SH_DEGREE,
    render_geo: bool = False,
    colors_precomp: Optional[jnp.ndarray] = None,
    config: RasterConfig = RasterConfig(),
    mean2d_offset: Optional[jnp.ndarray] = None,
    boxmin: Optional[jnp.ndarray] = None,
    boxmax: Optional[jnp.ndarray] = None,
    box_exempt: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    """Differentiable render of a set of 3D Gaussians into `cam`.

    All array args are full-capacity padded buffers; dead gaussians must carry
    opacity 0 (the model layer guarantees this), which culls them here.
    `boxmin`/`boxmax`/`box_exempt`: optional chunk-AABB cull
    (forward.cu:319-321) — see preprocess_gaussians.
    """
    if background is None:
        background = jnp.zeros(3, dtype=jnp.float32)
    H, W = cam.height, cam.width
    tiles_y, tiles_x = tile_grid(H, W, config.tile)

    pre = preprocess_gaussians(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        cam,
        active_sh_degree=active_sh_degree,
        render_geo=render_geo,
        colors_precomp=colors_precomp,
        antialias=config.antialias,
        mean2d_offset=mean2d_offset,
        boxmin=boxmin,
        boxmax=boxmax,
        box_exempt=box_exempt,
        screen_bounds=(tiles_x * config.tile, tiles_y * config.tile),
    )

    if config.pre_constraint is not None:
        pre = config.pre_constraint(pre)

    if config.backend == "oracle":
        from hidegs_tpu.raster.oracle import render_oracle

        out = render_oracle(pre, cam, background=background, render_geo=render_geo)
        out["radii"] = pre.radius
        out["visibility"] = pre.visible & (pre.radius > 0)
        return out

    # full-model (N-domain) outputs captured before any compaction
    radii_full = pre.radius
    visible_full = pre.visible & (pre.radius > 0)
    N_full = pre.visible.shape[0]
    vidx = None
    # demand counter even when compaction is off, so the host can FIT an
    # initial max_visible budget from observed peaks before enabling it
    num_visible = jnp.sum(visible_full.astype(jnp.int32))
    visible_overflow = jnp.int32(0)
    if 0 < config.max_visible < N_full:
        from hidegs_tpu.raster.preprocess import compact_visible

        pre, vidx, num_visible, visible_overflow = compact_visible(
            pre, config.max_visible
        )

    tb = bin_gaussians(
        pre, tiles_y, tiles_x, config.max_instances, config.tile,
        depth_bits=config.depth_sort_bits, tile_cull=config.tile_cull,
    )
    block_overflow = jnp.int32(0)
    blocks_needed = jnp.int32(0)
    if config.backend == "pallas":
        from hidegs_tpu.raster.pallas_blend import blend_tiles_pallas
        from hidegs_tpu.raster.pallas_vjp import needed_blocks

        blocks_needed = needed_blocks(tb.tile_count)

        grad_reduce = config.grad_reduce
        if grad_reduce == "auto":
            # measured crossover on v5e: the scatter-add's ~105 ns/row serial
            # cost overtakes the prefix fold's fixed sort+gather+cumsum
            # passes around ~2^18 instances
            grad_reduce = "scatter" if config.max_instances <= (1 << 18) else "prefix"
        if config.bf16_stream:
            grad_reduce = "prefix"  # bf16 can't carry gaussian ids
        planes = blend_tiles_pallas(
            pre, tb, tiles_y, tiles_x, config.tile, config.max_blocks,
            mm=config.mm_geom, grad_reduce=grad_reduce,
            bf16=config.bf16_stream,
        )
        if config.max_blocks:
            block_overflow = jnp.maximum(blocks_needed - config.max_blocks, 0)
    else:
        planes = blend_tiles(pre, tb, tiles_y, tiles_x, config.tile)

    def crop(x):
        return x[..., :H, :W]

    color = crop(planes["render"]) + crop(planes["T_final"])[None] * background[:, None, None]
    observe = planes["out_observe"]
    if vidx is not None:
        # kernel outputs are in the compacted domain — scatter per-gaussian
        # observation counts back to model rows (unique indices; sentinel
        # budget-slot index N drops)
        observe = (
            jnp.zeros((N_full,), observe.dtype)
            .at[vidx]
            .set(observe, mode="drop", unique_indices=True)
        )
    out: RenderOutputs = {
        "render": color,
        "invdepth": crop(planes["invdepth"]),
        "alpha": crop(planes["alpha"]),
        "T_final": crop(planes["T_final"]),
        "out_observe": observe,
        "radii": radii_full,
        "visibility": visible_full,
        "overflow": tb.overflow,
        "block_overflow": block_overflow,
        # demand counters for host-side re-budgeting (grow AND shrink)
        "num_instances": tb.num_instances,
        "needed_blocks": blocks_needed,
        "num_visible": num_visible,
        "visible_overflow": visible_overflow,
    }
    if render_geo:
        nrm = crop(planes["normal"])
        dist = crop(planes["distance"])
        out["rendered_normal"] = nrm
        out["rendered_distance"] = dist
        out["plane_depth"] = plane_depth_from_blend(dist, jnp.moveaxis(nrm, 0, -1), cam)
        # normal re-derived from the plane depth map (render_normal,
        # gaussian_renderer/__init__.py:21-33) for the single-view loss.
        out["depth_normal"] = jnp.moveaxis(depth_to_normal_cam(out["plane_depth"], cam), -1, 0)
    return out


def render_coarse(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    cam: CameraParams,
    indices: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    active_sh_degree=shm.MAX_SH_DEGREE,
    config: RasterConfig = RasterConfig(),
) -> RenderOutputs:
    """Coarse/scaffold render of an optional index subset — color only, no
    depth/geometry planes (reference render_coarse,
    gaussian_renderer/__init__.py:376-488).

    With `indices`, only those gaussians are rasterized and `visibility` is
    scattered back to full length so densification stats keep their indexing
    (reference :476-482). On TPU the subset is one static-shape gather, so
    the step stays jittable for a fixed subset size.
    """
    if indices is not None:
        sub = lambda a: jnp.take(a, indices, axis=0)
        means3d, scales, quats, opacities, shs = (
            sub(means3d), sub(scales), sub(quats), sub(opacities), sub(shs)
        )
    out = render(
        means3d, scales, quats, opacities, shs, cam,
        background=background, active_sh_degree=active_sh_degree,
        render_geo=False, config=config,
    )
    if indices is not None:
        # visibility here is subset-indexed; use scatter_subset_visibility to
        # map it back onto the full arrays for densification stats
        out["subset_indices"] = indices
    return out


def scatter_subset_visibility(
    vis_subset: jnp.ndarray, indices: jnp.ndarray, n_full: int
) -> jnp.ndarray:
    """Expand subset visibility back to the full array (reference
    render_coarse's vis_filter reassembly, gaussian_renderer/__init__.py:476-482)."""
    return jnp.zeros((n_full,), bool).at[indices].set(vis_subset)


def round_budget(want: int) -> int:
    """Round a budget up to the next quarter-octave step (m·2^k, m ∈
    {16,20,24,28}) — at most +25% overprovisioning (vs +100% for pure
    powers of two, which at 1M gaussians doubled the sort/expand/reduce
    streams) while keeping the compile cache to ≤4 shapes per octave."""
    want = max(int(want), 1 << 10)
    k = (want - 1).bit_length() - 5  # 16·2^k < want ≤ 32·2^k
    for m in (16, 20, 24, 28):
        if m << k >= want:
            return m << k
    return 32 << k


def suggest_max_instances(n_gaussians: int, mult: int = 8, floor: int = 1 << 16) -> int:
    """Heuristic static budget: `mult` tile-instances per gaussian, rounded
    up to a quarter-octave step so recompiles are rare when N changes."""
    return round_budget(max(floor, mult * n_gaussians))
