"""Tile binning: gaussian → (tile, depth)-sorted instance lists.

TPU-native replacement for the reference's host-orchestrated
duplicateWithKeys + cub radix sort + identifyTileRanges
(rasterizer_impl.cu:70-142, 321-372). Differences by design:

  * **Static instance budget.** `num_rendered` is data-dependent in the
    reference (D2H sync at rasterizer_impl.cu:329-330). Under XLA we expand
    into a fixed `max_instances` buffer; instances past the budget are
    dropped deterministically and the overflow count is reported so the
    caller can re-budget (SURVEY §7.3 hard-part #1).
  * **Gather-based expansion.** Instead of scattering each gaussian into its
    slots, every instance slot *gathers* its gaussian via a searchsorted over
    the cumulative tile counts — no scatter, fully parallel, XLA-friendly.
  * **Lexicographic sort** via `jax.lax.sort` on (tile_id, depth) replaces
    the 64-bit packed-key radix sort.

All outputs are index/range arrays; nothing here needs gradients (the
instance→gaussian gather is differentiated where it is *used*, in the blend).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidegs_tpu.raster.preprocess import PreprocessedGaussians

TILE = 16  # pixels per tile side (config.h:16-17 BLOCK_X/BLOCK_Y)
ALPHA_MIN = 1.0 / 255.0  # blend kernel's contribution cutoff (forward.cu:558)


class TileBinning(NamedTuple):
    gauss_id: jnp.ndarray  # (I,) int32 instance → gaussian index (N = invalid)
    tile_id: jnp.ndarray  # (I,) int32 instance → tile (num_tiles = invalid sentinel)
    tile_start: jnp.ndarray  # (num_tiles,) int32 start offset into instance list
    tile_count: jnp.ndarray  # (num_tiles,) int32 instances per tile
    num_instances: jnp.ndarray  # () int32 total wanted instances (pre-truncation)
    overflow: jnp.ndarray  # () int32 instances dropped by the static budget
    # sorted-position → pre-sort EXPANSION slot. Expansion order is
    # gaussian-major (rect slots of one gaussian are contiguous), so routing
    # per-instance gradients back through this permutation yields a stream
    # whose gaussian ids are NON-decreasing — the key to replacing the
    # duplicate-colliding scatter-add (which serializes on TPU) with a
    # unique-index scatter + sorted-segment reduction (pallas_vjp).
    slot_s: jnp.ndarray  # (I,) int32
    # expansion slot → owning gaussian (non-decreasing; N beyond num_instances)
    owner: jnp.ndarray  # (I,) int32
    # per-gaussian expansion span boundaries: g_start[i] = first expansion
    # slot of gaussian i, g_start[N] = total wanted instances. Clamped to the
    # budget so prefix-sum boundary differences see exactly the rows that
    # were kept (overflow drops tails).
    g_start: jnp.ndarray  # (N+1,) int32


def tile_grid(height: int, width: int, tile: int = TILE):
    return ( (height + tile - 1) // tile, (width + tile - 1) // tile )


def compute_tile_rects(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    tiles_y: int,
    tiles_x: int,
    tile: int = TILE,
):
    """Per-gaussian inclusive-exclusive tile rectangle (getRect, auxiliary.h).

    Returns (x0, y0, x1, y1) int32 arrays; empty rect (0 area) when radius==0.
    """
    r = radius.astype(jnp.float32)
    x0 = jnp.clip(((mean2d[:, 0] - r) / tile).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((mean2d[:, 1] - r) / tile).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(jnp.ceil((mean2d[:, 0] + r) / tile).astype(jnp.int32), 0, tiles_x)
    y1 = jnp.clip(jnp.ceil((mean2d[:, 1] + r) / tile).astype(jnp.int32), 0, tiles_y)
    valid = radius > 0
    x1 = jnp.where(valid, jnp.maximum(x1, x0), x0)
    y1 = jnp.where(valid, jnp.maximum(y1, y0), y0)
    return x0, y0, x1, y1


def compute_tight_rects(
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    radius: jnp.ndarray,
    tiles_y: int,
    tiles_x: int,
    tile: int = TILE,
):
    """Per-axis, opacity-aware tile rectangle.

    The reference rect is the AABB of the 3·√λmax CIRCLE (forward.cu:379-398)
    — isotropic, so anisotropic splats touch up to ~λmax/λmin more tiles than
    they can ever color. Every blend path drops contributions with
    α = op·exp(−q) < 1/255 (forward.cu:558, our keep masks), so the true
    support along axis u is |d_u| ≤ √(2·B·Σ_uu) with B = ln(op·255): the
    axis-aligned extent of the level set q ≤ B (Σ_uu from the conic inverse).
    Instances outside contribute exactly zero ⇒ bit-identical images with a
    much smaller PRE-cull expansion — which is what sizes the instance
    budget, the sort, and the gather streams.
    """
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    # +1e-3 slack mirrors the exact-cull's fp-roundoff margin
    B = jnp.log(jnp.maximum(opacity, 1e-12) * (1.0 / ALPHA_MIN)) + 1e-3
    live = (radius > 0) & (B > 0)
    B = jnp.maximum(B, 0.0)
    rx = jnp.sqrt(2.0 * B * cc / det)
    ry = jnp.sqrt(2.0 * B * ca / det)
    # never wider than the reference circle (guards degenerate conics)
    r = radius.astype(jnp.float32)
    rx = jnp.minimum(rx, r)
    ry = jnp.minimum(ry, r)
    x0 = jnp.clip(((mean2d[:, 0] - rx) / tile).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((mean2d[:, 1] - ry) / tile).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(jnp.ceil((mean2d[:, 0] + rx) / tile).astype(jnp.int32), 0, tiles_x)
    y1 = jnp.clip(jnp.ceil((mean2d[:, 1] + ry) / tile).astype(jnp.int32), 0, tiles_y)
    x0 = jnp.where(live, x0, 0)
    y0 = jnp.where(live, y0, 0)
    x1 = jnp.where(live, jnp.maximum(x1, x0), 0)
    y1 = jnp.where(live, jnp.maximum(y1, y0), 0)
    return x0, y0, x1, y1


def _tile_min_quadratic(lo_x, hi_x, lo_y, hi_y, ca, cb, cc):
    """Exact min of q(d) = ½(ca·dx² + cc·dy²) + cb·dx·dy over the box
    [lo_x,hi_x]×[lo_y,hi_y] (q = −power of the splat).

    q is convex (conic is PSD); the unconstrained minimum is d=0 (the splat
    center). If the center lies outside the box, the minimum is on one of the
    four edges, where the 1D minimizer along the free axis has a closed form.
    """

    def edge_x(ex):  # edge at dx = ex, dy free in [lo_y, hi_y]
        dy = jnp.clip(-cb * ex / jnp.maximum(cc, 1e-12), lo_y, hi_y)
        return 0.5 * (ca * ex * ex + cc * dy * dy) + cb * ex * dy

    def edge_y(ey):  # edge at dy = ey, dx free in [lo_x, hi_x]
        dx = jnp.clip(-cb * ey / jnp.maximum(ca, 1e-12), lo_x, hi_x)
        return 0.5 * (ca * dx * dx + cc * ey * ey) + cb * dx * ey

    q_edge = jnp.minimum(
        jnp.minimum(edge_x(lo_x), edge_x(hi_x)),
        jnp.minimum(edge_y(lo_y), edge_y(hi_y)),
    )
    inside = (lo_x <= 0) & (0 <= hi_x) & (lo_y <= 0) & (0 <= hi_y)
    return jnp.where(inside, 0.0, q_edge)


@partial(
    jax.jit,
    static_argnames=(
        "tiles_y", "tiles_x", "max_instances", "tile", "depth_bits", "tile_cull",
        "tight_rects",
    ),
)
def bin_gaussians(
    pre: PreprocessedGaussians,
    tiles_y: int,
    tiles_x: int,
    max_instances: int,
    tile: int = TILE,
    depth_bits: int = 0,
    tile_cull: bool = True,
    tight_rects: bool = True,
) -> TileBinning:
    N = pre.mean2d.shape[0]
    num_tiles = tiles_y * tiles_x
    if depth_bits < 0:  # auto: widest quantization that fits [tile|depth] in i32
        depth_bits = max(31 - int(num_tiles + 1).bit_length(), 0)
    depth_bits = min(depth_bits, 23)  # beyond f32-mantissa-ish grain is noise
    if tight_rects:
        x0, y0, x1, y1 = compute_tight_rects(
            pre.mean2d, pre.conic, pre.opacity, pre.radius, tiles_y, tiles_x, tile
        )
    else:
        x0, y0, x1, y1 = compute_tile_rects(
            pre.mean2d, pre.radius, tiles_y, tiles_x, tile
        )
    w = (x1 - x0).astype(jnp.int32)
    h = (y1 - y0).astype(jnp.int32)
    touched = jnp.where(pre.visible, w * h, 0)

    starts = jnp.cumsum(touched) - touched  # exclusive cumsum
    total = starts[-1] + touched[-1] if N > 0 else jnp.int32(0)

    # Expansion: slot j belongs to the last gaussian with start ≤ j. A
    # per-slot searchsorted is death-by-scalar-gather on TPU; instead scatter
    # each gaussian's index at its start slot and take a running max —
    # zero-touched gaussians share their successor's start and lose the max,
    # which is exactly the ownership rule we want.
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    rows_n = jnp.arange(N, dtype=jnp.int32)
    # destinations are all-unique: starts strictly increase over touched>0
    # gaussians, and zero-touched gaussians land on DISTINCT out-of-bounds
    # slots — unique_indices lets XLA emit the scatter fully parallel
    # instead of the row-serial general path (the compact_visible idiom,
    # raster/preprocess.py; same fix as hier/lod.expand_packed)
    dest = jnp.where(touched > 0, starts, max_instances + rows_n)
    owner = jnp.zeros((max_instances,), jnp.int32).at[dest].set(
        rows_n, mode="drop", unique_indices=True
    )
    g = jax.lax.cummax(owner)
    valid = slots < total

    # one row gather for all per-gaussian fields needed below. `starts` can
    # exceed 2^24 (the budget auto-doubles on overflow), so it would lose
    # bits in a single f32 lane — split into exact hi/lo halves (each < 2^12
    # and < budget/2^12 ≤ 2^24, both exactly representable).
    starts_hi = (starts >> 12).astype(jnp.float32)
    starts_lo = (starts & 0xFFF).astype(jnp.float32)
    fields = [
        x0.astype(jnp.float32),
        y0.astype(jnp.float32),
        jnp.maximum(w, 1).astype(jnp.float32),
        starts_hi,
        pre.depth,
        starts_lo,
    ]
    if tile_cull:
        fields += [
            pre.mean2d[:, 0],
            pre.mean2d[:, 1],
            pre.conic[:, 0],
            pre.conic[:, 1],
            pre.conic[:, 2],
            pre.opacity,
        ]
    packed = jnp.stack(fields, axis=-1)  # (N, 6|12)
    rows = packed[g]
    g_start = (rows[:, 3].astype(jnp.int32) << 12) | rows[:, 5].astype(jnp.int32)
    local = slots - g_start
    gw = rows[:, 2].astype(jnp.int32)
    tx = rows[:, 0].astype(jnp.int32) + local % gw
    ty = rows[:, 1].astype(jnp.int32) + local // gw

    if tile_cull:
        # Exact tile-intersection cull. The 3σ-AABB rect above touches many
        # tiles where the splat's alpha stays below the blend kernel's 1/255
        # cutoff at EVERY pixel center — those instances contribute exactly
        # zero (forward.cu:558's skip, our pallas keep-mask), so dropping
        # them here is bit-exact and shrinks the sorted stream, the window
        # tables, both Pallas grids, and the gradient segment-sum. Bound the
        # discrete pixel-center max by the continuous max over the tile box
        # (conservative; keeps a superset of contributing instances).
        u, v = rows[:, 6], rows[:, 7]
        ca, cb, cc = rows[:, 8], rows[:, 9], rows[:, 10]
        op = rows[:, 11]
        lo_x = tx.astype(jnp.float32) * tile + 0.5 - u
        lo_y = ty.astype(jnp.float32) * tile + 0.5 - v
        hi_x = lo_x + (tile - 1)
        hi_y = lo_y + (tile - 1)
        q_min = _tile_min_quadratic(lo_x, hi_x, lo_y, hi_y, ca, cb, cc)
        # keep iff op·exp(−q_min) ≥ ALPHA_MIN, with fp-roundoff slack
        q_budget = jnp.log(jnp.maximum(op, 1e-12) / ALPHA_MIN)
        valid = valid & (q_min <= q_budget + 1e-3)

    tid = ty * tiles_x + tx
    tid = jnp.where(valid, tid, num_tiles)  # sentinel sorts to the end
    gid = jnp.where(valid, g, N)

    owner = jnp.where(slots < total, g, N).astype(jnp.int32)
    depth = jnp.where(valid, rows[:, 4], jnp.inf)
    if depth_bits:
        # single-key sort: [tile | quantized depth] packed in int32 (the
        # reference packs [tile|depth] into 64-bit radix keys,
        # rasterizer_impl.cu:70-115). Depth quantization only reorders
        # near-equal-depth gaussians — visually immaterial, ~2x sort speedup.
        assert (num_tiles + 1) << depth_bits <= (1 << 31), "key overflow"
        dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
        dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
        scale = ((1 << depth_bits) - 1) / jnp.maximum(dmax - dmin, 1e-12)
        dq = jnp.clip(((depth - dmin) * scale), 0, (1 << depth_bits) - 1).astype(jnp.int32)
        dq = jnp.where(valid, dq, (1 << depth_bits) - 1)
        key = (tid << depth_bits) | dq
        key_s, gid_s, slot_s = jax.lax.sort(
            (key, gid, slots), num_keys=1, is_stable=True
        )
        tid_s = key_s >> depth_bits
    else:
        tid_s, _, gid_s, slot_s = jax.lax.sort(
            (tid, depth, gid, slots), num_keys=2, is_stable=True
        )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tid_s, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tid_s, tile_ids, side="right").astype(jnp.int32)

    return TileBinning(
        gauss_id=gid_s,
        tile_id=tid_s,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_instances=total.astype(jnp.int32),
        overflow=jnp.maximum(total - max_instances, 0).astype(jnp.int32),
        slot_s=slot_s,
        owner=owner,
        g_start=jnp.clip(
            jnp.concatenate([starts, jnp.asarray(total).reshape(1)]),
            0, max_instances,
        ).astype(jnp.int32),
    )


# NOTE: the former align_binning() HBM re-layout (sorted → chunk-aligned
# instance stream) is gone: the Pallas kernels now DMA each block's window
# straight out of the sorted stream (pallas_blend.window_tables +
# _start_input_pipeline), which removed a ~9.5 ms gather + round-trip on the
# BASELINE workload.
