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


class AlignedBinning(NamedTuple):
    """Chunk-aligned instance layout for the Pallas kernels: every tile's
    span starts at a multiple of `chunk` (padding slots carry gauss_id = N),
    so per-tile DMA loads are aligned and per-tile backward gradient stores
    are disjoint at chunk granularity."""

    gauss_id: jnp.ndarray  # (I_aligned,) int32 (N = padding)
    tile_start: jnp.ndarray  # (num_tiles,) int32, multiples of chunk
    tile_count: jnp.ndarray  # (num_tiles,) int32 REAL instance counts
    src_slot: jnp.ndarray  # (I,) int32: original sorted instance → aligned slot


class TileBinning(NamedTuple):
    gauss_id: jnp.ndarray  # (I,) int32 instance → gaussian index (N = invalid)
    tile_id: jnp.ndarray  # (I,) int32 instance → tile (num_tiles = invalid sentinel)
    tile_start: jnp.ndarray  # (num_tiles,) int32 start offset into instance list
    tile_count: jnp.ndarray  # (num_tiles,) int32 instances per tile
    num_instances: jnp.ndarray  # () int32 total wanted instances (pre-truncation)
    overflow: jnp.ndarray  # () int32 instances dropped by the static budget


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


@partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "max_instances", "tile"))
def bin_gaussians(
    pre: PreprocessedGaussians,
    tiles_y: int,
    tiles_x: int,
    max_instances: int,
    tile: int = TILE,
) -> TileBinning:
    N = pre.mean2d.shape[0]
    num_tiles = tiles_y * tiles_x
    x0, y0, x1, y1 = compute_tile_rects(pre.mean2d, pre.radius, tiles_y, tiles_x, tile)
    w = (x1 - x0).astype(jnp.int32)
    h = (y1 - y0).astype(jnp.int32)
    touched = jnp.where(pre.visible, w * h, 0)

    starts = jnp.cumsum(touched) - touched  # exclusive cumsum
    total = starts[-1] + touched[-1] if N > 0 else jnp.int32(0)

    # Gather-expansion: slot j belongs to gaussian g = #(starts <= j) - 1.
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    g = jnp.searchsorted(starts, slots, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, N - 1)
    local = slots - starts[g]
    valid = (slots < total) & (local < touched[g])  # guards zero-touched gaussians

    gw = jnp.maximum(w[g], 1)
    tx = x0[g] + local % gw
    ty = y0[g] + local // gw
    tid = ty * tiles_x + tx
    tid = jnp.where(valid, tid, num_tiles)  # sentinel sorts to the end
    gid = jnp.where(valid, g, N)

    depth = jnp.where(valid, pre.depth[g], jnp.inf)
    tid_s, _, gid_s = jax.lax.sort((tid, depth, gid), num_keys=2, is_stable=True)

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
    )


@partial(jax.jit, static_argnames=("num_tiles", "chunk", "aligned_size"))
def align_binning(
    tb: TileBinning, n_gaussians: int, num_tiles: int, chunk: int, aligned_size: int
) -> AlignedBinning:
    """Re-layout the sorted instance list so each tile's span is chunk-aligned.

    `aligned_size` must be ≥ I + num_tiles*chunk (static); padding slots get
    gauss_id = n_gaussians (rendered with α=0 by the kernels).
    """
    I = tb.gauss_id.shape[0]
    padded = ((tb.tile_count + chunk - 1) // chunk) * chunk  # (T,)
    astart = jnp.cumsum(padded) - padded  # exclusive cumsum, multiples of chunk

    slots = jnp.arange(aligned_size, dtype=jnp.int32)
    t_of = jnp.searchsorted(astart, slots, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, num_tiles - 1)
    local = slots - astart[t_of]
    valid = local < tb.tile_count[t_of]
    src = jnp.clip(tb.tile_start[t_of] + local, 0, I - 1)
    gid = jnp.where(valid, tb.gauss_id[src], n_gaussians)

    # original sorted instance → aligned slot (for mapping gradients back)
    tid_cl = jnp.minimum(tb.tile_id, num_tiles - 1)
    src_slot = astart[tid_cl] + (jnp.arange(I, dtype=jnp.int32) - tb.tile_start[tid_cl])
    src_slot = jnp.where(tb.tile_id < num_tiles, src_slot, aligned_size - 1)

    return AlignedBinning(
        gauss_id=gid,
        tile_start=astart.astype(jnp.int32),
        tile_count=tb.tile_count,
        src_slot=src_slot.astype(jnp.int32),
    )
