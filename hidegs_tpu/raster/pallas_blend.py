"""Pallas TPU tile-blend kernels — the production rasterization hot path.

Replaces the per-pixel sequential front-to-back loop of the reference's
renderCUDA (forward.cu:440-610) with a TPU-shaped formulation.

Design (v2, block-pipelined): a TPU Pallas grid is a *sequential* loop on the
TensorCore, so per-tile programs with manual DMA pay fixed overhead per tile
(~88 instances/tile in the BASELINE workload ⇒ overhead-bound). Instead the
grid runs over 128-instance *blocks* of the chunk-aligned instance stream:

  * instance attribute blocks (ATTR, CHUNK) are streamed by the Pallas
    pipeline itself (automatic double buffering; index map b → block b);
  * each block's owning tile comes from scalar-prefetched tables; the output
    block index is that tile, so consecutive blocks of one tile *revisit* the
    same VMEM output buffer and accumulate in place (the canonical Pallas
    reduction pattern); the buffer flushes to HBM when the tile changes;
  * within a block the compositing recurrence is matmuls on the MXU:
       cum_excl = log(1-α) @ TRIU_strict      (prefix over instance lanes)
       out     += (T·α·mask) @ channelsᵀ
    with per-pixel transmittance carried across blocks in VMEM scratch;
  * blocks whose tile is already opaque (max T < 1e-4) skip their compute —
    the block-granular version of forward.cu:508-510's termination vote.

All math is PIXEL-major (P=256 rows, instance lanes). Attributes are stored
transposed (ATTR, I) so every pipeline slice is 128-lane aligned, with chunk-
aligned per-tile spans (see binning.align_binning).

Packed attribute rows (ATTR=16): [0:2] mean2d [2:5] conic [5:8] rgb
[8] opacity [9] invdepth [10:13] normal [13] distance [14:16] pad.
Output planes per tile (P, OUT_CH=16): [0:3] rgb [3] invdepth [4:7] normal
[7] distance [8] acc_alpha [9] T_final [10:16] pad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# instances per block; must be a multiple of 128 (lane-aligned slices).
# Larger blocks amortize per-grid-step overhead at the cost of more wasted
# lanes on sparsely-populated tiles. Overridable for experiments.
import os as _os

CHUNK = int(_os.environ.get("HIDEGS_CHUNK", "128"))
assert CHUNK % 128 == 0
ATTR = 16  # packed attribute channels
OUT_CH = 16  # packed output channels
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def pack_instance_attrs(pre, gid, valid):
    """Gather per-gaussian attrs into instance order, packed (ATTR, I).

    Packs per-GAUSSIAN attributes into one (N+1, ATTR) matrix first (cheap,
    N-sized elementwise), then expands to instances with ONE row gather —
    row gathers move contiguous 64-byte rows, which the TPU does well, unlike
    the 14 per-element gathers this used to be. The sentinel row N is zero,
    so invalid slots read zeros (α=0 → no contribution, and no backward junk
    via the gather transpose).
    """
    N = pre.mean2d.shape[0]
    packed = jnp.concatenate(
        [
            pre.mean2d,  # 2
            pre.conic,  # 3
            pre.rgb,  # 3
            pre.opacity[:, None],  # 1
            pre.inv_depth[:, None],  # 1
            pre.normal,  # 3
            pre.distance[:, None],  # 1
            jnp.zeros((N, ATTR - 14), jnp.float32),
        ],
        axis=-1,
    )  # (N, ATTR)
    packed = jnp.concatenate([packed, jnp.zeros((1, ATTR), jnp.float32)], axis=0)
    g = jnp.where(valid, jnp.minimum(gid, N - 1), N)
    return packed[g].T  # (ATTR, I)


def block_tables(tile_start: jnp.ndarray, tile_count: jnp.ndarray, num_blocks: int):
    """Per-block scalar tables from chunk-aligned tile spans.

    Returns (tile_of (B,), first (B,) int32 0/1, nvalid (B,) int32)."""
    T = tile_start.shape[0]
    starts = jnp.arange(num_blocks, dtype=jnp.int32) * CHUNK
    t_of = jnp.searchsorted(tile_start, starts, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, T - 1)
    local = starts - tile_start[t_of]
    nvalid = jnp.clip(tile_count[t_of] - local, 0, CHUNK)
    first = (local == 0).astype(jnp.int32)
    return t_of, first, nvalid.astype(jnp.int32)


def _block_geometry(a, nvalid, pix_x, pix_y):
    """Per-block α computation. a: (ATTR, CHUNK); pix_*: (P, 1).
    Returns pixel-major (P, CHUNK) tensors."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    in_range = lane < nvalid  # (1, CHUNK)

    mx = a[0:1, :]
    my = a[1:2, :]
    ca = a[2:3, :]
    cb = a[3:4, :]
    cc = a[4:5, :]
    op = a[8:9, :]

    dx = pix_x - mx  # (P, CHUNK)
    dy = pix_y - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
    alpha = jnp.where(keep, alpha, 0.0)
    log_t = jnp.log1p(-alpha)
    return dict(
        alpha=alpha, alpha_raw=alpha_raw, keep=keep, log_t=log_t,
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, power=power, in_range=in_range,
    )


def _block_channels(a, in_range):
    """(OUT_CH, CHUNK) channel matrix: rgb, invd, normal, dist, ones, pad."""
    ones = jnp.where(in_range, 1.0, 0.0)
    return jnp.concatenate(
        [a[5:8, :], a[9:10, :], a[10:13, :], a[13:14, :], ones,
         jnp.zeros((OUT_CH - 9, CHUNK), jnp.float32)],
        axis=0,
    )


def _tile_pixels(t, tiles_x, tile):
    """(P, 1) pixel-center coordinates of tile t."""
    P = tile * tile
    oy = (t // tiles_x) * tile
    ox = (t % tiles_x) * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (lin % tile).astype(jnp.float32)
    py = (lin // tile).astype(jnp.float32)
    return (
        px + (jnp.float32(0.5) + ox.astype(jnp.float32)),
        py + (jnp.float32(0.5) + oy.astype(jnp.float32)),
    )


def _triu(strict: bool):
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((row < col) if strict else (row <= col)).astype(jnp.float32)


def _forward_kernel(
    tile_of_ref,  # (B,) scalar prefetch: owning tile per block
    first_ref,  # (B,) 1 ⇔ first block of its tile
    nvalid_ref,  # (B,) valid instances in block
    attr_ref,  # (ATTR, CHUNK) VMEM — pipelined block
    out_ref,  # (1, P, OUT_CH) VMEM — revisited accumulator for the tile
    obs_ref,  # (1, CHUNK) VMEM — per-instance observe counts for this block
    T_carry,  # (P, 1) VMEM scratch — transmittance across blocks of a tile
    *,
    tile: int,
    tiles_x: int,
):
    b = pl.program_id(0)
    P = tile * tile
    t = tile_of_ref[b]
    nvalid = nvalid_ref[b]
    is_first = first_ref[b] == 1

    @pl.when(is_first)
    def _():
        T_carry[:] = jnp.ones((P, 1), jnp.float32)
        out_ref[0] = jnp.zeros((P, OUT_CH), jnp.float32)

    live_tile = (jnp.max(T_carry[:]) >= T_EPS) & (nvalid > 0)

    @pl.when(jnp.logical_not(live_tile))
    def _():
        obs_ref[:] = jnp.zeros((1, CHUNK), jnp.float32)

    @pl.when(live_tile)
    def _():
        pix_x, pix_y = _tile_pixels(t, tiles_x, tile)
        a = attr_ref[:]
        q = _block_geometry(a, nvalid, pix_x, pix_y)
        alpha, log_t = q["alpha"], q["log_t"]

        cum_excl = jnp.dot(log_t, _triu(True), preferred_element_type=jnp.float32)
        T_excl = T_carry[:] * jnp.exp(cum_excl)  # (P, CHUNK)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)

        ch = _block_channels(a, q["in_range"])  # (OUT_CH, CHUNK)
        contrib = jax.lax.dot_general(
            w, ch, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (P, OUT_CH)
        T_new = T_carry[:] * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))
        T_carry[:] = T_new
        col = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_CH), 1)
        out_ref[0] = jnp.where(col == 9, T_new, out_ref[0] + contrib)
        # observability counter (forward.cu:579-582): #pixels contributed
        # while the pixel was still fresh (T > 0.5)
        obs_ref[:] = jnp.sum(
            ((w > 0) & (T_excl > 0.5)).astype(jnp.float32), axis=0, keepdims=True
        )

    # opaque-tile blocks: keep channel 9 at the carried T (already written by
    # the last live block); nothing else to do.


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile", "num_blocks"))
def blend_tiles_pallas_fwd(
    attrs: jnp.ndarray,  # (ATTR, I_aligned) instance-sorted packed attributes
    tile_start: jnp.ndarray,  # (T,) int32, multiples of CHUNK
    tile_count: jnp.ndarray,  # (T,) int32
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
    num_blocks: int = 0,
) -> jnp.ndarray:
    """Returns (T, P, OUT_CH) per-tile output planes. Tiles with zero
    instances keep background defaults (handled by the caller via masking)."""
    T = tiles_y * tiles_x
    P = tile * tile
    I = attrs.shape[1]
    num_blocks = num_blocks or I // CHUNK
    tile_of, first, nvalid = block_tables(tile_start, tile_count, num_blocks)

    kernel = functools.partial(_forward_kernel, tile=tile, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((ATTR, CHUNK), lambda b, tof, first, nv: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((1, P, OUT_CH), lambda b, tof, first, nv: (tof[b], 0, 0)),
            pl.BlockSpec((1, CHUNK), lambda b, tof, first, nv: (0, b)),
        ],
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.float32)],
    )
    out, observe = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, OUT_CH), jnp.float32),
            jax.ShapeDtypeStruct((1, num_blocks * CHUNK), jnp.float32),
        ],
    )(tile_of, first, nvalid, attrs)

    # empty tiles were never visited → garbage; reset them to (0, T_final=1)
    empty = tile_count == 0
    col = jnp.arange(OUT_CH)
    default = jnp.where(col == 9, 1.0, 0.0).astype(jnp.float32)
    out = jnp.where(empty[:, None, None], default[None, None, :], out)
    return out, observe[0]


def blend_tiles_pallas(pre, binning, tiles_y: int, tiles_x: int, tile: int = 16):
    """Drop-in forward replacement for blend_jnp.blend_tiles (same output dict).

    out_observe is not yet produced by the kernel (needs a per-instance output
    stream); callers needing it use the jnp path. Gradients flow through the
    custom VJP registered in pallas_vjp.py.
    """
    from hidegs_tpu.raster.binning import align_binning
    from hidegs_tpu.raster.pallas_vjp import blend_core

    num_tiles = tiles_y * tiles_x
    N = pre.mean2d.shape[0]
    I = binning.gauss_id.shape[0]
    aligned_size = I + num_tiles * CHUNK
    ab = align_binning(binning, N, num_tiles, CHUNK, aligned_size)
    attrs = pack_instance_attrs(pre, ab.gauss_id, ab.gauss_id < N)
    tile_out, observe = blend_core(
        attrs, ab.tile_start, ab.tile_count, tiles_y, tiles_x, tile
    )
    planes = tiles_to_planes(tile_out, tiles_y, tiles_x, tile)
    planes["out_observe"] = jax.ops.segment_sum(
        observe[: ab.gauss_id.shape[0]],
        jnp.minimum(ab.gauss_id, N),
        num_segments=N + 1,
    )[:N].astype(jnp.int32)
    return planes


def tiles_to_planes(tile_out: jnp.ndarray, tiles_y: int, tiles_x: int, tile: int):
    """(T, P, OUT_CH) → dict of image planes on the padded canvas."""

    img = (
        tile_out.reshape(tiles_y, tiles_x, tile, tile, OUT_CH)
        .transpose(4, 0, 2, 1, 3)
        .reshape(OUT_CH, tiles_y * tile, tiles_x * tile)
    )
    return {
        "render": img[0:3],
        "invdepth": img[3],
        "normal": img[4:7],
        "distance": img[7],
        "alpha": img[8],
        "T_final": img[9],
    }
