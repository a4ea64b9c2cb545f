"""Pallas TPU tile-blend kernels — the production rasterization hot path.

Replaces the per-pixel sequential front-to-back loop of the reference's
renderCUDA (forward.cu:440-610) with a TPU-shaped formulation:

  * grid over screen tiles; each program blends one 16x16 tile (P=256 pixels);
  * the tile's (tile,depth)-sorted instance span is streamed from HBM in
    chunks of CHUNK=128 instances (double-buffered DMA);
  * all math is PIXEL-major (P rows, instance lanes): attributes live
    transposed as (ATTR, I) in HBM so every DMA slice is 128-lane aligned
    (Mosaic requires dim-1 slices aligned to the (·,128) tiling), and the
    aligned binning guarantees chunk starts are multiples of 128;
  * the sequential compositing recurrence becomes matmuls on the MXU:
       cum_excl = log(1-α) @ TRIU_strict          (exclusive prefix over lanes)
       out     += (T·α·mask) @ channelsᵀ
  * the whole tile early-exits when every pixel's transmittance drops below
    1e-4 (the block-level termination vote of forward.cu:508-510/558-565).

The backward (pallas_vjp.py) re-streams chunks and writes per-instance
gradients to disjoint chunk-aligned column ranges — atomicAdd scatter
(backward.cu:702-769) becomes deterministic stores + a segment-sum outside.

Packed attribute rows (ATTR=16, transposed: attrs[a, i] = attribute a of
instance i):
  [0:2] mean2d  [2:5] conic  [5:8] rgb  [8] opacity  [9] invdepth
  [10:13] normal  [13] distance  [14:16] pad
Output planes per tile: (P, OUT_CH=16):
  [0:3] rgb  [3] invdepth  [4:7] normal  [7] distance  [8] acc_alpha
  [9] T_final  [10:16] pad
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128  # instances per inner step (= lane width: aligned DMA slices)
ATTR = 16  # packed attribute channels
OUT_CH = 16  # packed output channels
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def pack_instance_attrs(pre, gid, valid):
    """Gather per-gaussian attrs into instance order, packed (ATTR, I)."""
    N = pre.mean2d.shape[0]
    g = jnp.minimum(gid, N - 1)
    v = valid.astype(jnp.float32)
    rows = [
        pre.mean2d[g, 0] * v,
        pre.mean2d[g, 1] * v,
        pre.conic[g, 0] * v,
        pre.conic[g, 1] * v,
        pre.conic[g, 2] * v,
        pre.rgb[g, 0] * v,
        pre.rgb[g, 1] * v,
        pre.rgb[g, 2] * v,
        pre.opacity[g] * v,  # padding rows: α=0 → no contribution
        pre.inv_depth[g] * v,
        pre.normal[g, 0] * v,
        pre.normal[g, 1] * v,
        pre.normal[g, 2] * v,
        pre.distance[g] * v,
        jnp.zeros_like(v),
        jnp.zeros_like(v),
    ]
    return jnp.stack(rows, axis=0)


def _chunk_geometry(a, c, count, pix_x, pix_y):
    """Shared per-chunk α computation. a: (ATTR, CHUNK) attribute block;
    pix_*: (P, 1) pixel centers. Returns pixel-major (P, CHUNK) tensors."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    in_range = (lane + c * CHUNK) < count  # (1, CHUNK)

    mx = a[0:1, :]  # (1, CHUNK)
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


def _chunk_channels(a, in_range):
    """(OUT_CH, CHUNK) channel matrix: rgb, invd, normal, dist, ones, pad."""
    ones = jnp.where(in_range, 1.0, 0.0)  # (1, CHUNK)
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
    """(CHUNK, CHUNK) upper-triangular ones: row j → columns k (j<k or j≤k).
    Right-multiplying (P, C) by this gives the per-lane prefix sum."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((row < col) if strict else (row <= col)).astype(jnp.float32)


def _forward_kernel(
    tile_start_ref,  # (T,) int32 scalar prefetch (multiples of CHUNK)
    tile_count_ref,  # (T,) int32
    attrs_hbm,  # (ATTR, I_pad) in ANY/HBM
    out_ref,  # (1, P, OUT_CH) VMEM block for this tile
    attr_buf,  # (2, ATTR, CHUNK) VMEM
    dma_sems,  # (2,) DMA semaphores
    *,
    tile: int,
    tiles_x: int,
):
    t = pl.program_id(0)
    P = tile * tile
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    num_chunks = pl.cdiv(count, CHUNK)

    pix_x, pix_y = _tile_pixels(t, tiles_x, tile)
    triu_strict = _triu(strict=True)

    def get_dma(slot, c):
        # aligned binning guarantees start ≡ 0 (mod CHUNK); tell Mosaic so it
        # can prove the slice is tiling-aligned
        off = pl.multiple_of(start + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(off, CHUNK)],
            attr_buf.at[slot],
            dma_sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(state):
        c, T_carry, acc = state
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        a = attr_buf[slot]  # (ATTR, CHUNK)
        q = _chunk_geometry(a, c, count, pix_x, pix_y)
        alpha, log_t = q["alpha"], q["log_t"]

        cum_excl = jnp.dot(log_t, triu_strict, preferred_element_type=jnp.float32)
        T_excl = T_carry * jnp.exp(cum_excl)  # (P, CHUNK)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)

        ch = _chunk_channels(a, q["in_range"])  # (OUT_CH, CHUNK)
        # acc(P, OUT_CH) += w(P, C) · ch(OUT_CH, C)ᵀ — rhs-transposed MXU dot
        acc = acc + jax.lax.dot_general(
            w, ch, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        T_carry = T_carry * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))
        return c + 1, T_carry, acc

    def cond(state):
        c, T_carry, _ = state
        return (c < num_chunks) & (jnp.max(T_carry) >= T_EPS)

    T0 = jnp.ones((P, 1), jnp.float32)
    acc0 = jnp.zeros((P, OUT_CH), jnp.float32)
    c_fin, T_fin, acc = jax.lax.while_loop(cond, chunk_body, (0, T0, acc0))

    # drain the in-flight DMA left by an early exit
    @pl.when(c_fin < num_chunks)
    def _():
        get_dma(c_fin % 2, c_fin).wait()

    # write T_final into channel 9 via masked select (no value-scatter on TPU)
    col = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_CH), 1)
    out_ref[0] = jnp.where(col == 9, T_fin, acc)


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile"))
def blend_tiles_pallas_fwd(
    attrs: jnp.ndarray,  # (ATTR, I) instance-sorted packed attributes
    tile_start: jnp.ndarray,  # (T,) int32, multiples of CHUNK
    tile_count: jnp.ndarray,  # (T,) int32
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
) -> jnp.ndarray:
    """Returns (T, P, OUT_CH) per-tile output planes."""
    T = tiles_y * tiles_x
    P = tile * tile
    # pad the instance axis so the last chunk's DMA window stays in bounds
    attrs = jnp.concatenate([attrs, jnp.zeros((ATTR, CHUNK), attrs.dtype)], axis=1)

    kernel = functools.partial(_forward_kernel, tile=tile, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, OUT_CH), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P, OUT_CH), jnp.float32),
    )(tile_start, tile_count, attrs)


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
    tile_out = blend_core(attrs, ab.tile_start, ab.tile_count, tiles_y, tiles_x, tile)
    planes = tiles_to_planes(tile_out, tiles_y, tiles_x, tile)
    planes["out_observe"] = jnp.zeros((N,), jnp.int32)
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
