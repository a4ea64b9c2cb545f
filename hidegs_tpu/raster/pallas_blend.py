"""Pallas TPU tile-blend kernels — the production rasterization hot path.

Replaces the per-pixel sequential front-to-back loop of the reference's
renderCUDA (forward.cu:440-610) with a TPU-shaped formulation:

  * grid over screen tiles; each program blends one 16x16 tile;
  * the tile's (tile,depth)-sorted instance span is streamed from HBM in
    chunks of CHUNK instances (double-buffered DMA);
  * within a chunk, the sequential compositing recurrence becomes matmuls:
       cum = TRI_strict @ log(1-α)        (exclusive prefix, MXU)
       T   = T_carry · exp(cum)
       out += (T·α·mask)ᵀ @ channels      (MXU)
    so the MXU does the "scan" instead of a scalar loop;
  * the whole tile early-exits when every pixel's transmittance drops below
    1e-4 (the block-level termination vote of forward.cu:508-510/558-565).

The backward pass (pallas_backward.py) re-streams chunks and emits
per-instance gradients into disjoint ranges — atomicAdd scatter
(backward.cu:702-769) becomes deterministic per-range stores + a segment-sum
outside the kernel.

Instance attributes are pre-gathered into instance order (one XLA gather) and
packed as one (I, 16) matrix:
  [0:2] mean2d  [2:5] conic  [5:8] rgb  [8] opacity  [9] invdepth
  [10:13] normal  [13] distance  [14:16] pad
Output planes per tile: (P, 16):
  [0:3] rgb  [3] invdepth  [4:7] normal  [7] distance  [8] acc_alpha
  [9] T_final  [10:16] pad
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 64  # instances per inner step
ATTR = 16  # packed attribute channels
OUT_CH = 16  # packed output channels
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def pack_instance_attrs(pre, gid, valid):
    """Gather per-gaussian attrs into instance order, packed (I, ATTR)."""
    N = pre.mean2d.shape[0]
    g = jnp.minimum(gid, N - 1)
    cols = [
        pre.mean2d[g],  # 2
        pre.conic[g],  # 3
        pre.rgb[g],  # 3
        pre.opacity[g][:, None],  # 1
        pre.inv_depth[g][:, None],  # 1
        pre.normal[g],  # 3
        pre.distance[g][:, None],  # 1
        jnp.zeros((gid.shape[0], 2), jnp.float32),
    ]
    # zero entire padding rows: keeps forward exact (α=0) AND blocks any
    # backward garbage from reaching gaussian g=N-1 through the gather
    # transpose (0 * d_attr = 0 only if d_attr is finite — the bwd kernel
    # masks its output too).
    return jnp.concatenate(cols, axis=-1) * valid[:, None].astype(jnp.float32)


def _forward_kernel(
    # scalar prefetch
    tile_start_ref,  # (T,) int32
    tile_count_ref,  # (T,) int32
    # inputs
    attrs_hbm,  # (I, ATTR) in ANY/HBM
    # outputs
    out_ref,  # (1, P, OUT_CH) VMEM block for this tile
    # scratch
    attr_buf,  # (2, CHUNK, ATTR) VMEM
    dma_sems,  # (2,) DMA semaphores
    *,
    tile: int,
    tiles_x: int,
    max_instances: int,
):
    t = pl.program_id(0)
    P = tile * tile
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    num_chunks = pl.cdiv(count, CHUNK)

    # pixel centers of this tile: flatten row-major (y*tile + x) via int ops
    oy = (t // tiles_x) * tile
    ox = (t % tiles_x) * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (lin % tile).astype(jnp.float32)
    py = (lin // tile).astype(jnp.float32)
    pix_x = px + (jnp.float32(0.5) + ox.astype(jnp.float32))
    pix_y = py + (jnp.float32(0.5) + oy.astype(jnp.float32))

    # strictly-lower-triangular ones (row > col) for the prefix matmul
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = (row > col).astype(jnp.float32)

    def get_dma(slot, c):
        # attrs are padded by CHUNK rows so start + c*CHUNK + CHUNK ≤ I always
        off = start + c * CHUNK
        return pltpu.make_async_copy(
            attrs_hbm.at[pl.ds(off, CHUNK), :],
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
        a = attr_buf[slot]  # (CHUNK, ATTR)

        # instance validity inside the chunk (tail masking)
        idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        in_range = (idx + c * CHUNK) < count  # (CHUNK, 1)

        mx = a[:, 0:1]
        my = a[:, 1:2]
        ca = a[:, 2:3]
        cb = a[:, 3:4]
        cc = a[:, 4:5]
        op = a[:, 8:9]

        dx = pix_x - mx  # (CHUNK, P)
        dy = pix_y - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(jnp.minimum(power, 0.0)))
        keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
        alpha = jnp.where(keep, alpha, 0.0)

        log_t = jnp.log1p(-alpha)  # (CHUNK, P)
        cum_excl = jnp.dot(tri, log_t, preferred_element_type=jnp.float32)
        T_excl = T_carry * jnp.exp(cum_excl)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)  # (CHUNK, P)

        # channels: rgb(3) invd(1) normal(3) dist(1) ones(1) → pack to OUT_CH
        ones = jnp.where(in_range, 1.0, 0.0)
        ch = jnp.concatenate(
            [a[:, 5:8], a[:, 9:10], a[:, 10:13], a[:, 13:14], ones,
             jnp.zeros((CHUNK, OUT_CH - 9), jnp.float32)],
            axis=-1,
        )  # (CHUNK, OUT_CH)
        acc = acc + jnp.dot(w.T, ch, preferred_element_type=jnp.float32)  # (P, OUT_CH)

        T_carry = T_carry * jnp.exp(jnp.sum(log_t, axis=0, keepdims=True))
        return c + 1, T_carry, acc

    def cond(state):
        c, T_carry, _ = state
        return (c < num_chunks) & (jnp.max(T_carry) >= T_EPS)

    T0 = jnp.ones((1, P), jnp.float32)
    acc0 = jnp.zeros((P, OUT_CH), jnp.float32)
    c_fin, T_fin, acc = jax.lax.while_loop(cond, chunk_body, (0, T0, acc0))

    # drain any in-flight DMA started for the chunk after the early exit
    @pl.when(c_fin < num_chunks)
    def _():
        get_dma(c_fin % 2, c_fin).wait()

    acc = acc.at[:, 9].set(T_fin[0])
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "tile", "max_instances")
)
def blend_tiles_pallas_fwd(
    attrs: jnp.ndarray,  # (I, ATTR) instance-sorted packed attributes
    tile_start: jnp.ndarray,  # (T,) int32
    tile_count: jnp.ndarray,  # (T,) int32
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
    max_instances: int = 0,
) -> jnp.ndarray:
    """Returns (T, P, OUT_CH) per-tile output planes."""
    T = tiles_y * tiles_x
    P = tile * tile
    I = attrs.shape[0]
    max_instances = max_instances or I
    # pad so the last chunk's DMA window never reads out of bounds
    attrs = jnp.concatenate([attrs, jnp.zeros((CHUNK, ATTR), attrs.dtype)], axis=0)

    kernel = functools.partial(
        _forward_kernel, tile=tile, tiles_x=tiles_x, max_instances=max_instances
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, OUT_CH), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, ATTR), jnp.float32),
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
