"""Pallas TPU tile-blend kernels — the production rasterization hot path.

Replaces the per-pixel sequential front-to-back loop of the reference's
renderCUDA (forward.cu:440-610) with a TPU-shaped formulation.

Design (v3, kernel-side windowing): a TPU Pallas grid is a *sequential* loop
on the TensorCore. The grid runs over 128-instance *blocks* of the virtual
chunk-aligned instance stream (every tile's span padded up to a CHUNK
multiple), but the attribute array itself stays in depth-sorted order — the
kernel DMAs each block's window [win_start[b], win_start[b]+CHUNK) straight
out of HBM with double buffering. v2 materialized the aligned stream in HBM
first (gather + 37 MB round-trip, ~9.5 ms on the BASELINE workload); the
manual window DMA makes that re-layout free.

  * per-block scalar-prefetched tables give the owning tile, the first-block
    flag, the valid-lane count, and the sorted-layout window start;
  * the output block index is the owning tile, so consecutive blocks of one
    tile *revisit* the same VMEM output buffer and accumulate in place (the
    canonical Pallas reduction pattern), flushing when the tile changes;
  * within a block the compositing recurrence is matmuls on the MXU:
       cum_excl = log(1-α) @ TRIU_strict      (prefix over instance lanes)
       out     += (T·α·mask) @ channelsᵀ
    with per-pixel transmittance carried across blocks in VMEM scratch;
  * blocks whose tile is already opaque (max T < 1e-4) skip their compute —
    the block-granular version of forward.cu:508-510's termination vote;
  * attribute channel 14 carries the owning gaussian id (exact in f32 below
    2^24); the kernels pass it through to their outputs so the XLA-side
    instance→gaussian segment-sum needs no separately materialized id
    stream (deterministic replacement for backward.cu's atomicAdd scatter).

All math is PIXEL-major (P=256 rows, instance lanes). Attributes are stored
transposed (ATTR, I) so every window slice is a contiguous lane run.

Packed attribute rows (ATTR=16): [0:2] mean2d [2:5] conic [5:8] rgb
[8] opacity [9] invdepth [10:13] normal [13] distance [14] gaussian id
[15] pad. Output planes per tile (P, OUT_CH=16): [0:3] rgb [3] invdepth
[4:7] normal [7] distance [8] acc_alpha [9] T_final [10:16] pad.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

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
GID_CH = 14  # attribute row carrying the gaussian id (as exact float32)
OUT_CH = 16  # packed output channels
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
MAX_EXACT_ID = 1 << 24  # float32 holds integer ids exactly below this


class WindowTables(NamedTuple):
    """Per-block scalar tables for the virtual chunk-aligned stream."""

    tile_of: jnp.ndarray  # (B,) int32 owning tile per block
    first: jnp.ndarray  # (B,) int32 — 1 ⇔ first block of its tile
    nvalid: jnp.ndarray  # (B,) int32 valid instances in block
    win_start: jnp.ndarray  # (B,) int32 sorted-layout window start


def pack_gaussian_matrix(pre) -> jnp.ndarray:
    """Per-GAUSSIAN attributes as one (N+1, ATTR) matrix (differentiable).

    Row N is the zero sentinel (α=0 → no contribution); channel GID_CH holds
    the row's own index so instance expansion carries ids for free.
    """
    N = pre.mean2d.shape[0]
    assert N < MAX_EXACT_ID, "gaussian ids above 2^24 lose float32 exactness"
    ids = jnp.arange(N + 1, dtype=jnp.float32)[:, None]
    packed = jnp.concatenate(
        [
            pre.mean2d,  # 2
            pre.conic,  # 3
            pre.rgb,  # 3
            pre.opacity[:, None],  # 1
            pre.inv_depth[:, None],  # 1
            pre.normal,  # 3
            pre.distance[:, None],  # 1
        ],
        axis=-1,
    )  # (N, 14)
    packed = jnp.concatenate([packed, jnp.zeros((1, 14), jnp.float32)], axis=0)
    return jnp.concatenate(
        [packed, ids, jnp.zeros((N + 1, ATTR - 15), jnp.float32)], axis=-1
    )  # (N+1, ATTR)


def expand_to_instances(
    packed: jnp.ndarray,
    gid: jnp.ndarray,
    tile_start=None,
    tiles_x: int = 0,
    tile: int = 16,
    bf16: bool = False,
) -> jnp.ndarray:
    """(N+1, ATTR) gaussian rows → (ATTR, I + 2*CHUNK) sorted instance stream.

    One contiguous row gather (the TPU-friendly move), transposed to
    lane-major, padded with one spare chunk so every kernel window is in
    bounds. Invalid instances (gid ≥ N) read the zero sentinel row.

    `bf16`: store the stream as bfloat16 (half the HBM bytes and window-DMA
    traffic — the r4 VERDICT #4 experiment). Absolute pixel coordinates do
    NOT survive bf16 (step 8px at x≈1500), so mean2d is re-based to each
    instance's OWNING-TILE ORIGIN first (|rel| ≤ tile+radius, bf16 step
    ≤0.5px at the largest splats); the kernels compute with tile-local
    pixel coordinates in this mode (rel=True) — the math is translation-
    invariant so gradients are unchanged up to bf16 rounding. Requires
    `tile_start` to recover each instance's tile. The gaussian-id channel
    is NOT representable in bf16 (ids ≥ 256 round) — bf16 mode therefore
    requires the id-free "prefix" gradient fold.
    """
    N = packed.shape[0] - 1
    g = jnp.minimum(gid, N)
    attrs = packed[g].T  # (ATTR, I)
    if bf16:
        assert tile_start is not None and tiles_x > 0
        I = gid.shape[0]
        T = tile_start.shape[0]
        # per-instance owning tile: tiny T-row scatter + I-length cummax
        # (searchsorted is a serial binary search per query on TPU)
        seed = jnp.zeros((I + 1,), jnp.int32)
        tid = seed.at[tile_start].max(
            jnp.arange(T, dtype=jnp.int32), mode="drop"
        )[: I]
        tid = jax.lax.cummax(tid)
        ox = ((tid % tiles_x) * tile).astype(jnp.float32)
        oy = ((tid // tiles_x) * tile).astype(jnp.float32)
        attrs = jnp.concatenate(
            [
                (attrs[0:1] - ox[None, :]),
                (attrs[1:2] - oy[None, :]),
                attrs[2:],
            ],
            axis=0,
        ).astype(jnp.bfloat16)
    # 2·CHUNK slack: the kernel's aligned fetches cover [base, base+2·CHUNK)
    # with base ≤ I rounded down to a CHUNK multiple
    return jnp.pad(attrs, ((0, 0), (0, 2 * CHUNK)))


def window_tables(
    tile_start: jnp.ndarray,  # (T,) sorted-layout tile span starts
    tile_count: jnp.ndarray,  # (T,) instances per tile
    num_blocks: int,
    n_instances: int,
) -> WindowTables:
    """Block tables mapping the virtual aligned stream onto sorted windows.

    Negative result (r3, measured at 1M/2.09 Mpix): replacing the
    searchsorted with tiny scatter+cummax chains (t_of/a_of/s_of each a
    T-row scatter + num_blocks cummax) improved this stage 3.7 → 2.9 ms in
    isolation but the end-to-end forward REGRESSED 36.9 → 52.6 ms in the
    A/B (suspected: extra small sequential ops ahead of the kernels'
    scalar-prefetch tables serialize the launch path; single observation on
    a tunneled chip, but every searchsorted run measured 34.5-36.9 ms).
    Isolated stage timings mislead here — keep the searchsorted."""
    T = tile_start.shape[0]
    padded = ((tile_count + CHUNK - 1) // CHUNK) * CHUNK
    astart = jnp.cumsum(padded) - padded  # aligned span starts (multiples of CHUNK)
    bstart = jnp.arange(num_blocks, dtype=jnp.int32) * CHUNK
    t_of = jnp.searchsorted(astart, bstart, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, T - 1)
    local = bstart - astart[t_of]
    nvalid = jnp.clip(tile_count[t_of] - local, 0, CHUNK)
    first = (local == 0).astype(jnp.int32)
    win_start = jnp.clip(tile_start[t_of] + local, 0, n_instances)
    return WindowTables(
        t_of, first, nvalid.astype(jnp.int32), win_start.astype(jnp.int32)
    )


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


BASIS_K = 8  # padded basis columns: [1, x, y, x², xy, y², 0, 0]


def pixel_basis(tile: int) -> jnp.ndarray:
    """(P, BASIS_K) tile-centered polynomial pixel basis for the backward's
    moment-matmul gradient reductions (pallas_vjp).

    Tile-centering keeps |x|,|y| ≤ tile/2 so the expanded quadratic moments'
    cancellation error stays small relative to the reduced gradients."""
    P = tile * tile
    lin = jnp.arange(P, dtype=jnp.int32)
    px = (lin % tile).astype(jnp.float32) + jnp.float32(0.5 - tile / 2)
    py = (lin // tile).astype(jnp.float32) + jnp.float32(0.5 - tile / 2)
    one = jnp.ones((P,), jnp.float32)
    zero = jnp.zeros((P,), jnp.float32)
    return jnp.stack(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1
    )


def _block_channels(a, in_range):
    """(OUT_CH, CHUNK) channel matrix: rgb, invd, normal, dist, ones, pad."""
    ones = jnp.where(in_range, 1.0, 0.0)
    return jnp.concatenate(
        [a[5:8, :], a[9:10, :], a[10:13, :], a[13:14, :], ones,
         jnp.zeros((OUT_CH - 9, CHUNK), jnp.float32)],
        axis=0,
    )


def _tile_pixels(t, tiles_x, tile, rel: bool = False):
    """(P, 1) pixel-center coordinates of tile t.

    `rel` (bf16-stream mode): TILE-LOCAL coordinates — the attribute stream
    carries mean2d re-based to the tile origin (expand_to_instances), so the
    kernel math stays translation-invariant."""
    P = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (lin % tile).astype(jnp.float32)
    py = (lin // tile).astype(jnp.float32)
    if rel:
        return px + jnp.float32(0.5), py + jnp.float32(0.5)
    oy = (t // tiles_x) * tile
    ox = (t % tiles_x) * tile
    return (
        px + (jnp.float32(0.5) + ox.astype(jnp.float32)),
        py + (jnp.float32(0.5) + oy.astype(jnp.float32)),
    )


def _triu(strict: bool):
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((row < col) if strict else (row <= col)).astype(jnp.float32)


def _window_dma(attrs_ref, buf, sem, win_start_ref, slot, idx):
    """Async HBM→VMEM copy of the aligned 2-chunk window covering instance
    window idx into buffer `slot`.

    HBM memrefs are (8,128)-tiled, so DMA slices must be 128-lane aligned:
    fetch lanes [base, base+2·CHUNK) with base = ⌊win_start/CHUNK⌋·CHUNK and
    rotate the unaligned window out in VMEM (`_extract_window`)."""
    base = pl.multiple_of(
        (win_start_ref[idx] // CHUNK) * CHUNK, CHUNK
    )
    return pltpu.make_async_copy(
        attrs_ref.at[:, pl.ds(base, 2 * CHUNK)],
        buf.at[slot],
        sem.at[slot],
    )


def _extract_window(buf2, off):
    """(ATTR, 2·CHUNK) aligned fetch → (ATTR, CHUNK) window at lane `off`.

    roll(x, 2C−off)[j] = x[j+off] for j+off < 2C, so the first CHUNK lanes of
    the rotation are exactly the window."""
    rolled = pltpu.roll(buf2, (2 * CHUNK - off) % (2 * CHUNK), axis=1)
    return rolled[:, :CHUNK]


def _start_input_pipeline(attrs_ref, buf, sem, win_start_ref):
    """Double-buffered window fetch: start b+1's DMA, wait for b's, return
    the current block's (ATTR, CHUNK) attributes as f32 (the stream may be
    stored bf16 — math always runs f32)."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        _window_dma(attrs_ref, buf, sem, win_start_ref, 0, 0).start()

    @pl.when(b + 1 < nb)
    def _():
        _window_dma(attrs_ref, buf, sem, win_start_ref, (b + 1) % 2, b + 1).start()

    _window_dma(attrs_ref, buf, sem, win_start_ref, b % 2, b).wait()
    # upcast BEFORE the rotate: Mosaic's tpu.dynamic_rotate has no bf16
    # lowering; the DMA above already moved the half-width bytes
    return _extract_window(
        buf[b % 2].astype(jnp.float32), win_start_ref[b] % CHUNK
    )


def _tile_center(t, tiles_x, tile):
    """Scalar (cx, cy) pixel-coordinate center of tile t."""
    half = jnp.float32(tile / 2)
    cx = ((t % tiles_x) * tile).astype(jnp.float32) + half
    cy = ((t // tiles_x) * tile).astype(jnp.float32) + half
    return cx, cy


def _forward_kernel(
    tile_of_ref,  # (B,) scalar prefetch: owning tile per block
    first_ref,  # (B,) 1 ⇔ first block of its tile
    nvalid_ref,  # (B,) valid instances in block
    win_start_ref,  # (B,) sorted-layout window starts
    attrs_ref,  # (ATTR, I+2*CHUNK) — stays in HBM; windows DMA'd manually
    out_ref,  # (1, P, OUT_CH) VMEM — revisited accumulator for the tile
    obs_ref,  # (2, CHUNK) VMEM — [counts; gaussian ids] for this block
    T_carry,  # (P, 1) VMEM scratch — transmittance across blocks of a tile
    attr_buf,  # (2, ATTR, CHUNK) VMEM scratch — double-buffered windows
    in_sem,  # DMA semaphores (2,)
    *,
    tile: int,
    tiles_x: int,
    sentinel: float,
    rel: bool = False,
):
    b = pl.program_id(0)
    P = tile * tile
    t = tile_of_ref[b]
    nvalid = nvalid_ref[b]
    is_first = first_ref[b] == 1

    a = _start_input_pipeline(attrs_ref, attr_buf, in_sem, win_start_ref)

    @pl.when(is_first)
    def _():
        T_carry[:] = jnp.ones((P, 1), jnp.float32)
        out_ref[0] = jnp.zeros((P, OUT_CH), jnp.float32)

    live_tile = (jnp.max(T_carry[:]) >= T_EPS) & (nvalid > 0)

    @pl.when(jnp.logical_not(live_tile))
    def _():
        obs_ref[0:1, :] = jnp.zeros((1, CHUNK), jnp.float32)
        obs_ref[1:2, :] = jnp.full((1, CHUNK), sentinel, jnp.float32)

    @pl.when(live_tile)
    def _():
        pix_x, pix_y = _tile_pixels(t, tiles_x, tile, rel=rel)
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
        obs_ref[0:1, :] = jnp.sum(
            ((w > 0) & (T_excl > 0.5)).astype(jnp.float32), axis=0, keepdims=True
        )
        obs_ref[1:2, :] = jnp.where(q["in_range"], a[GID_CH:GID_CH + 1, :], sentinel)

    # opaque-tile blocks: keep channel 9 at the carried T (already written by
    # the last live block); nothing else to do.


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "tile", "num_blocks", "sentinel")
)
def blend_tiles_pallas_fwd(
    attrs: jnp.ndarray,  # (ATTR, I + 2*CHUNK) depth-sorted packed attributes
    tables: WindowTables,
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
    num_blocks: int = 0,
    sentinel: int = 0,
):
    """Returns ((T, P, OUT_CH) per-tile planes, (2, B*CHUNK) obs/gid rows)."""
    T = tiles_y * tiles_x
    P = tile * tile
    num_blocks = num_blocks or tables.tile_of.shape[0]

    kernel = functools.partial(
        _forward_kernel, tile=tile, tiles_x=tiles_x, sentinel=float(sentinel),
        rel=attrs.dtype == jnp.bfloat16,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, P, OUT_CH), lambda b, tof, first, nv, ws: (tof[b], 0, 0)),
            pl.BlockSpec((2, CHUNK), lambda b, tof, first, nv, ws: (0, b)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((2, ATTR, 2 * CHUNK), attrs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, obs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, OUT_CH), jnp.float32),
            jax.ShapeDtypeStruct((2, num_blocks * CHUNK), jnp.float32),
        ],
    )(tables.tile_of, tables.first, tables.nvalid, tables.win_start, attrs)
    return out, obs


def finalize_tile_planes(
    tile_out: jnp.ndarray, tile_count: jnp.ndarray, visited=None
):
    """Reset empty tiles — and tiles beyond the block budget, whose output
    buffer was never written — to background defaults."""
    col = jnp.arange(OUT_CH)
    default = jnp.where(col == 9, 1.0, 0.0).astype(jnp.float32)
    empty = tile_count == 0
    if visited is not None:
        empty = empty | ~visited
    return jnp.where(empty[:, None, None], default[None, None, :], tile_out)


def blend_tiles_pallas(
    pre, binning, tiles_y: int, tiles_x: int, tile: int = 16, max_blocks: int = 0,
    mm: bool = False, grad_reduce: str = "scatter", bf16: bool = False,
):
    """Drop-in forward replacement for blend_jnp.blend_tiles (same output
    dict). Gradients flow through the custom VJP in pallas_vjp.py."""
    from hidegs_tpu.raster.pallas_vjp import blend_packed

    N = pre.mean2d.shape[0]
    packed = pack_gaussian_matrix(pre)
    tile_out, observe = blend_packed(
        packed,
        binning.gauss_id,
        binning.tile_start,
        binning.tile_count,
        binning.slot_s,
        binning.owner,
        binning.g_start,
        tiles_y,
        tiles_x,
        tile,
        max_blocks,
        mm,
        grad_reduce,
        bf16,
    )
    planes = tiles_to_planes(tile_out, tiles_y, tiles_x, tile)
    planes["out_observe"] = observe[:N].astype(jnp.int32)
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
