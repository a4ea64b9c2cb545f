"""Custom VJP for the Pallas tile blend: analytic backward kernels.

TPU re-design of the reference backward (backward.cu renderCUDA :500-772):
instead of re-walking tiles back-to-front with atomicAdd gradient scatter,
one block-pipelined grid pass runs front-to-back over the virtual
chunk-aligned instance stream (same windowed-DMA structure as the forward,
see pallas_blend.py):

  The per-tile totals need no kernel at all: the forward's saved output IS
  Σ_k w_k·ch_k per channel, so G_total(p) = Σ_ch out(p,ch)·g(p,ch) and
  T_final(p) = out(p, 9) — two elementwise XLA ops on the residual.
  Then per block, the suffix sum S_k = G_total − prefix_incl_k +
          T_final·g_T gives the classic alpha gradient
            dα_k = m_k·T_k·(ch_k·g) − S_k/(1−α_k)
          (backward.cu:694-698's accum_rec recurrence in closed form); the
          chain rule to opacity/conic/mean2d runs vectorized and each block's
          (ATTR, CHUNK) gradient tile — gaussian ids passed through in
          channel GID_CH — is written to its own disjoint slot, then one
          deterministic segment-sum folds instances onto gaussians
          (no atomics; SURVEY §7.3 hard-part #2).

The custom_vjp boundary is `blend_packed`: per-GAUSSIAN attribute rows in,
per-gaussian gradient rows out. Instance expansion (a contiguous row gather)
happens inside the forward, so its transpose is exactly the segment-sum the
backward kernel's gid channel enables.

Prefix sums within a block are (P,C)@(C,C) upper-triangular matmuls (MXU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hidegs_tpu.raster.pallas_blend import (
    ALPHA_MAX,
    ATTR,
    BASIS_K,
    CHUNK,
    GID_CH,
    OUT_CH,
    T_EPS,
    WindowTables,
    _block_channels,
    _block_geometry,
    _start_input_pipeline,
    _tile_center,
    _tile_pixels,
    _triu,
    blend_tiles_pallas_fwd,
    expand_to_instances,
    finalize_tile_planes,
    pixel_basis,
    window_tables,
)


def _passB_kernel(
    tile_of_ref, first_ref, nvalid_ref, win_start_ref,
    attrs_ref,  # (ATTR, I+2*CHUNK) in HBM; windows DMA'd manually
    g_ref,  # (1, P, OUT_CH) cotangents; aux ch10 = G_total, ch11 = T_final·gT
    *rest,  # [u_ref (P, BASIS_K) if mm] d_ref, scratch...
    tile: int,
    tiles_x: int,
    sentinel: float,
    mm: bool = False,
    rel: bool = False,
):
    if mm:
        u_ref, d_ref, T_carry, R_carry, attr_buf, in_sem = rest
    else:
        u_ref = None
        d_ref, T_carry, R_carry, attr_buf, in_sem = rest
    b = pl.program_id(0)
    P = tile * tile
    t = tile_of_ref[b]
    nvalid = nvalid_ref[b]

    a = _start_input_pipeline(attrs_ref, attr_buf, in_sem, win_start_ref)

    @pl.when(first_ref[b] == 1)
    def _():
        T_carry[:] = jnp.ones((P, 1), jnp.float32)
        R_carry[:] = jnp.zeros((P, 1), jnp.float32)

    # Skip-to-zero cases: pure-padding blocks (the static-slack tail), and
    # blocks of already-opaque tiles — once T < 1e-4 every instance gets a
    # vanishing gradient (w ≈ 0, S ≈ 0), which the CUDA backward also skips
    # by walking only contributing gaussians (backward.cu:500-560). This
    # mirrors the forward's early-termination skip and is what keeps the
    # backward at forward-like cost.
    live = (jnp.max(T_carry[:]) >= T_EPS) & (nvalid > 0)

    @pl.when(jnp.logical_not(live))
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (ATTR, CHUNK), 0)
        d_ref[:] = jnp.where(row == GID_CH, sentinel, 0.0)

    @pl.when(live)
    def _():
        pix_x, pix_y = _tile_pixels(t, tiles_x, tile, rel=rel)
        q = _block_geometry(a, nvalid, pix_x, pix_y)
        alpha, log_t = q["alpha"], q["log_t"]
        cum_excl = jnp.dot(log_t, _triu(True), preferred_element_type=jnp.float32)
        T_excl = T_carry[:] * jnp.exp(cum_excl)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)

        g = g_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_CH), 1)
        g_ch = jnp.where((col == 9) | (col >= 10), 0.0, g)
        ch = _block_channels(a, q["in_range"])
        chg = jnp.dot(g_ch, ch, preferred_element_type=jnp.float32)  # (P, CHUNK)

        G_total = g[:, 10:11]
        S_base = g[:, 11:12]

        contrib = w * chg
        prefix_incl = R_carry[:] + jnp.dot(
            contrib, _triu(False), preferred_element_type=jnp.float32
        )
        S = (G_total - prefix_incl) + S_base  # (P, CHUNK)

        live_g = (q["keep"] & (q["alpha_raw"] < ALPHA_MAX)).astype(jnp.float32)
        d_alpha = T_excl * chg - S / (1.0 - alpha)
        d_power = d_alpha * alpha * live_g

        ca, cb, cc = q["ca"], q["cb"], q["cc"]
        if mm:
            # All five weighted reductions are moments of d_power against the
            # tile-centered pixel basis: one (K, P) @ (P, CHUNK) matmul, then
            # lane-wide algebra. E.g. Σ_p dx²·dp = Mxx − 2·mxc·Mx + mxc²·M0.
            # d_op comes free: within live_g, α = op·exp(min(power,0)), so
            # Σ dα·∂α/∂op = Σ d_power / op = M0 / op.
            # Precision: Mosaic's default f32 matmul is a bf16 pass — fine for
            # the compositing matmuls, but the moments carry pixel-coordinate
            # dynamic range; HIGHEST requests full f32 (Mosaic rejects HIGH).
            M = jax.lax.dot_general(
                u_ref[...], d_power, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (BASIS_K, CHUNK); rows: Σdp, Σx·dp, Σy·dp, Σx²dp, Σxy·dp, Σy²dp
            M0, Mx, My = M[0:1, :], M[1:2, :], M[2:3, :]
            Mxx, Mxy, Myy = M[3:4, :], M[4:5, :], M[5:6, :]
            if rel:
                # tile-local coords: the tile "center" is (tile/2, tile/2)
                cx = jnp.float32(tile / 2)
                cy = jnp.float32(tile / 2)
            else:
                cx, cy = _tile_center(t, tiles_x, tile)
            mxc = a[0:1, :] - cx
            myc = a[1:2, :] - cy
            op = a[8:9, :]
            d_ca = -0.5 * (Mxx - 2.0 * mxc * Mx + mxc * mxc * M0)
            d_cb = -(Mxy - mxc * My - myc * Mx + mxc * myc * M0)
            d_cc = -0.5 * (Myy - 2.0 * myc * My + myc * myc * M0)
            d_mx = ca * (Mx - mxc * M0) + cb * (My - myc * M0)
            d_my = cc * (My - myc * M0) + cb * (Mx - mxc * M0)
            d_op = jnp.where(op > 1e-12, M0 / op, 0.0)
        else:
            d_op_pix = d_alpha * jnp.exp(jnp.minimum(q["power"], 0.0)) * live_g
            dx, dy = q["dx"], q["dy"]
            d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=0, keepdims=True)  # (1, CHUNK)
            d_cb = jnp.sum(-(dx * dy) * d_power, axis=0, keepdims=True)
            d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=0, keepdims=True)
            d_mx = jnp.sum(d_power * (ca * dx + cb * dy), axis=0, keepdims=True)
            d_my = jnp.sum(d_power * (cc * dy + cb * dx), axis=0, keepdims=True)
            d_op = jnp.sum(d_op_pix, axis=0, keepdims=True)

        # d(channels) = g_chᵀ·w → (OUT_CH, CHUNK)
        d_ch = jax.lax.dot_general(
            g_ch, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        gid_row = jnp.where(q["in_range"], a[GID_CH:GID_CH + 1, :], sentinel)
        d_ref[:] = jnp.concatenate(
            [
                d_mx, d_my, d_ca, d_cb, d_cc,
                d_ch[0:3, :],  # rgb
                d_op,
                d_ch[3:4, :],  # invdepth
                d_ch[4:7, :],  # normal
                d_ch[7:8, :],  # distance
                gid_row,
                jnp.zeros((ATTR - 15, CHUNK), jnp.float32),
            ],
            axis=0,
        )

        R_carry[:] = R_carry[:] + jnp.sum(contrib, axis=1, keepdims=True)
        T_carry[:] = T_carry[:] * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "tile", "num_blocks", "sentinel", "mm"),
)
def blend_tiles_pallas_bwd(
    attrs: jnp.ndarray,  # (ATTR, I + 2*CHUNK) depth-sorted
    tables: WindowTables,
    g_tiles: jnp.ndarray,  # (T, P, OUT_CH) cotangents + aux totals (ch10/ch11)
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
    num_blocks: int = 0,
    sentinel: int = 0,
    mm: bool = False,
) -> jnp.ndarray:
    P = tile * tile
    num_blocks = num_blocks or tables.tile_of.shape[0]

    kernelB = functools.partial(
        _passB_kernel, tile=tile, tiles_x=tiles_x, sentinel=float(sentinel),
        mm=mm, rel=attrs.dtype == jnp.bfloat16,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, P, OUT_CH), lambda b, tof, f, nv, ws: (tof[b], 0, 0)),
    ]
    inputs = [attrs, g_tiles]
    if mm:
        in_specs.append(pl.BlockSpec((P, BASIS_K), lambda b, tof, f, nv, ws: (0, 0)))
        inputs.append(pixel_basis(tile))
    gridB = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ATTR, CHUNK), lambda b, tof, f, nv, ws: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((2, ATTR, 2 * CHUNK), attrs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernelB,
        grid_spec=gridB,
        out_shape=jax.ShapeDtypeStruct((ATTR, num_blocks * CHUNK), jnp.float32),
    )(tables.tile_of, tables.first, tables.nvalid, tables.win_start, *inputs)


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def blend_packed(
    packed, gid, tile_start, tile_count, slot_s, owner, g_start,
    tiles_y, tiles_x, tile, max_blocks=0, mm=False, grad_reduce="scatter",
    bf16=False,
):
    """(N+1, ATTR) per-gaussian attribute rows + sorted instance ids/ranges →
    ((T, P, OUT_CH) tile planes, (N+1,) per-gaussian observe counts).

    `max_blocks` (static) caps the kernel grid / gradient-stream length; 0
    means the worst case (every tile's span padded to a CHUNK multiple).
    A smaller budget shrinks both Pallas grids and the gradient segment-sum
    to the actual post-cull load; tiles whose blocks fall beyond the budget
    render as empty (the caller re-budgets via the block_overflow output,
    same policy as the instance budget, SURVEY §7.3 #1).

    `mm` (static) selects the matmul-geometry kernels (quadratic form and
    gradient reductions on the MXU against a tile-centered pixel basis).

    `grad_reduce` (static) picks the instance→gaussian gradient fold:
      "scatter" — direct segment-sum over the kernel's block stream. XLA's
          scatter-add is row-serial on TPU (~105 ns/row): fine at small
          budgets, 74.6 ms of a 126 ms step at 1M gaussians / 2 Mpix.
      "prefix"  — scatter-free: route rows back to EXPANSION order (where
          each gaussian's instances are contiguous at statically known
          boundaries) via a tiny block scatter + cummax + one sort + one
          gather, then an exclusive prefix sum with boundary differences
          (_expansion_row_index/_prefix_fold). f32 prefix cancellation is
          bounded by the global gradient-magnitude sum (validated ~1e-6
          relative against "scatter" on the bench scene).
    """
    out, _res = _blend_packed_fwd(
        packed, gid, tile_start, tile_count, slot_s, owner, g_start,
        tiles_y, tiles_x, tile, max_blocks, mm, grad_reduce, bf16,
    )
    return out


def _tables_and_attrs(
    packed, gid, tile_start, tile_count, tiles_y, tiles_x, max_blocks=0,
    tile=16, bf16=False,
):
    N = packed.shape[0] - 1
    I = gid.shape[0]
    num_tiles = tiles_y * tiles_x
    worst = (I + num_tiles * CHUNK) // CHUNK
    num_blocks = min(max_blocks, worst) if max_blocks else worst
    tables = window_tables(tile_start, tile_count, num_blocks, I)
    attrs = expand_to_instances(
        packed, gid, tile_start=tile_start, tiles_x=tiles_x, tile=tile,
        bf16=bf16,
    )
    return N, num_blocks, tables, attrs


def _expansion_row_index(tables, slot_s, num_blocks):
    """Block-stream row index of every EXPANSION slot (R = num_blocks·CHUNK
    sentinel for slots whose instance was culled / over budget).

    TPU cost profile (docs/BENCHMARKS.md r2 primitives): scatters are
    row-serial (~105 ns/row — 72 ms for 1M rows) and searchsorted is worse,
    while gathers (~9 ns/row), sorts (~4 ms/1M) and cumsums (~3 ms/1M) are
    fine. So everything here is built from a TINY (num_blocks-row) scatter,
    cummax, and one sort:

      * sorted-stream position j in block b sits at kernel row
        b·CHUNK + (j − win_start[b]); the piecewise shift b·CHUNK −
        win_start[b] is non-decreasing, so a num_blocks-sized scatter at the
        window starts + a cummax materializes it per position;
      * a position is covered iff j < win_start[b] + nvalid[b] — same
        trick with cover_upto = cummax(scatter(win_start, win_start+nvalid));
      * routing to expansion order inverts `slot_s` with ONE sort whose
        payload is the (masked) row index.
    """
    I = slot_s.shape[0]
    R = num_blocks * CHUNK
    bidx = jnp.arange(num_blocks, dtype=jnp.int32)
    ws = tables.win_start
    shift = bidx * CHUNK - ws
    zero = jnp.zeros((I,), jnp.int32)
    # Padding blocks past the stream have win_start clamped to I by
    # window_tables; mode="drop" must actually drop them — clipping ws to
    # I-1 here would misroute their scatter onto the last real slot and mark
    # it covered with a bogus rowpos exactly when the instance budget is
    # saturated (silently dropping the final instance's gradient/observe).
    shift_at = zero.at[ws].max(shift, mode="drop")
    rowpos = jnp.arange(I, dtype=jnp.int32) + jax.lax.cummax(shift_at)
    cover_at = zero.at[ws].max(ws + tables.nvalid, mode="drop")
    covered = jnp.arange(I, dtype=jnp.int32) < jax.lax.cummax(cover_at)
    rowpos = jnp.where(covered, jnp.clip(rowpos, 0, R - 1), R)
    # invert the sort permutation: sorting (slot_s, rowpos) by slot_s leaves
    # payload[k] = kernel row of expansion slot k
    _, row_of_slot = jax.lax.sort((slot_s, rowpos), num_keys=1, is_stable=True)
    return row_of_slot  # (I,) int32, R = "no row" sentinel


def _prefix_fold(rows_exp, g_start, block: int = 512):
    """(I, K) expansion-order rows → (N, K) per-gaussian sums via prefix
    sums + boundary differences at the statically known expansion spans
    (g_start from binning). No scatter, no searchsorted.

    Two-level f32 accumulation: a within-block cumsum (local magnitudes)
    plus a cumsum over per-block sums, DIFFERENCED PER LEVEL: the two prefix
    components ride one (N+1)-row gather as side-by-side lane groups (row
    gathers are row-count-bound, ~9 ns/row — docs/BENCHMARKS.md r2 — so the
    extra lanes are free) and each level is differenced separately before
    adding. A span contained in one block then subtracts identical
    block-level values — exact cancellation — leaving only local error;
    block-crossing spans accumulate over I/block steps instead of I
    (r2 advisor finding)."""
    I, K = rows_exp.shape
    nb = -(-I // block)
    r = jnp.pad(rows_exp, ((0, nb * block - I), (0, 0)))
    within = jnp.cumsum(r.reshape(nb, block, K), axis=1)  # inclusive
    blockpref = jnp.concatenate(
        [jnp.zeros((1, K), r.dtype), jnp.cumsum(within[:, -1], axis=0)]
    )  # (nb+1, K) exclusive block-level prefix
    within_excl = jnp.concatenate(
        [jnp.zeros((nb, 1, K), r.dtype), within[:, :-1]], axis=1
    )
    within_excl = jnp.concatenate(
        [within_excl, jnp.zeros((1, block, K), r.dtype)]
    )  # (nb+1, block, K) so g_start == I resolves in-range
    G = jnp.concatenate(
        [jnp.broadcast_to(blockpref[:, None, :], within_excl.shape), within_excl],
        axis=-1,
    ).reshape(-1, 2 * K)
    bounds = G[g_start]  # flat row index of slot j is exactly j — one gather
    bp, wi = bounds[:, :K], bounds[:, K:]
    return (bp[1:] - bp[:-1]) + (wi[1:] - wi[:-1])


def _blend_packed_fwd(
    packed, gid, tile_start, tile_count, slot_s, owner, g_start,
    tiles_y, tiles_x, tile, max_blocks=0, mm=False, grad_reduce="scatter",
    bf16=False,
):
    if bf16:
        # the gaussian-id channel does not survive bf16 (ids ≥ 256 round);
        # the prefix fold routes gradients positionally without ids
        assert grad_reduce == "prefix", "bf16 stream requires grad_reduce='prefix'"
    N, num_blocks, tables, attrs = _tables_and_attrs(
        packed, gid, tile_start, tile_count, tiles_y, tiles_x, max_blocks,
        tile=tile, bf16=bf16,
    )
    # mm only affects the backward kernel's reduction strategy; the forward is
    # identical either way.
    tile_out, obs = blend_tiles_pallas_fwd(
        attrs, tables, tiles_y, tiles_x, tile, num_blocks, sentinel=N
    )
    # a tile is visited iff its first aligned block fits the budget
    padded = ((tile_count + CHUNK - 1) // CHUNK) * CHUNK
    astart = jnp.cumsum(padded) - padded
    visited = (astart // CHUNK) < num_blocks
    tile_out = finalize_tile_planes(tile_out, tile_count, visited)
    if grad_reduce == "prefix":
        row_of_slot = _expansion_row_index(tables, slot_s, num_blocks)
        obs_ext = jnp.concatenate([obs[0], jnp.zeros((1,), jnp.float32)])
        observe = _prefix_fold(obs_ext[row_of_slot][:, None], g_start)[:, 0]
    else:
        row_of_slot = None
        # num_segments=N drops the sentinel-id padding lanes (id N) instead
        # of serializing a duplicate-heavy scatter (see _blend_packed_bwd)
        observe = jax.ops.segment_sum(
            obs[0], obs[1].astype(jnp.int32), num_segments=N
        )
    observe = jnp.pad(observe, (0, 1))
    # residual keeps the rendered planes (the backward's per-tile totals
    # derive from them directly, see module docstring) and — on the prefix
    # path — the block-stream routing table, so the backward reuses the
    # forward's sort+cummax instead of re-deriving it.
    return (tile_out, observe), (
        attrs, tables, row_of_slot, g_start, tile_out, N, num_blocks
    )


def _blend_packed_bwd(
    tiles_y, tiles_x, tile, max_blocks, mm, grad_reduce, bf16, res, cts
):
    g_tiles, _g_observe = cts  # observe counts carry no gradient
    attrs, tables, row_of_slot, g_start, fwd_out, N, num_blocks = res
    col = jnp.arange(OUT_CH)
    g_ch = jnp.where(col[None, None, :] == 9, 0.0, g_tiles)
    # per-tile totals ride the unused cotangent channels: ch10 = G_total
    # (Σ_ch out·g — the forward output IS the per-channel total), ch11 =
    # T_final·g_T. One (T,P,16) stream into the kernel instead of two.
    G_total = jnp.sum(fwd_out * g_ch, axis=-1, keepdims=True)  # (T, P, 1)
    S_base = fwd_out[..., 9:10] * g_tiles[..., 9:10]
    g_aug = jnp.concatenate(
        [g_tiles[..., :10], G_total, S_base, g_tiles[..., 12:]], axis=-1
    )
    d_inst = blend_tiles_pallas_bwd(
        attrs, tables, g_aug, tiles_y, tiles_x, tile, num_blocks, sentinel=N, mm=mm
    )  # (ATTR, B*CHUNK); padding lanes: zero grads + sentinel ids
    d_rows = d_inst[:GID_CH].T  # (B*CHUNK, GID_CH)
    if grad_reduce == "prefix":
        d_ext = jnp.concatenate(
            [d_rows, jnp.zeros((1, GID_CH), jnp.float32)]
        )
        d_packed = _prefix_fold(d_ext[row_of_slot], g_start)
    else:
        seg = d_inst[GID_CH].astype(jnp.int32)
        # num_segments=N (not N+1): every padding lane carries the sentinel
        # id N, and a scatter-add with ~10^5 rows colliding on ONE index
        # serializes on TPU; out-of-range indices are dropped instead. Row N
        # is the zero-sentinel row whose cotangent is discarded anyway.
        d_packed = jax.ops.segment_sum(d_rows, seg, num_segments=N)
    d_packed = jnp.pad(d_packed, ((0, 1), (0, ATTR - GID_CH)))
    return d_packed, None, None, None, None, None, None


def needed_blocks(tile_count: jnp.ndarray) -> jnp.ndarray:
    """Blocks the current binning actually needs (for block_overflow / re-budget)."""
    return jnp.sum((tile_count + CHUNK - 1) // CHUNK).astype(jnp.int32)


blend_packed.defvjp(_blend_packed_fwd, _blend_packed_bwd)
