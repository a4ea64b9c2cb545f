"""Custom VJP for the Pallas tile blend: analytic backward kernels.

TPU re-design of the reference backward (backward.cu renderCUDA :500-772):
instead of re-walking tiles back-to-front with atomicAdd gradient scatter,
one block-pipelined grid pass runs front-to-back over the chunk-aligned
instance stream (same sequential-grid structure as the forward, see
pallas_blend.py):

  The per-tile totals need no kernel at all: the forward's saved output IS
  Σ_k w_k·ch_k per channel, so G_total(p) = Σ_ch out(p,ch)·g(p,ch) and
  T_final(p) = out(p, 9) — two elementwise XLA ops on the residual.
  Then per block, the suffix sum S_k = G_total − prefix_incl_k +
          T_final·g_T gives the classic alpha gradient
            dα_k = m_k·T_k·(ch_k·g) − S_k/(1−α_k)
          (backward.cu:694-698's accum_rec recurrence in closed form); the
          chain rule to opacity/conic/mean2d runs vectorized and each block's
          (ATTR, CHUNK) gradient tile is written through the output pipeline
          to its own disjoint slot — deterministic, no atomics
          (SURVEY §7.3 hard-part #2).

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
    CHUNK,
    OUT_CH,
    T_EPS,
    _block_channels,
    _block_geometry,
    _tile_pixels,
    _triu,
    block_tables,
    blend_tiles_pallas_fwd,
)


def _passB_kernel(
    tile_of_ref, first_ref, nvalid_ref,
    attr_ref,  # (ATTR, CHUNK)
    g_ref,  # (1, P, OUT_CH) cotangents of this block's tile
    gt_ref,  # (1, P, OUT_CH) pass-A totals of this block's tile
    d_ref,  # (ATTR, CHUNK) out — gradient block (unique per b)
    T_carry,  # (P, 1) scratch
    R_carry,  # (P, 1) scratch: running prefix of w·chg
    *,
    tile: int,
    tiles_x: int,
):
    b = pl.program_id(0)
    P = tile * tile
    t = tile_of_ref[b]
    nvalid = nvalid_ref[b]

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
        d_ref[:] = jnp.zeros((ATTR, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        pix_x, pix_y = _tile_pixels(t, tiles_x, tile)
        a = attr_ref[:]
        q = _block_geometry(a, nvalid, pix_x, pix_y)
        alpha, log_t = q["alpha"], q["log_t"]
        cum_excl = jnp.dot(log_t, _triu(True), preferred_element_type=jnp.float32)
        T_excl = T_carry[:] * jnp.exp(cum_excl)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)

        g = g_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_CH), 1)
        g_ch = jnp.where(col == 9, 0.0, g)
        ch = _block_channels(a, q["in_range"])
        chg = jnp.dot(g_ch, ch, preferred_element_type=jnp.float32)  # (P, CHUNK)

        gt = gt_ref[0]
        G_total = gt[:, 0:1]
        T_final = gt[:, 1:2]
        S_base = T_final * g[:, 9:10]

        contrib = w * chg
        prefix_incl = R_carry[:] + jnp.dot(
            contrib, _triu(False), preferred_element_type=jnp.float32
        )
        S = (G_total - prefix_incl) + S_base  # (P, CHUNK)

        live = (q["keep"] & (q["alpha_raw"] < ALPHA_MAX)).astype(jnp.float32)
        d_alpha = T_excl * chg - S / (1.0 - alpha)
        d_power = d_alpha * alpha * live
        d_op_pix = d_alpha * jnp.exp(jnp.minimum(q["power"], 0.0)) * live

        dx, dy, ca, cb, cc = q["dx"], q["dy"], q["ca"], q["cb"], q["cc"]
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

        d_ref[:] = jnp.concatenate(
            [
                d_mx, d_my, d_ca, d_cb, d_cc,
                d_ch[0:3, :],  # rgb
                d_op,
                d_ch[3:4, :],  # invdepth
                d_ch[4:7, :],  # normal
                d_ch[7:8, :],  # distance
                jnp.zeros((ATTR - 14, CHUNK), jnp.float32),
            ],
            axis=0,
        )

        R_carry[:] = R_carry[:] + jnp.sum(contrib, axis=1, keepdims=True)
        T_carry[:] = T_carry[:] * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "tile", "num_blocks")
)
def blend_tiles_pallas_bwd(
    attrs: jnp.ndarray,  # (ATTR, I_aligned)
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    g_tiles: jnp.ndarray,  # (T, P, OUT_CH) cotangents
    gt: jnp.ndarray,  # (T, P, OUT_CH): ch0 = G_total, ch1 = T_final
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
    num_blocks: int = 0,
) -> jnp.ndarray:
    T = tiles_y * tiles_x
    P = tile * tile
    I = attrs.shape[1]
    num_blocks = num_blocks or I // CHUNK
    tile_of, first, nvalid = block_tables(tile_start, tile_count, num_blocks)

    kernelB = functools.partial(_passB_kernel, tile=tile, tiles_x=tiles_x)
    gridB = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((ATTR, CHUNK), lambda b, tof, f, nv: (0, b)),
            pl.BlockSpec((1, P, OUT_CH), lambda b, tof, f, nv: (tof[b], 0, 0)),
            pl.BlockSpec((1, P, OUT_CH), lambda b, tof, f, nv: (tof[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((ATTR, CHUNK), lambda b, tof, f, nv: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    d_attrs = pl.pallas_call(
        kernelB,
        grid_spec=gridB,
        out_shape=jax.ShapeDtypeStruct((ATTR, num_blocks * CHUNK), jnp.float32),
    )(tile_of, first, nvalid, attrs, g_tiles, gt)

    if num_blocks * CHUNK < I:
        d_attrs = jnp.pad(d_attrs, ((0, 0), (0, I - num_blocks * CHUNK)))
    return d_attrs[:, :I]


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_core(attrs, tile_start, tile_count, tiles_y, tiles_x, tile):
    """(ATTR, I) instance attrs + tile ranges →
    ((T, P, OUT_CH) tile planes, (B*CHUNK,) per-instance observe counts)."""
    return blend_tiles_pallas_fwd(
        attrs, tile_start, tile_count, tiles_y, tiles_x, tile
    )


def _blend_core_fwd(attrs, tile_start, tile_count, tiles_y, tiles_x, tile):
    out = blend_tiles_pallas_fwd(attrs, tile_start, tile_count, tiles_y, tiles_x, tile)
    # residual includes the rendered tile planes: the backward's per-tile
    # totals derive from them directly (see module docstring)
    return out, (attrs, tile_start, tile_count, out[0])


def _blend_core_bwd(tiles_y, tiles_x, tile, res, cts):
    g_tiles, _g_observe = cts  # observe counts carry no gradient
    attrs, tile_start, tile_count, fwd_out = res
    col = jnp.arange(OUT_CH)
    g_ch = jnp.where(col[None, None, :] == 9, 0.0, g_tiles)
    G_total = jnp.sum(fwd_out * g_ch, axis=-1, keepdims=True)  # (T, P, 1)
    T_final = fwd_out[..., 9:10]
    gt = jnp.concatenate(
        [G_total, T_final, jnp.zeros_like(fwd_out[..., :OUT_CH - 2])], axis=-1
    )
    d_attrs = blend_tiles_pallas_bwd(
        attrs, tile_start, tile_count, g_tiles, gt, tiles_y, tiles_x, tile
    )
    # pass B writes every block deterministically (invalid lanes produce
    # exact zeros through the masks), but zero the never-covered columns
    # anyway for belt-and-braces against non-finite junk. Block-level tables
    # + a broadcast — NOT a per-slot searchsorted, which costs ~50ms at
    # millions of slots on TPU.
    I = attrs.shape[1]
    nb = I // CHUNK
    _, _, nvalid_b = block_tables(tile_start, tile_count, nb)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    covered = (lane < nvalid_b[:, None]).reshape(-1)
    if covered.shape[0] < I:
        covered = jnp.pad(covered, (0, I - covered.shape[0]))
    d_attrs = jnp.where(covered[None, :], d_attrs, 0.0)
    return d_attrs, None, None


blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)
