"""Custom VJP for the Pallas tile blend: analytic backward kernel.

TPU re-design of the reference backward (backward.cu renderCUDA :500-772):
instead of re-walking tiles back-to-front with atomicAdd gradient scatter,
each tile program makes TWO front-to-back passes over its (chunk-aligned)
instance span:

  pass A: recompute transmittance chunks → per-pixel total gradient dot
          G_total(p) = Σ_k w_k·(ch_k·g(p)) and T_final(p)
  pass B: per chunk, the suffix sum S_k = G_total − prefix_incl_k +
          T_final·g_T gives the classic alpha gradient
            dα_k = m_k·T_k·(ch_k·g) − S_k/(1−α_k)
          (backward.cu:694-698's back-to-front accum_rec recurrence in closed
          form); the chain rule to opacity/conic/mean2d runs vectorized, and
          each chunk's (ATTR, CHUNK) gradient block is DMA-stored into its
          disjoint 128-aligned column range of the instance-gradient buffer —
          deterministic, no atomics (SURVEY §7.3 hard-part #2).

All math is pixel-major (P rows, instance lanes) like the forward; prefix
sums within a chunk are (P,C)@(C,C) upper-triangular matmuls on the MXU.
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
    _chunk_channels,
    _chunk_geometry,
    _tile_pixels,
    _triu,
    blend_tiles_pallas_fwd,
)


def _backward_kernel(
    tile_start_ref,
    tile_count_ref,
    attrs_hbm,  # (ATTR, I_pad) ANY
    g_ref,  # (1, P, OUT_CH) VMEM — incoming cotangents for this tile
    dattrs_hbm,  # (ATTR, I_pad) ANY — output instance grads
    attr_buf,  # (2, ATTR, CHUNK) VMEM scratch
    dbuf,  # (ATTR, CHUNK) VMEM scratch for outgoing grads
    dma_sems,  # (3,) DMA semaphores (2 load + 1 store)
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
    triu_incl = _triu(strict=False)

    g = g_ref[0]  # (P, OUT_CH)
    gT = g[:, 9:10]  # (P, 1) T_final cotangent
    # zero the T_final column for channel dots (not an accumulation channel)
    col = jax.lax.broadcasted_iota(jnp.int32, (P, OUT_CH), 1)
    g_ch = jnp.where(col == 9, 0.0, g)  # (P, OUT_CH)

    def get_dma(slot, c):
        off = pl.multiple_of(start + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(off, CHUNK)],
            attr_buf.at[slot],
            dma_sems.at[slot],
        )

    def transmit(q, T_carry):
        alpha, log_t = q["alpha"], q["log_t"]
        cum_excl = jnp.dot(log_t, triu_strict, preferred_element_type=jnp.float32)
        T_excl = T_carry * jnp.exp(cum_excl)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)
        return T_excl, w

    # ---------------- pass A: G_total and T_final -----------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def passA(state):
        c, T_carry, G = state
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        a = attr_buf[slot]
        q = _chunk_geometry(a, c, count, pix_x, pix_y)
        _, w = transmit(q, T_carry)
        ch = _chunk_channels(a, q["in_range"])  # (OUT_CH, CHUNK)
        chg = jnp.dot(g_ch, ch, preferred_element_type=jnp.float32)  # (P, CHUNK)
        G = G + jnp.sum(w * chg, axis=1, keepdims=True)
        T_carry = T_carry * jnp.exp(jnp.sum(q["log_t"], axis=1, keepdims=True))
        return c + 1, T_carry, G

    T0 = jnp.ones((P, 1), jnp.float32)
    G0 = jnp.zeros((P, 1), jnp.float32)
    _, T_final, G_total = jax.lax.while_loop(
        lambda s: s[0] < num_chunks, passA, (0, T0, G0)
    )

    # ---------------- pass B: gradients ---------------------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    S_base = T_final * gT  # (P, 1)

    def passB(state):
        c, T_carry, R = state
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        a = attr_buf[slot]
        q = _chunk_geometry(a, c, count, pix_x, pix_y)
        alpha = q["alpha"]
        T_excl, w = transmit(q, T_carry)
        ch = _chunk_channels(a, q["in_range"])
        chg = jnp.dot(g_ch, ch, preferred_element_type=jnp.float32)  # (P, CHUNK)

        contrib = w * chg
        prefix_incl = R + jnp.dot(contrib, triu_incl, preferred_element_type=jnp.float32)
        S = (G_total - prefix_incl) + S_base  # (P, CHUNK)

        live = (q["keep"] & (q["alpha_raw"] < ALPHA_MAX)).astype(jnp.float32)
        d_alpha = T_excl * chg - S / (1.0 - alpha)
        d_power = d_alpha * alpha * live  # (P, CHUNK)
        d_op_pix = d_alpha * jnp.exp(jnp.minimum(q["power"], 0.0)) * live

        dx, dy, ca, cb, cc = q["dx"], q["dy"], q["ca"], q["cb"], q["cc"]
        # per-instance sums over pixels → (1, CHUNK) rows
        d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=0, keepdims=True)
        d_cb = jnp.sum(-(dx * dy) * d_power, axis=0, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=0, keepdims=True)
        # ∂power/∂dx = −ca·dx − cb·dy ; d_mx = −Σ_p d_power·∂power/∂dx
        d_mx = jnp.sum(d_power * (ca * dx + cb * dy), axis=0, keepdims=True)
        d_my = jnp.sum(d_power * (cc * dy + cb * dx), axis=0, keepdims=True)
        d_op = jnp.sum(d_op_pix, axis=0, keepdims=True)

        # d(channels) = g_chᵀ·w → (OUT_CH, CHUNK): lhs-transposed MXU dot
        d_ch = jax.lax.dot_general(
            g_ch, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        dbuf[:] = jnp.concatenate(
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
        off = pl.multiple_of(start + c * CHUNK, CHUNK)
        store = pltpu.make_async_copy(
            dbuf, dattrs_hbm.at[:, pl.ds(off, CHUNK)], dma_sems.at[2]
        )
        store.start()
        store.wait()

        R = R + jnp.sum(contrib, axis=1, keepdims=True)
        T_carry = T_carry * jnp.exp(jnp.sum(q["log_t"], axis=1, keepdims=True))
        return c + 1, T_carry, R

    jax.lax.while_loop(lambda s: s[0] < num_chunks, passB, (0, T0, G0))


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile"))
def blend_tiles_pallas_bwd(
    attrs: jnp.ndarray,  # (ATTR, I)
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    g_tiles: jnp.ndarray,  # (T, P, OUT_CH) cotangents
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
) -> jnp.ndarray:
    T = tiles_y * tiles_x
    P = tile * tile
    I = attrs.shape[1]
    attrs_pad = jnp.concatenate([attrs, jnp.zeros((ATTR, CHUNK), attrs.dtype)], axis=1)

    kernel = functools.partial(_backward_kernel, tile=tile, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P, OUT_CH), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR, CHUNK), jnp.float32),
            pltpu.VMEM((ATTR, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    d_attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ATTR, I + CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, attrs_pad, g_tiles)
    return d_attrs[:, :I]


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_core(attrs, tile_start, tile_count, tiles_y, tiles_x, tile):
    """(ATTR, I) instance attrs + tile ranges → (T, P, OUT_CH) tile planes."""
    return blend_tiles_pallas_fwd(
        attrs, tile_start, tile_count, tiles_y, tiles_x, tile
    )


def _blend_core_fwd(attrs, tile_start, tile_count, tiles_y, tiles_x, tile):
    out = blend_tiles_pallas_fwd(attrs, tile_start, tile_count, tiles_y, tiles_x, tile)
    return out, (attrs, tile_start, tile_count)


def _blend_core_bwd(tiles_y, tiles_x, tile, res, g_tiles):
    attrs, tile_start, tile_count = res
    d_attrs = blend_tiles_pallas_bwd(
        attrs, tile_start, tile_count, g_tiles, tiles_y, tiles_x, tile
    )
    # Columns never covered by any tile's span (alignment padding / sentinel
    # tail) were never written by the kernel → contain garbage. Zero them so
    # the gather transpose cannot propagate non-finite junk.
    I = attrs.shape[1]
    slots = jnp.arange(I, dtype=jnp.int32)
    t_of = jnp.searchsorted(tile_start, slots, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, tile_start.shape[0] - 1)
    covered = (slots - tile_start[t_of]) < tile_count[t_of]
    d_attrs = jnp.where(covered[None, :], d_attrs, 0.0)
    return d_attrs, None, None


blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)
