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
          (the back-to-front accum_rec recurrence of backward.cu:694-698 in
          closed form); chain rule to opacity/conic/mean2d runs vectorized,
          and the chunk's (CHUNK, ATTR) gradient block is DMA-stored into its
          *disjoint, chunk-aligned* slice of the instance-gradient buffer —
          deterministic, no atomics (SURVEY §7.3 hard-part #2).

The prefix sums inside chunks are triangular matmuls on the MXU, like the
forward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hidegs_tpu.raster.pallas_blend import (
    ALPHA_MAX,
    ALPHA_MIN,
    ATTR,
    CHUNK,
    OUT_CH,
    T_EPS,
    blend_tiles_pallas_fwd,
)


def _backward_kernel(
    tile_start_ref,
    tile_count_ref,
    attrs_hbm,  # (I_pad, ATTR) ANY
    g_ref,  # (1, P, OUT_CH) VMEM — incoming cotangents for this tile
    dattrs_hbm,  # (I_pad, ATTR) ANY — output instance grads
    attr_buf,  # (2, CHUNK, ATTR) VMEM scratch
    dbuf,  # (CHUNK, ATTR) VMEM scratch for the outgoing grads
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

    oy = (t // tiles_x) * tile
    ox = (t % tiles_x) * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pix_x = (lin % tile).astype(jnp.float32) + (jnp.float32(0.5) + ox.astype(jnp.float32))
    pix_y = (lin // tile).astype(jnp.float32) + (jnp.float32(0.5) + oy.astype(jnp.float32))

    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri_strict = (row > col).astype(jnp.float32)
    tri_incl = (row >= col).astype(jnp.float32)

    g = g_ref[0]  # (P, OUT_CH)
    gT = g[:, 9].reshape(1, P)  # T_final cotangent
    # zero the T_final column for channel dots (it is not an acc channel)
    ch_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, OUT_CH), 1) != 9).astype(jnp.float32)
    g_ch = g * ch_mask  # (P, OUT_CH)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            attrs_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :],
            attr_buf.at[slot],
            dma_sems.at[slot],
        )

    def chunk_quants(a, c, T_carry):
        """Shared per-chunk recompute. Returns intermediates."""
        idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        in_range = (idx + c * CHUNK) < count
        mx, my = a[:, 0:1], a[:, 1:2]
        ca, cb, cc = a[:, 2:3], a[:, 3:4], a[:, 4:5]
        op = a[:, 8:9]
        dx = pix_x - mx
        dy = pix_y - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
        alpha = jnp.where(keep, alpha, 0.0)
        log_t = jnp.log1p(-alpha)
        cum_excl = jnp.dot(tri_strict, log_t, preferred_element_type=jnp.float32)
        T_excl = T_carry * jnp.exp(cum_excl)
        T_incl = T_excl * (1.0 - alpha)
        w = T_excl * alpha * (T_incl >= T_EPS)
        ones = jnp.where(in_range, 1.0, 0.0)
        ch = jnp.concatenate(
            [a[:, 5:8], a[:, 9:10], a[:, 10:13], a[:, 13:14], ones,
             jnp.zeros((CHUNK, OUT_CH - 9), jnp.float32)],
            axis=-1,
        )
        live = keep & (alpha_raw < ALPHA_MAX)
        return dict(
            alpha=alpha, w=w, T_excl=T_excl, log_t=log_t, ch=ch, live=live,
            dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, op=op, power=power,
        )

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
        q = chunk_quants(attr_buf[slot], c, T_carry)
        chg = jnp.dot(q["ch"], g_ch.T, preferred_element_type=jnp.float32)  # (CHUNK, P)
        G = G + jnp.sum(q["w"] * chg, axis=0, keepdims=True)
        T_carry = T_carry * jnp.exp(jnp.sum(q["log_t"], axis=0, keepdims=True))
        return c + 1, T_carry, G

    T0 = jnp.ones((1, P), jnp.float32)
    G0 = jnp.zeros((1, P), jnp.float32)
    _, T_final, G_total = jax.lax.while_loop(
        lambda s: s[0] < num_chunks, passA, (0, T0, G0)
    )

    # ---------------- pass B: gradients ---------------------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    S_base = T_final * gT  # (1, P)

    def passB(state):
        c, T_carry, R = state
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        a = attr_buf[slot]
        q = chunk_quants(a, c, T_carry)
        w, alpha, T_excl = q["w"], q["alpha"], q["T_excl"]
        chg = jnp.dot(q["ch"], g_ch.T, preferred_element_type=jnp.float32)  # (CHUNK, P)

        contrib = w * chg
        prefix_incl = R + jnp.dot(tri_incl, contrib, preferred_element_type=jnp.float32)
        S = (G_total - prefix_incl) + S_base  # (CHUNK, P)

        live = q["live"].astype(jnp.float32)
        d_alpha = T_excl * chg - S / (1.0 - alpha)
        # d(channels): w @ g  → (CHUNK, OUT_CH)
        d_ch = jnp.dot(w, g_ch, preferred_element_type=jnp.float32)

        d_power = d_alpha * alpha * live  # (CHUNK, P)
        d_op_pix = d_alpha * jnp.exp(jnp.minimum(q["power"], 0.0)) * live
        dx, dy, ca, cb, cc = q["dx"], q["dy"], q["ca"], q["cb"], q["cc"]
        d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=1, keepdims=True)
        d_cb = jnp.sum(-(dx * dy) * d_power, axis=1, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=1, keepdims=True)
        # ∂power/∂dx = −ca·dx − cb·dy ; d_mx = −Σ d_power·∂power/∂dx
        d_mx = jnp.sum(d_power * (ca * dx + cb * dy), axis=1, keepdims=True)
        d_my = jnp.sum(d_power * (cc * dy + cb * dx), axis=1, keepdims=True)
        d_op = jnp.sum(d_op_pix, axis=1, keepdims=True)

        dbuf[:] = jnp.concatenate(
            [
                d_mx, d_my, d_ca, d_cb, d_cc,
                d_ch[:, 0:3],  # rgb
                d_op,
                d_ch[:, 3:4],  # invdepth
                d_ch[:, 4:7],  # normal
                d_ch[:, 7:8],  # distance
                jnp.zeros((CHUNK, 2), jnp.float32),
            ],
            axis=-1,
        )

        store = pltpu.make_async_copy(
            dbuf, dattrs_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :], dma_sems.at[2]
        )
        store.start()
        store.wait()

        R = R + jnp.sum(contrib, axis=0, keepdims=True)
        T_carry = T_carry * jnp.exp(jnp.sum(q["log_t"], axis=0, keepdims=True))
        return c + 1, T_carry, R

    jax.lax.while_loop(lambda s: s[0] < num_chunks, passB, (0, T0, G0))


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile"))
def blend_tiles_pallas_bwd(
    attrs: jnp.ndarray,  # (I, ATTR)
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    g_tiles: jnp.ndarray,  # (T, P, OUT_CH) cotangents
    tiles_y: int,
    tiles_x: int,
    tile: int = 16,
) -> jnp.ndarray:
    T = tiles_y * tiles_x
    P = tile * tile
    I = attrs.shape[0]
    attrs_pad = jnp.concatenate([attrs, jnp.zeros((CHUNK, ATTR), attrs.dtype)], axis=0)

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
            pltpu.VMEM((2, CHUNK, ATTR), jnp.float32),
            pltpu.VMEM((CHUNK, ATTR), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    d_attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((I + CHUNK, ATTR), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, attrs_pad, g_tiles)
    return d_attrs[:I]


# ------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_core(attrs, tile_start, tile_count, tiles_y, tiles_x, tile):
    """(I, ATTR) instance attrs + tile ranges → (T, P, OUT_CH) tile planes."""
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
    # Slots never covered by any tile's span (alignment padding / sentinel
    # tail) were never written by the kernel → contain garbage. Zero them so
    # the gather transpose cannot propagate non-finite junk.
    I = attrs.shape[0]
    slots = jnp.arange(I, dtype=jnp.int32)
    t_of = jnp.searchsorted(tile_start, slots, side="right").astype(jnp.int32) - 1
    t_of = jnp.clip(t_of, 0, tile_start.shape[0] - 1)
    covered = (slots - tile_start[t_of]) < tile_count[t_of]
    d_attrs = jnp.where(covered[:, None], d_attrs, 0.0)
    return d_attrs, None, None


blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)
