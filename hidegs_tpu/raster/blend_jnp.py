"""Segmented instance-parallel tile blend (pure JAX, autodiff path).

Replaces the reference's per-tile sequential front-to-back loop
(forward.cu:440-610) and its hand-written backward (backward.cu:500-772) with
an *exact closed form* over the (tile,depth)-sorted instance list:

    T_excl_i = exp( Σ_{j<i, same tile} log(1-α_j) )          (segmented cumsum)
    w_i      = T_excl_i · α_i · [T_incl_i ≥ 1e-4]
    out[tile] = Σ_{i in tile} w_i · channels_i               (segment_sum)

Everything is cumsum + gather + segment_sum: natively differentiable, and the
gradient scatter the CUDA kernel does with atomicAdd becomes XLA's
deterministic segment reductions (SURVEY §5.2 determinism win). This is the
correctness / CPU / small-scene path; the Pallas kernel is the production
path and must agree with this to tolerance.

Memory scales as O(max_instances · tile_pixels) so use it with modest budgets.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from hidegs_tpu.raster.binning import TILE, TileBinning
from hidegs_tpu.raster.preprocess import PreprocessedGaussians

T_EPS = 1e-4


@partial(jax.jit, static_argnames=("tiles_y", "tiles_x", "tile"))
def blend_tiles(
    pre: PreprocessedGaussians,
    binning: TileBinning,
    tiles_y: int,
    tiles_x: int,
    tile: int = TILE,
) -> Dict[str, jnp.ndarray]:
    """Blend all channels. Returns per-pixel planes on the PADDED canvas
    (tiles_y*tile, tiles_x*tile); callers crop to (H, W).

    Channels: rgb(3), invdepth(1), normal(3), acc_alpha(1), distance(1)
    + T_final and per-gaussian out_observe.
    """
    N = pre.mean2d.shape[0]
    num_tiles = tiles_y * tiles_x
    P = tile * tile
    I = binning.gauss_id.shape[0]

    gid = jnp.minimum(binning.gauss_id, N - 1)
    valid = binning.tile_id < num_tiles  # (I,)
    tid = jnp.minimum(binning.tile_id, num_tiles - 1)

    # Instance attribute gather (differentiable; transpose = segment-sum).
    mean2d = pre.mean2d[gid]
    conic = pre.conic[gid]
    opacity = jnp.where(valid, pre.opacity[gid], 0.0)

    # Pixel centers of each instance's tile: (I, P, 2)
    oy = (tid // tiles_x) * tile
    ox = (tid % tiles_x) * tile
    dy, dx = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (P, 2)
    pix = pix[None, :, :] + jnp.stack([ox, oy], axis=-1).astype(jnp.float32)[:, None, :]

    # α (I, P) — same per-pixel rule as the CUDA kernel.
    d = pix - mean2d[:, None, :]
    dxp, dyp = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conic[:, None, 0] * dxp * dxp + conic[:, None, 2] * dyp * dyp)
        - conic[:, None, 1] * dxp * dyp
    )
    alpha = jnp.minimum(0.99, opacity[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
    keep = (power <= 0.0) & (alpha >= (1.0 / 255.0))
    alpha = jnp.where(keep, alpha, 0.0)

    # Segmented exclusive/inclusive transmittance along the instance axis.
    log_t = jnp.log1p(-alpha)  # (I, P)
    cs = jnp.cumsum(log_t, axis=0)
    cs_excl = cs - log_t
    seg_first = binning.tile_start[tid]  # (I,) index of segment head
    base = cs_excl[seg_first]  # cumsum just before the segment head
    T_excl = jnp.exp(cs_excl - base)
    T_incl = jnp.exp(cs - base)
    w = T_excl * alpha * (T_incl >= T_EPS)  # (I, P)

    # Per-channel segment reductions → (num_tiles, P)
    def seg(ch):  # ch: (I,) per-instance scalar channel
        return jax.ops.segment_sum(w * ch[:, None], tid, num_segments=num_tiles)

    rgb = pre.rgb[gid]
    invd = pre.inv_depth[gid]
    nrm = pre.normal[gid]
    dist = pre.distance[gid]

    out_r = seg(rgb[:, 0])
    out_g = seg(rgb[:, 1])
    out_b = seg(rgb[:, 2])
    out_invd = seg(invd)
    out_nx = seg(nrm[:, 0])
    out_ny = seg(nrm[:, 1])
    out_nz = seg(nrm[:, 2])
    out_dist = seg(dist)
    out_acc = jax.ops.segment_sum(w, tid, num_segments=num_tiles)

    total_log = jax.ops.segment_sum(log_t, tid, num_segments=num_tiles)
    T_final = jnp.exp(total_log)  # (num_tiles, P)

    # Observability counter (forward.cu:579-582): pixels contributed while T>0.5.
    observe_i = jnp.sum((w > 0) & (T_excl > 0.5), axis=1).astype(jnp.int32)
    out_observe = jax.ops.segment_sum(
        jnp.where(valid, observe_i, 0), jnp.where(valid, gid, N), num_segments=N + 1
    )[:N]

    def to_image(t):  # (num_tiles, P) → (tiles_y*tile, tiles_x*tile)
        return (
            t.reshape(tiles_y, tiles_x, tile, tile)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tile, tiles_x * tile)
        )

    return {
        "render": jnp.stack([to_image(out_r), to_image(out_g), to_image(out_b)]),
        "invdepth": to_image(out_invd),
        "normal": jnp.stack([to_image(out_nx), to_image(out_ny), to_image(out_nz)]),
        "distance": to_image(out_dist),
        "alpha": to_image(out_acc),
        "T_final": to_image(T_final),
        "out_observe": out_observe,
    }
