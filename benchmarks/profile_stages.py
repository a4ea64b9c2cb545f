"""Per-stage timing of the fwd+bwd rasterization pipeline on the live device.

Times each pipeline stage as its own jitted function (steady-state, compile
excluded) to locate the glue costs around the Pallas kernels. Drove the
kernel-side-windowing redesign (docs/BENCHMARKS.md).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster import binning as B
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.raster.pallas_blend import (
    CHUNK,
    blend_tiles_pallas_fwd,
    expand_to_instances,
    pack_gaussian_matrix,
    window_tables,
)
from hidegs_tpu.raster.pallas_vjp import blend_packed, blend_tiles_pallas_bwd
from hidegs_tpu.raster.preprocess import preprocess_gaussians

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--tile", type=int, default=32)
_ap.add_argument("--maxi", type=int, default=1 << 17)
_ARGS = _ap.parse_args()

N = 10_000
H = W = 800
TILE = _ARGS.tile
MAXI = _ARGS.maxi
ITERS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return out


def main():
    scene = make_toy_gaussians(N, seed=0)
    cam = ring_camera(0, height=H, width=W)
    cfg = RasterConfig(backend="pallas", max_instances=MAXI)
    target = jnp.zeros((3, H, W))
    means3d, scales, quats, opacities, shs = scene

    tiles_y, tiles_x = B.tile_grid(H, W, TILE)
    num_tiles = tiles_y * tiles_x
    # fitted block budget (same policy as bench.py); worst case would be
    # (MAXI + num_tiles * CHUNK) // CHUNK
    from hidegs_tpu.raster.pallas_vjp import needed_blocks

    pre0 = preprocess_gaussians(*scene, cam)
    tb0 = B.bin_gaussians(pre0, tiles_y, tiles_x, MAXI, TILE)
    num_blocks = -(-int(needed_blocks(tb0.tile_count)) * 112 // 100 // 256) * 256
    print(f"block budget {num_blocks} (worst {(MAXI + num_tiles * CHUNK) // CHUNK})")
    cfg = RasterConfig(backend="pallas", tile=TILE, max_instances=MAXI, max_blocks=num_blocks, depth_sort_bits=-1)

    pre_fn = jax.jit(
        lambda m, s, q, o, c: preprocess_gaussians(m, s, q, o, c, cam)
    )
    bin_fn = jax.jit(lambda pre: B.bin_gaussians(pre, tiles_y, tiles_x, MAXI, TILE, depth_bits=-1))
    tables_fn = jax.jit(
        lambda tb: window_tables(tb.tile_start, tb.tile_count, num_blocks, MAXI)
    )
    pack_fn = jax.jit(pack_gaussian_matrix)
    expand_fn = jax.jit(expand_to_instances)
    fwd_fn = jax.jit(
        lambda attrs, tables: blend_tiles_pallas_fwd(
            attrs, tables, tiles_y, tiles_x, TILE, num_blocks, N
        )
    )

    pre = timeit("preprocess fwd", pre_fn, means3d, scales, quats, opacities, shs)
    tb = timeit("binning (expand+sort+ranges)", bin_fn, pre)
    tables = timeit("window tables", tables_fn, tb)
    packed = timeit("pack gaussian matrix (N rows)", pack_fn, pre)
    attrs = timeit("expand to instances (row gather)", expand_fn, packed, tb.gauss_id)
    tile_out = timeit("blend fwd kernel (windowed DMA)", fwd_fn, attrs, tables)

    g_tiles = jnp.ones_like(tile_out[0])
    bwd_fn = jax.jit(
        lambda attrs, tables, g: blend_tiles_pallas_bwd(
            attrs, tables, g, tiles_y, tiles_x, TILE, num_blocks, N
        )
    )
    d_inst = timeit("blend bwd kernel (windowed DMA)", bwd_fn, attrs, tables, g_tiles)

    seg_fn = jax.jit(
        lambda d: jax.ops.segment_sum(
            d[:14].T, d[14].astype(jnp.int32), num_segments=N + 1
        )
    )
    timeit("instance->gaussian segment sum", seg_fn, d_inst)

    def pre_loss(m, s, q, o, c):
        p = preprocess_gaussians(m, s, q, o, c, cam)
        return (
            jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.rgb)
            + jnp.sum(p.opacity) + jnp.sum(p.inv_depth) + jnp.sum(p.normal)
            + jnp.sum(p.distance)
        )

    pre_vjp = jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3, 4)))
    timeit("preprocess VJP", pre_vjp, means3d, scales, quats, opacities, shs)

    def core_loss(packed, tb):
        out, _ = blend_packed(
            packed, tb.gauss_id, tb.tile_start, tb.tile_count, tb.slot_s, tb.owner,
            tb.g_start, tiles_y, tiles_x, TILE, num_blocks,
        )
        return jnp.sum(out)

    core_vjp = jax.jit(jax.grad(core_loss))
    timeit("blend_packed fwd+bwd (custom vjp)", core_vjp, packed, tb)

    rend_fn = jax.jit(
        lambda m, s, q, o, c: render(m, s, q, o, c, cam, config=cfg)["render"]
    )
    timeit("full render fwd", rend_fn, means3d, scales, quats, opacities, shs)

    def loss_fn(m, s, q, o, c):
        out = render(m, s, q, o, c, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    full = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    timeit("FULL fwd+bwd", full, means3d, scales, quats, opacities, shs)


if __name__ == "__main__":
    main()
