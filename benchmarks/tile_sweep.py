"""Sweep the rasterizer tile size on the BASELINE config-1 workload.

The Pallas grid is sequential on the TensorCore, so per-grid-step overhead
multiplies with the number of instance blocks (~2500 at tile=16). Bigger
tiles cut both the block count (fewer, fuller tiles) and the instance
duplication factor (a gaussian spans fewer tile boundaries) at the price of
more per-block VPU work (P = tile^2 pixel rows). This sweep measures the
end-to-end fwd+bwd tradeoff; results in docs/BENCHMARKS.md.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
from hidegs_tpu.raster.pallas_vjp import needed_blocks
from hidegs_tpu.raster.preprocess import preprocess_gaussians

N_GAUSSIANS = 10_000
H = W = 800
WARMUP = 2
ITERS = 10


def bench_tile(scene, cam, tile: int, max_inst: int) -> dict:
    ty, tx = tile_grid(H, W, tile)
    tb0 = bin_gaussians(
        preprocess_gaussians(*scene, cam), ty, tx, max_inst, tile
    )
    inst = int(jnp.sum(tb0.tile_count))
    blocks = int(needed_blocks(tb0.tile_count))
    max_blocks = -(-int(blocks * 1.12) // 256) * 256
    cfg = RasterConfig(
        backend="pallas", tile=tile, max_instances=max_inst,
        max_blocks=max_blocks, depth_sort_bits=-1,
    )
    target = jnp.zeros((3, H, W))

    def loss_fn(means3d, scales, quats, opacities, shs):
        out = render(means3d, scales, quats, opacities, shs, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    for _ in range(WARMUP):
        loss, grads = grad_fn(*scene)
    jax.block_until_ready(grads)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, grads = grad_fn(*scene)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    fwd_fn = jax.jit(
        lambda m, s, q, o, c: render(m, s, q, o, c, cam, config=cfg)["render"]
    )
    img = fwd_fn(*scene)
    jax.block_until_ready(img)
    t1 = time.perf_counter()
    for _ in range(ITERS):
        img = fwd_fn(*scene)
    jax.block_until_ready(img)
    dtf = time.perf_counter() - t1
    return dict(
        tile=tile, instances=inst, blocks=blocks, max_blocks=max_blocks,
        loss=float(loss),
        fwd_bwd_mpix_s=H * W * ITERS / dt / 1e6,
        fwd_mpix_s=H * W * ITERS / dtf / 1e6,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--max-inst", type=int, default=1 << 18)
    args = ap.parse_args()
    scene = make_toy_gaussians(N_GAUSSIANS, seed=0)
    cam = ring_camera(0, height=H, width=W)
    for tile in args.tiles:
        r = bench_tile(scene, cam, tile, args.max_inst)
        print(
            f"tile={r['tile']:3d} inst={r['instances']:7d} blocks={r['blocks']:5d}"
            f" fwd+bwd={r['fwd_bwd_mpix_s']:7.2f} Mpix/s"
            f" fwd={r['fwd_mpix_s']:7.2f} Mpix/s loss={r['loss']:.6f}"
        )


if __name__ == "__main__":
    main()
