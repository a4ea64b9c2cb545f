"""Workload-matrix benchmark: fwd and fwd+bwd throughput across scene sizes.

Extends bench.py's single BASELINE config-1 point to a grid over gaussian
count and resolution, so kernel-density scaling is visible (the Pallas
advantage grows with instance density; docs/BENCHMARKS.md). Budgets are
fitted per workload with the same eager-binning policy as bench.py.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
from hidegs_tpu.raster.pallas_vjp import needed_blocks
from hidegs_tpu.raster.preprocess import preprocess_gaussians

WORKLOADS = [  # (n_gaussians, H, W)
    (10_000, 800, 800),
    (100_000, 1024, 1024),
    (400_000, 1024, 1024),
    (1_000_000, 1600, 1600),
]
WARMUP = 2
ITERS = 5


def fitted_config(scene, cam, tile: int, backend: str = "pallas") -> RasterConfig:
    """Instance/block budgets fitted to the workload (+12%, pow2 / 256-align),
    the same policy the trainer applies through its overflow re-budget loop."""
    ty, tx = tile_grid(cam.height, cam.width, tile)
    # probe with a generous budget to measure the true load
    probe = 1 << 22
    tb = bin_gaussians(preprocess_gaussians(*scene, cam), ty, tx, probe, tile)
    inst = int(tb.num_instances)
    assert inst <= probe, "probe budget overflow"
    max_inst = max(1 << 14, 1 << (int(inst * 1.12) - 1).bit_length())
    blocks = int(needed_blocks(tb.tile_count))
    max_blocks = -(-int(blocks * 1.12) // 256) * 256
    return RasterConfig(
        backend=backend, tile=tile, max_instances=max_inst,
        max_blocks=max_blocks, depth_sort_bits=-1,
    )


def bench_workload(n, H, W, tile, backend="pallas"):
    scene = make_toy_gaussians(n, seed=0)
    cam = ring_camera(0, height=H, width=W)
    cfg = fitted_config(scene, cam, tile, backend)
    target = jnp.zeros((3, H, W))

    def loss_fn(*params):
        out = render(*params, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    fwd_fn = jax.jit(lambda *p: render(*p, cam, config=cfg)["render"])

    for fn, label in ((fwd_fn, "fwd"), (grad_fn, "fwd_bwd")):
        for _ in range(WARMUP):
            out = fn(*scene)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*scene)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        yield {
            "n": n, "H": H, "W": W, "tile": tile, "backend": backend,
            "pass": label,
            "mpix_s": round(H * W * ITERS / dt / 1e6, 2),
            "ms": round(dt / ITERS * 1e3, 2),
            "max_instances": cfg.max_instances, "max_blocks": cfg.max_blocks,
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--workloads", type=int, nargs="*", default=None,
                    help="indices into the WORKLOAD list")
    args = ap.parse_args()
    idx = args.workloads if args.workloads is not None else range(len(WORKLOADS))
    for i in idx:
        n, H, W = WORKLOADS[i]
        for row in bench_workload(n, H, W, args.tile, args.backend):
            print(json.dumps(row))


if __name__ == "__main__":
    main()
