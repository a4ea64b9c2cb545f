"""Benchmark harness — prints ONE JSON line for the driver.

Two configs, both full forward+backward (photometric loss) through the
differentiable rasterizer, steady-state on the available device:

  * config-1 (BASELINE): 10k gaussians, one 800x800 view — the metric of
    record since round 1 (`value`, `vs_baseline`).
  * large-scale: 1M gaussians, 1920x1088 (2.09 Mpix) — the reference's
    operating shape (arguments/__init__.py:121 caps training at 6M; WHU
    frames are multi-Mpix). Reported in the same JSON line
    (`large_scale_mpix_s`), VERDICT r2 weak #8.

Anchors: the reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` divides by NOMINAL_BASELINE_MPIX_S — fixed at the round-1
result so rounds are comparable. `sol_frac` anchors the large-scale figure
to a DERIVED speed-of-light model (VERDICT r2 weak #3): the pipeline is
VPU-bound (docs/BENCHMARKS.md r3 — per-(pixel,instance) elementwise work
dominates; MXU util ~3%, HBM ~0.2%), so
    SoL Mpix/s = VPU_FLOPS / (pairs_per_pixel * ops_per_pair)
with pairs_per_pixel = post-cull instances x tile pixels / frame pixels
(measured per run) and ops_per_pair ~= 75 VPU-op-equivalents fwd+bwd
(counted from the kernel bodies, transcendentals weighted 4x).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NOMINAL_BASELINE_MPIX_S = 20.0  # round-1 reference point; see module docstring
VPU_FLOPS = 8.0e12  # v5e VPU f32 throughput estimate (8x128 lanes, FMA)
OPS_PER_PAIR = 75.0  # fwd+bwd VPU ops per (pixel, instance) pair

WARMUP = 2
ITERS = 10


def measure(n_gaussians, h, w, scene_fn, iters=ITERS, probe=1 << 20):
    from hidegs_tpu.raster.api import RasterConfig, render, round_budget
    from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
    from hidegs_tpu.raster.pallas_vjp import needed_blocks
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    scene, cam = scene_fn()
    tile = 32
    ty, tx = tile_grid(h, w, tile)
    pre0 = preprocess_gaussians(
        *scene, cam, screen_bounds=(tx * tile, ty * tile)
    )
    tb0 = bin_gaussians(pre0, ty, tx, probe, tile)
    assert int(tb0.overflow) == 0
    max_inst = round_budget(int(int(tb0.num_instances) * 1.12))
    blocks = int(needed_blocks(tb0.tile_count))
    max_blocks = -(-int(blocks * 1.12) // 256) * 256
    post_cull = int(jnp.sum(tb0.tile_count))
    # visible-row compaction budget, same demand-fit policy and ≥2M-row
    # crossover gate as the trainer (trainer._fit_visible_budget): the
    # construction costs ~5 N-row passes, measured to pay only at ≥2M rows
    n_vis = int(jnp.sum((pre0.visible & (pre0.radius > 0)).astype(jnp.int32)))
    max_visible = round_budget(int(n_vis * 1.25))
    if max_visible >= 0.7 * n_gaussians or n_gaussians < 2_000_000:
        max_visible = 0
    cfg = RasterConfig(
        backend="pallas", tile=tile, max_instances=max_inst,
        max_blocks=max_blocks, depth_sort_bits=-1, max_visible=max_visible,
    )
    target = jnp.zeros((3, h, w))

    def loss_fn(means3d, scales, quats, opacities, shs):
        out = render(means3d, scales, quats, opacities, shs, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    means3d, rest = scene[0], tuple(scene)[1:]
    # Timing must CHAIN each iteration's input on the previous loss and end
    # with ONE value fetch: on the tunneled backend block_until_ready can
    # return without waiting for device completion (observed 0.05 ms
    # "steps"), and per-dispatch RTT is ~20 ms — the chain forces serial
    # device execution and the final float() forces completion.
    s = jnp.float32(0.0)
    for _ in range(WARMUP):
        s, grads = grad_fn(means3d * (1.0 + 1e-12 * s), *rest)
    s = jnp.float32(float(s) * 0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, grads = grad_fn(means3d * (1.0 + 1e-12 * s), *rest)
    float(s)
    dt = time.perf_counter() - t0
    mpix_s = (h * w * iters) / dt / 1e6
    pairs_per_pixel = post_cull * (tile * tile) / (h * w)
    sol_mpix_s = VPU_FLOPS / (pairs_per_pixel * OPS_PER_PAIR) / 1e6
    return mpix_s, sol_mpix_s


def main():
    from hidegs_tpu.data.synthetic import (
        make_toy_gaussians,
        make_uav_gaussians,
        nadir_grid_camera,
        ring_camera,
    )

    cfg1 = measure(
        10_000, 800, 800,
        lambda: (make_toy_gaussians(10_000, seed=0), ring_camera(0, height=800, width=800)),
    )
    cfg5 = measure(
        1_000_000, 1088, 1920,
        lambda: (
            make_uav_gaussians(n_ground=1_000_000, n_structs=64, seed=0),
            nadir_grid_camera(0, 0, 1, 1, altitude=14.0, height=1088, width=1920),
        ),
        probe=1 << 21,  # 1M-gaussian config wants ~533k pre-cull instances
    )
    print(
        json.dumps(
            {
                "metric": "fwd_bwd_throughput",
                "value": round(cfg1[0], 3),
                "unit": "Mpix/s",
                "vs_baseline": round(cfg1[0] / NOMINAL_BASELINE_MPIX_S, 3),
                "large_scale_mpix_s": round(cfg5[0], 3),
                "large_scale_sol_mpix_s": round(cfg5[1], 1),
                "large_scale_sol_frac": round(cfg5[0] / cfg5[1], 4),
                "large_scale_shape": "1M gaussians / 1920x1088",
            }
        )
    )


if __name__ == "__main__":
    main()
