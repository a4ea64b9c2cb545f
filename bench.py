"""Benchmark harness — prints ONE JSON line for the driver.

Metric: rendered Mpix/s through forward+backward of the differentiable
rasterizer (photometric loss) on the BASELINE config-1 workload
(10k gaussians, 800x800 view), steady-state on the available device.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is measured against NOMINAL_BASELINE_MPIX_S — fixed at the round-1 result so
later rounds show relative progress.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NOMINAL_BASELINE_MPIX_S = 20.0  # round-1 reference point; see module docstring

N_GAUSSIANS = 10_000
H = W = 800
WARMUP = 2
ITERS = 10


def main():
    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.raster.api import RasterConfig, render

    scene = make_toy_gaussians(N_GAUSSIANS, seed=0)
    cam = ring_camera(0, height=H, width=W)
    # budget sized to the workload (~221k instances measured); pallas is the
    # production backend (19.0 Mpix/s vs 8.9 for the XLA segmented path on
    # this workload — docs/BENCHMARKS.md)
    cfg = RasterConfig(backend="pallas", max_instances=1 << 18)
    target = jnp.zeros((3, H, W))

    def loss_fn(means3d, scales, quats, opacities, shs):
        out = render(means3d, scales, quats, opacities, shs, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = tuple(scene)

    for _ in range(WARMUP):
        loss, grads = grad_fn(*args)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, grads = grad_fn(*args)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0

    mpix_s = (H * W * ITERS) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd_bwd_throughput",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / NOMINAL_BASELINE_MPIX_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
