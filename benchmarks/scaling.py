"""Scaling benchmark: view-parallel step throughput vs device count.

Measures the BASELINE scaling target (pixels/s at 1..N devices; ≥0.8
efficiency to 2x). On CPU it uses virtual devices (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) purely
to validate the harness; real numbers come from TPU slices.

    python benchmarks/scaling.py --devices 1 2 4 8 --height 256 --width 256
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure(n_devices: int, n_gauss: int, h: int, w: int, iters: int = 10):
    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.model.gaussians import init_from_points
    from hidegs_tpu.parallel.mesh import make_mesh
    from hidegs_tpu.parallel.sharded import make_dp_train_step, stack_view_batches
    from hidegs_tpu.raster.api import RasterConfig, render, suggest_max_instances
    from hidegs_tpu.train.loop import TrainConfig, ViewBatch, init_train_state

    mesh = make_mesh(n_devices, data=n_devices, model=1)
    scene = make_toy_gaussians(n_gauss, seed=0)
    cams = [ring_camera(i, n_cams=max(n_devices, 2), height=h, width=w) for i in range(n_devices)]
    rcfg = RasterConfig(backend="jnp", max_instances=suggest_max_instances(n_gauss, mult=16))
    gts = [render(*scene, c, config=rcfg)["render"] for c in cams]
    cfg = TrainConfig(iterations=10_000, raster=rcfg, freq_warmup=1, single_view_weight=0.0)
    step, place = make_dp_train_step(cfg, mesh)
    state = init_from_points(
        scene.means3d, jnp.full((n_gauss, 3), 0.5), capacity=max(2 * n_gauss, 1 << 12)
    )
    ts = init_train_state(state, num_images=n_devices)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(n_devices)]
    )
    ts, batch = place(ts, batch)
    ts, _ = step(ts, batch)  # compile + warm
    jax.block_until_ready(ts.gaussians.params.xyz)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, _ = step(ts, batch)
    jax.block_until_ready(ts.gaussians.params.xyz)
    dt = time.perf_counter() - t0
    pix_s = n_devices * h * w * iters / dt
    return pix_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--gaussians", type=int, default=20_000)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    results = {}
    base = None
    for n in args.devices:
        if n > jax.device_count():
            continue
        pix_s = measure(n, args.gaussians, args.height, args.width, args.iters)
        if base is None:
            base = pix_s
        eff = pix_s / (base * n / args.devices[0])
        results[n] = {"pixels_per_s": pix_s, "efficiency": eff}
        print(json.dumps({"devices": n, "pixels_per_s": round(pix_s), "efficiency": round(eff, 3)}))
    return results


if __name__ == "__main__":
    main()
