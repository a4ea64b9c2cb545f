"""Convergence record harness (VERDICT r1 item 6).

Round 1 evaluated AT the opacity-reset steps (3000/6000), so the record
showed 9 dB craters that were really the scheduled reset transient; and the
8000-step PSNR (37.9) sat below the 7000-step peak (38.7) with no recorded
cause. This harness:

  * evaluates at `--eval-every` steps shifted `--eval-offset` past the reset
    boundary (default +500: mid-interval, transient settled);
  * additionally samples a dense window right after each reset
    (+10/+50/+150 steps) so the recovery speed itself is on record — the
    round-2 opacity-moment reset (model/adam.reset_opacity_moments,
    reference gaussian_model.py:542-560) is expected to shorten it;
  * writes docs/convergence_r2.json: [{step, psnr, ssim, alive}, ...].

Scene: 6 ring views of an 8k-gaussian synthetic scene at 256², initialized
from a third of the points — the round-1 protocol (docs/BENCHMARKS.md).

Usage: python benchmarks/convergence.py [--steps 8000]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.model.gaussians import init_from_points
from hidegs_tpu.model.knn import initial_scales
from hidegs_tpu.raster.api import RasterConfig, render, round_budget
from hidegs_tpu.train.loop import (
    TrainConfig,
    ViewBatch,
    init_train_state,
    maybe_host_side_schedule,
    train_step,
)
from hidegs_tpu.train.losses import psnr, ssim


def evaluate(ts, cams, gts, rcfg):
    g = ts.gaussians
    ps, ss = [], []
    for cam, gt in zip(cams, gts):
        out = render(
            g.params.xyz, g.scales, g.quats, g.opacities, g.shs_flat, cam,
            active_sh_degree=g.active_sh_degree, config=rcfg,
        )
        img = jnp.clip(out["render"], 0, 1)
        ps.append(float(psnr(img, gt)))
        ss.append(float(ssim(img, gt)))
    return float(np.mean(ps)), float(np.mean(ss))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--n-gt", type=int, default=8000)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--eval-offset", type=int, default=500)
    ap.add_argument("--reset-probe", type=int, nargs="+", default=[10, 50, 150])
    ap.add_argument("--out", default="docs/convergence_r2.json")
    args = ap.parse_args()

    H = W = args.res
    scene = make_toy_gaussians(args.n_gt, seed=3)
    cams = [ring_camera(i, n_cams=args.views, height=H, width=W)
            for i in range(args.views)]
    rcfg = RasterConfig(
        backend="pallas", tile=32, max_instances=round_budget(1 << 18),
        max_blocks=2048, depth_sort_bits=-1,
    )
    gts = [render(*scene, c, config=rcfg)["render"] for c in cams]

    third = args.n_gt // 3
    pts = scene.means3d[:third]
    state = init_from_points(
        pts, jnp.full((third, 3), 0.5), capacity=1 << 16,
        knn_scale=initial_scales(pts), spatial_lr_scale=3.0,
    )
    cfg = TrainConfig(
        iterations=args.steps, raster=rcfg,
        densify_from=500, densify_until=int(args.steps * 0.6),
        densify_interval=300, opacity_reset_interval=3000,
        freq_warmup=200, single_view_weight=0.0,
    )
    ts = init_train_state(state, num_images=args.views)

    eval_steps = set()
    for k in range(args.eval_offset, args.steps + 1, args.eval_every):
        eval_steps.add(k)
    eval_steps.add(args.steps)
    for r in range(cfg.opacity_reset_interval, args.steps, cfg.opacity_reset_interval):
        for d in args.reset_probe:
            if r + d <= args.steps:
                eval_steps.add(r + d)

    rng = np.random.default_rng(0)
    order = []
    curve = []
    t0 = time.time()
    p0, s0 = evaluate(ts, cams, gts, rcfg)
    curve.append({"step": 0, "psnr": p0, "ssim": s0,
                  "alive": int(ts.gaussians.alive.sum())})
    print(f"[0] psnr={p0:.2f}", flush=True)
    for it in range(1, args.steps + 1):
        if not order:
            order = list(rng.permutation(args.views))
        vi = int(order.pop())
        batch = ViewBatch(cam=cams[vi], image=gts[vi], image_idx=jnp.int32(vi))
        ts, _ = train_step(ts, batch, cfg)
        ts, _ = maybe_host_side_schedule(ts, cfg, scene_extent=3.0, step=it)
        if it in eval_steps:
            p, s = evaluate(ts, cams, gts, rcfg)
            alive = int(ts.gaussians.alive.sum())
            curve.append({"step": it, "psnr": p, "ssim": s, "alive": alive})
            print(f"[{it}/{args.steps}] psnr={p:.2f} ssim={s:.4f} "
                  f"alive={alive} ({time.time()-t0:.0f}s)", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(curve, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
