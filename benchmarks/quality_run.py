"""Full-length quality run on the synthetic UAV scene (quality parity proxy).

The container ships no ISPRS/WHU data, so quality parity is tracked on the
synthetic UAV workload (`data/synthetic.make_uav_gaussians`): high-frequency
textured ground + box structures, lawnmower nadir captures, COLMAP layout,
llffhold-style eval split — the same protocol as the reference's real scenes
(reference README.md:128-141, eval split dataset_readers.py:269-282).

Runs the COMPLETE reconstructed training loop (SURVEY §3.3): photometric +
frequency-spatial regularization + scale reg + single-view geometric
consistency + multi-view NCC/geo, densification, exposure, checkpoints; then
evaluates held-out views. Writes metrics to docs/quality_uav_r{N}.json.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil


def build_dataset(root: str, width: int, height: int, nx: int, ny: int, n_ground: int,
                  point_stride: int = 2):
    import numpy as np

    from hidegs_tpu.data.synthetic import (
        make_uav_gaussians,
        nadir_grid_camera,
        write_synthetic_colmap_scene,
    )
    from hidegs_tpu.raster.api import RasterConfig

    scene = make_uav_gaussians(n_ground=n_ground, seed=3)
    print(f"ground-truth gaussians: {scene.means3d.shape[0]}")
    cams = [
        nadir_grid_camera(ix, iy, nx, ny, height=height, width=width)
        for iy in range(ny)
        for ix in range(nx)
    ]
    cfg = RasterConfig(backend="pallas", tile=32, max_instances=1 << 20,
                       depth_sort_bits=-1)
    write_synthetic_colmap_scene(
        root, scene, cams, render_config=cfg, point_stride=point_stride,
        jitter_points=0.02,
    )
    return root


ANALYTIC_SPHERES = [
    [4.0, 1.5, 0.9, 0.9], [-5.0, -3.0, 0.7, 0.7], [0.5, 5.5, 0.6, 0.6],
    [-2.5, 2.5, 1.2, 0.55], [6.0, -4.0, 0.8, 0.8], [2.0, -6.0, 0.5, 0.5],
]
ANALYTIC_COLORS = [
    [0.80, 0.30, 0.25], [0.30, 0.40, 0.85], [0.85, 0.75, 0.30],
    [0.45, 0.75, 0.45], [0.70, 0.45, 0.75], [0.35, 0.70, 0.75],
]


def build_analytic_dataset(root: str, size: int, nx: int, ny: int,
                           extent_xy: float = 12.0, n_points: int = 16_000):
    import numpy as np

    from hidegs_tpu.data.synthetic import (
        nadir_grid_camera,
        write_analytic_colmap_scene,
    )

    cams = [
        nadir_grid_camera(ix, iy, nx, ny, extent_xy=extent_xy, height=size,
                          width=size)
        for iy in range(ny)
        for ix in range(nx)
    ]
    write_analytic_colmap_scene(
        root, cams, np.asarray(ANALYTIC_SPHERES), np.asarray(ANALYTIC_COLORS),
        extent_xy=extent_xy, n_points=n_points,
    )
    return root


def build_terrain_dataset(root: str, size: int, nx: int, ny: int,
                          extent_xy: float = 12.0, n_points: int = 16_000):
    """Realistic-image benchmark scene (VERDICT r3 item 1): ray-marched
    textured height field with view-dependent lighting, synthetic monodepth
    (smooth low-frequency error + holes + depth_params.json) and COLMAP-
    style noisy sparse points. Generation is CPU-bound one-time work; the
    dataset is cached on disk."""
    from hidegs_tpu.data.synthetic import (
        nadir_grid_camera,
        write_terrain_colmap_scene,
    )

    cams = [
        nadir_grid_camera(ix, iy, nx, ny, extent_xy=extent_xy, height=size,
                          width=size)
        for iy in range(ny)
        for ix in range(nx)
    ]
    write_terrain_colmap_scene(root, cams, extent_xy=extent_xy,
                               n_points=n_points)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/uav_quality/scene")
    ap.add_argument("--model", default="/tmp/uav_quality/run")
    ap.add_argument("--iterations", type=int, default=30_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--grid", type=int, nargs=2, default=[6, 5])
    ap.add_argument("--n-ground", type=int, default=20_000)
    # sparse inits (stride 6 ≈ 4k points over the whole scene) made every
    # init gaussian huge (KNN scales ~ the 1m point spacing ≫ percent_dense·
    # extent), so ALL of them took the split path every round → exponential
    # doubling to capacity by step 3000 and the photometric loss rose the
    # whole way. Real COLMAP clouds are much denser; stride 2 matches that.
    ap.add_argument("--point-stride", type=int, default=2)
    ap.add_argument("--capacity", type=int, default=1 << 18)
    # densify thresholds: the reference's 0.015/0.0008 are calibrated for its
    # ~1.6K real captures; on this sharp synthetic checker at 512 they
    # over-fire (first 30k run saturated capacity by step 3000 and the loss
    # collapsed 0.08 -> 0.5). Scale with resolution.
    ap.add_argument("--densify-grad-threshold", type=float, default=0.04)
    ap.add_argument("--densify-abs-grad-threshold", type=float, default=0.002)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--analytic", action="store_true",
                    help="ray-cast analytic GT (non-realizable) instead of "
                         "splat-rendered GT — VERDICT r2 item 6")
    ap.add_argument("--terrain", action="store_true",
                    help="realistic-image benchmark: ray-marched height "
                         "field + synthetic monodepth + COLMAP noise "
                         "(VERDICT r3 item 1)")
    ap.add_argument("--out", default="docs/quality_uav_r1.json")
    ap.add_argument("--train-arg", action="append", default=[],
                    help="extra trainer flags, e.g. --train-arg=--densify_until_iter=7500")
    args = ap.parse_args()

    if args.fresh and os.path.isdir(args.data):
        shutil.rmtree(args.data)
    if args.fresh and os.path.isdir(args.model):
        shutil.rmtree(args.model)
    if not os.path.isdir(args.data):
        if args.terrain:
            build_terrain_dataset(args.data, args.size, *args.grid)
        elif args.analytic:
            build_analytic_dataset(args.data, args.size, *args.grid)
        else:
            build_dataset(args.data, args.size, args.size, *args.grid,
                          args.n_ground, point_stride=args.point_stride)

    from hidegs_tpu.train import trainer

    train_args = [
        "--source_path", args.data,
        "--model_path", args.model,
        "--eval",
        "--raster_backend", "pallas",
        "--iterations", str(args.iterations),
        "--capacity", str(args.capacity),
        "--densify_grad_threshold", str(args.densify_grad_threshold),
        "--densify_abs_grad_threshold", str(args.densify_abs_grad_threshold),
        "--save_iterations", "7000", "15000", str(args.iterations),
    ]
    if args.analytic:
        # the analytic GT has real SKY in the tilted edge views; without a
        # skybox the ground gaussians chase it to infinity (the r3 30k run
        # exploded to NaN on 99.97% of rows by step 7000; densify's
        # non-finite scrub now prunes such rows, and the skybox — reference
        # create_from_pcd, gaussian_model.py:196-211 — gives sky pixels a
        # fittable model)
        train_args += ["--skybox_num", "2000"]
    if args.terrain:
        # full-pipeline inputs: monodepth supervision (with the synthetic
        # error field + per-pixel holes) and a skybox for any sky pixels
        train_args += ["--depths", "depths", "--skybox_num", "2000"]
    trainer.main(train_args + [a for extra in args.train_arg for a in extra.split("=", 1)])

    from hidegs_tpu import evaluate

    evaluate.main([
        "--source_path", args.data,
        "--model_path", args.model,
        "--eval",
        "--no_images",
    ])
    # evaluate.main writes results.json under the model dir
    it_dirs = [d for d in os.listdir(args.model) if d.startswith("eval_")]
    it_dirs.sort(key=lambda d: int(d.split("_")[1]))
    res_path = os.path.join(args.model, it_dirs[-1], "results.json")
    report = json.load(open(res_path))
    summary = {
        "workload": {
            "scene": ("realistic terrain (ray-marched height field + "
                      "synthetic monodepth + COLMAP noise)" if args.terrain
                      else "analytic ray-cast (non-realizable GT)" if args.analytic
                      else "synthetic UAV (make_uav_gaussians)"),
            "views": args.grid[0] * args.grid[1],
            "resolution": [args.size, args.size],
            "iterations": args.iterations,
            "eval_split": "llffhold=8",
        },
        "lpips_kind": report.get("lpips_kind", "unknown"),
        "train": report.get("train", {}).get("mean", {}),
        "test": report.get("test", {}).get("mean", {}),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(summary, open(args.out, "w"), indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
