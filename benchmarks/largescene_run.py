"""Large-scene pipeline run at non-toy size (VERDICT r1 item 5).

Drives ≥4 chunks / ≥200k total gaussian capacity through the full offline
flow — chunk → per-chunk train → per-chunk hierarchy build → merge →
post-opt → tau-sweep LOD eval (pipeline.run_pipeline, mirroring
mainHierarchyMerger.cpp:88-139 + runtime_switching.cu:402-478) — on a
synthetic UAV COLMAP scene, and records PSNR-vs-tau plus peak host RSS to
docs/largescene_r2.json.

Usage: python benchmarks/largescene_run.py [--iterations 3000] [--res 256]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import time


def build_scene(root: str, res: int, nx: int, ny: int, n_ground: int,
                extent_xy: float):
    from hidegs_tpu.data.synthetic import (
        make_uav_gaussians,
        nadir_grid_camera,
        write_synthetic_colmap_scene,
    )
    from hidegs_tpu.raster.api import RasterConfig, round_budget

    scene = make_uav_gaussians(n_ground=n_ground, n_structs=96, seed=7,
                               extent_xy=extent_xy)
    print(f"[largescene] GT gaussians: {scene.means3d.shape[0]}", flush=True)
    cams = [
        nadir_grid_camera(ix, iy, nx, ny, extent_xy=extent_xy, altitude=16.0,
                          height=res, width=res)
        for iy in range(ny)
        for ix in range(nx)
    ]
    cfg = RasterConfig(backend="pallas", tile=32,
                       max_instances=round_budget(1 << 20), depth_sort_bits=-1)
    write_synthetic_colmap_scene(root, scene, cams, render_config=cfg,
                                 point_stride=2, jitter_points=0.02)
    return len(cams)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/largescene/scene")
    ap.add_argument("--out_dir", default="/tmp/largescene/run")
    ap.add_argument("--iterations", type=int, default=3000)
    ap.add_argument("--post_opt", type=int, default=500)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--grid", type=int, nargs=2, default=[8, 6])
    ap.add_argument("--n-ground", type=int, default=60_000)
    ap.add_argument("--extent", type=float, default=24.0)
    ap.add_argument("--chunk-size", type=float, default=18.0)
    ap.add_argument("--capacity", type=int, default=1 << 16)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--out", default="docs/largescene_r2.json")
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent per-chunk training subprocesses")
    ap.add_argument("--coarse-iterations", type=int, default=0,
                    help="coarse whole-scene model first; its border annulus "
                         "becomes each chunk's frozen scaffold and the "
                         "chunk-AABB cull ships ON (reference pairing)")
    args = ap.parse_args()

    if args.fresh:
        for d in (args.data, args.out_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
    if not os.path.isdir(args.data):
        n = build_scene(args.data, args.res, *args.grid, args.n_ground,
                        args.extent)
        print(f"[largescene] wrote scene: {n} cameras", flush=True)

    from hidegs_tpu.pipeline import run_pipeline

    t0 = time.time()
    run_pipeline(
        args.data, args.out_dir,
        chunk_size=args.chunk_size, min_n_cams=4,
        iterations=args.iterations, post_opt_iterations=args.post_opt,
        capacity=args.capacity, max_instances=1 << 19, backend="pallas",
        log_every=500, workers=args.workers,
        coarse_iterations=args.coarse_iterations,
    )
    wall = time.time() - t0

    report = json.load(open(os.path.join(args.out_dir, "pipeline.json")))
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    summary = {
        "workload": {
            "views": args.grid[0] * args.grid[1],
            "resolution": args.res,
            "gt_gaussians": args.n_ground,
            "chunk_capacity": args.capacity,
            "iterations_per_chunk": args.iterations,
            "post_opt_iterations": args.post_opt,
            "coarse_iterations": args.coarse_iterations,
        },
        "chunks": report["chunks"],
        "merged_points": report["num_points"],
        "merged_nodes": report["num_nodes"],
        "lod_eval": report["lod_eval"],
        "workers": args.workers,
        "wall_seconds": round(wall, 1),
        "peak_host_rss_gb": round(peak_rss_gb, 2),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(summary, open(args.out, "w"), indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
