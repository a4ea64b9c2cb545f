"""Large-scene pipeline driver — the offline flow of SURVEY §3.6 end-to-end:

    chunk the COLMAP scene → train each chunk → build per-chunk hierarchies
    → merge into a global hierarchy → (optional) post-optimize → artifacts

Run as `python -m hidegs_tpu.pipeline --source_path ... --output_path ...`.
Chunks train sequentially in-process here; on a pod each chunk is an
independent process (the reference fans out via SLURM,
preprocess/generate_chunks.py:17-35) — the per-chunk work is embarrassingly
parallel and shares nothing but the filesystem.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import numpy as np


def run_pipeline(
    source_path: str,
    output_path: str,
    chunk_size: float = 30.0,
    min_n_cams: int = 4,
    iterations: int = 1000,
    post_opt_iterations: int = 0,
    capacity: int = 0,
    max_instances: int = 1 << 18,
    backend: str = "jnp",
    resolution: int = -1,
    skybox_num: int = 0,
    add_far_cams: bool = True,
    log_every: int = 200,
    eval_taus=(0.0, 3.0, 6.0, 15.0),
):
    """Returns the path of the merged global hierarchy."""
    import jax.numpy as jnp

    from hidegs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
    from hidegs_tpu.data import colmap
    from hidegs_tpu.hier.build import build_hierarchy
    from hidegs_tpu.hier.io import read_hier, write_hier
    from hidegs_tpu.hier.merge import merge_hierarchies
    from hidegs_tpu.preprocess import chunking
    from hidegs_tpu.train.trainer import train
    from hidegs_tpu.utils.ply import load_gaussian_arrays

    t0 = time.time()
    os.makedirs(output_path, exist_ok=True)

    # ---- 1. chunk the scene (make_chunk.py equivalent) -----------------
    sparse = os.path.join(source_path, "sparse", "0")
    cams, imgs, (xyz, rgb, err, _ids) = colmap.read_model(sparse)
    chunks = chunking.compute_chunks(
        cams, imgs, xyz, err, chunk_size=chunk_size, min_n_cams=min_n_cams,
        add_far_cams=add_far_cams,
    )
    if not chunks:
        raise RuntimeError("no viable chunks (lower --min_n_cams or raise --chunk_size)")
    chunks_dir = os.path.join(output_path, "chunks")
    chunking.write_chunks(chunks, cams, imgs, xyz, rgb, err, chunks_dir)
    print(f"[pipeline] {len(chunks)} chunks ({time.time()-t0:.0f}s)", flush=True)

    # ---- 2. per-chunk training + hierarchy build -----------------------
    centers, extents, hier_paths = [], [], []
    for ch in chunks:
        cdir = os.path.join(chunks_dir, f"chunk_{ch.i}_{ch.j}")
        model_dir = os.path.join(cdir, "trained")
        # chunk scenes reuse the full images directory
        model_cfg = ModelConfig(
            source_path=cdir,
            model_path=model_dir,
            images=os.path.join(os.path.relpath(source_path, cdir), "images"),
            resolution=resolution,
            skybox_num=skybox_num,
        )
        pipe_cfg = PipelineConfig(
            raster_backend=backend, max_instances=max_instances, capacity=capacity
        )
        opt_cfg = OptimizationConfig(
            iterations=iterations,
            densify_from_iter=max(iterations // 10, 50),
            densify_until_iter=int(iterations * 0.8),
            densification_interval=max(iterations // 10, 50),
            opacity_reset_interval=10 * iterations,
            freq_warmup_iterations=max(iterations // 10, 20),
            single_view_weight_from_iter=max(iterations // 3, 100),
            multi_view_weight_from_iter=max(iterations // 2, 100),
            multi_view_sample_num=1024,
        )
        print(f"[pipeline] training chunk_{ch.i}_{ch.j} "
              f"({len(ch.camera_ids)} cams)", flush=True)
        train(
            model_cfg, pipe_cfg, opt_cfg,
            save_iterations=(iterations,), log_every=log_every,
        )

        ply_path = os.path.join(model_dir, "point_cloud", f"iteration_{iterations}",
                                "point_cloud.ply")
        d = load_gaussian_arrays(ply_path)
        shs = np.concatenate([d["sh_dc"][:, None, :], d["sh_rest"]], axis=1)
        h = build_hierarchy(
            d["xyz"], d["rotation"], np.exp(d["scaling"]),
            1.0 / (1.0 + np.exp(-d["opacity"])), shs,
        )
        hier_path = os.path.join(cdir, "hierarchy.hier")
        write_hier(hier_path, h)
        centers.append(ch.center)
        extents.append(ch.extent)
        hier_paths.append(hier_path)
        print(f"[pipeline] chunk_{ch.i}_{ch.j}: {h.num_points} gaussians "
              f"→ {hier_path} ({time.time()-t0:.0f}s)", flush=True)

    # ---- 3. merge into the global hierarchy ----------------------------
    merged = merge_hierarchies([read_hier(p) for p in hier_paths], centers, extents)
    merged_path = os.path.join(output_path, "merged.hier")
    write_hier(merged_path, merged)
    print(f"[pipeline] merged {len(hier_paths)} chunks → {merged.num_points} "
          f"gaussians, {merged.num_nodes} nodes → {merged_path}", flush=True)

    # ---- 4. optional global post-optimization --------------------------
    if post_opt_iterations > 0:
        from hidegs_tpu.data.scene import load_scene
        from hidegs_tpu.hier.io import read_hier as _read
        from hidegs_tpu.raster.api import RasterConfig
        from hidegs_tpu.train.hier_trainer import hierarchy_from_state, post_optimize

        scene = load_scene(source_path, resolution=resolution, cache_all=True)
        cams = [scene.train_cameras[i].cam_params() for i in range(len(scene.train_cameras))]
        images = [scene.train_cameras[i].image for i in range(len(scene.train_cameras))]
        h = _read(merged_path)
        ts = post_optimize(
            h, cams, images, iterations=post_opt_iterations,
            raster_cfg=RasterConfig(backend=backend, max_instances=max_instances),
            log_every=log_every,
        )
        write_hier(os.path.join(output_path, "merged_opt.hier"), hierarchy_from_state(ts, h))
        print(f"[pipeline] post-optimized hierarchy → merged_opt.hier", flush=True)

    # ---- 5. LOD render evaluation (render_post flow, §3.4) --------------
    lod_report = evaluate_lod(
        os.path.join(output_path, "merged_opt.hier")
        if post_opt_iterations > 0 else merged_path,
        source_path, resolution=resolution, backend=backend,
        max_instances=max_instances, taus=eval_taus,
    )
    for row in lod_report:
        print(f"[pipeline] LOD tau={row['tau']}: cut={row['mean_cut']:.0f} "
              f"gaussians, PSNR={row['psnr']:.2f}", flush=True)

    with open(os.path.join(output_path, "pipeline.json"), "w") as f:
        json.dump(
            {
                "chunks": [[int(c.i), int(c.j)] for c in chunks],
                "merged": merged_path,
                "num_points": int(merged.num_points),
                "num_nodes": int(merged.num_nodes),
                "lod_eval": lod_report,
                "seconds": time.time() - t0,
            },
            f,
            indent=1,
        )
    return merged_path


def evaluate_lod(
    hier_path: str,
    source_path: str,
    resolution: int = -1,
    backend: str = "jnp",
    max_instances: int = 1 << 18,
    taus=(0.0, 3.0, 6.0, 15.0),
    max_views: int = 8,
):
    """Render the global hierarchy at several granularities (`tau`, the
    projected node-size threshold of expand_to_size — 0 = full detail) and
    report PSNR + mean cut size per tau, the render_post evaluation flow
    (reference §3.4; h3dgs render_hierarchy.py pattern)."""
    import jax.numpy as jnp

    from hidegs_tpu.data.scene import load_scene
    from hidegs_tpu.hier.interp import render_hierarchy
    from hidegs_tpu.hier.io import read_hier
    from hidegs_tpu.hier.lod import expand_to_size
    from hidegs_tpu.raster.api import RasterConfig
    from hidegs_tpu.train.losses import psnr

    h = read_hier(hier_path)
    P = int(h.num_points)
    budget = 1 << max(int(np.ceil(np.log2(max(P, 2)))), 10)
    arrays = (
        jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)),
        jnp.asarray(h.rot), jnp.asarray(h.alpha), jnp.asarray(h.shs),
    )
    nodes, boxes = jnp.asarray(h.nodes), jnp.asarray(h.boxes)
    scene = load_scene(source_path, resolution=resolution, cache_all=False)
    n_views = min(len(scene.train_cameras), max_views)
    cfg = RasterConfig(backend=backend, max_instances=max_instances)
    report = []
    for tau in taus:
        psnrs, cuts = [], []
        for i in range(n_views):
            cam = scene.train_cameras[i]
            cp = cam.cam_params()
            from hidegs_tpu.hier.lod import tau_to_target_size

            # taus are PIXEL granularities (reference convention); 0 = leaves
            target = 0.0 if tau == 0 else tau_to_target_size(tau, float(cp.fx))
            cut = expand_to_size(
                nodes, boxes, target, cp.camera_center, budget=budget,
                num_points=P,
            )
            out = render_hierarchy(cut, *arrays, cp, config=cfg)
            img = jnp.clip(out["render"], 0.0, 1.0)
            psnrs.append(float(psnr(img, jnp.asarray(cam.image))))
            cuts.append(int(cut.valid.sum()))
        report.append(
            {
                "tau": float(tau),
                "psnr": float(np.mean(psnrs)),
                "mean_cut": float(np.mean(cuts)),
            }
        )
    return report


def main(argv=None):
    ap = argparse.ArgumentParser("hidegs_tpu large-scene pipeline")
    ap.add_argument("--source_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--chunk_size", type=float, default=30.0)
    ap.add_argument("--min_n_cams", type=int, default=100)
    ap.add_argument("--iterations", type=int, default=30_000)
    ap.add_argument("--post_opt_iterations", type=int, default=0)
    ap.add_argument("--capacity", type=int, default=0)
    ap.add_argument("--max_instances", type=int, default=1 << 20)
    ap.add_argument("--backend", default="jnp")
    ap.add_argument("--resolution", type=int, default=-1)
    ap.add_argument("--skybox_num", type=int, default=0)
    ap.add_argument("--eval_taus", type=float, nargs="*", default=[0.0, 3.0, 6.0, 15.0])
    args = ap.parse_args(argv)
    run_pipeline(
        args.source_path, args.output_path,
        chunk_size=args.chunk_size, min_n_cams=args.min_n_cams,
        iterations=args.iterations, post_opt_iterations=args.post_opt_iterations,
        capacity=args.capacity, max_instances=args.max_instances,
        backend=args.backend, resolution=args.resolution, skybox_num=args.skybox_num,
        eval_taus=tuple(args.eval_taus),
    )


if __name__ == "__main__":
    main()
