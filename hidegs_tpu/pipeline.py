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


def train_one_chunk(
    source_path: str,
    chunks_dir: str,
    ci: int,
    cj: int,
    iterations: int = 1000,
    capacity: int = 0,
    max_instances: int = 1 << 18,
    backend: str = "jnp",
    resolution: int = -1,
    skybox_num: int = 0,
    log_every: int = 200,
    scaffold_dir: str = "",
) -> str:
    """Train chunk (ci, cj) and build its hierarchy. Idempotent: returns
    immediately if `hierarchy.hier` already exists (fan-out resume). This is
    the per-process unit of the chunk fan-out — the analog of one SLURM job
    in the reference's generate_chunks.py:17-35."""
    import numpy as np

    from hidegs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
    from hidegs_tpu.hier.build import build_hierarchy
    from hidegs_tpu.hier.io import write_hier
    from hidegs_tpu.train.trainer import train
    from hidegs_tpu.utils.ply import load_gaussian_arrays

    cdir = os.path.join(chunks_dir, f"chunk_{ci}_{cj}")
    hier_path = os.path.join(cdir, "hierarchy.hier")
    if os.path.exists(hier_path):
        print(f"[pipeline] chunk_{ci}_{cj}: hierarchy exists, skipping", flush=True)
        return hier_path
    model_dir = os.path.join(cdir, "trained")
    # chunk scenes reuse the full images directory
    model_cfg = ModelConfig(
        source_path=cdir,
        model_path=model_dir,
        images=os.path.join(os.path.relpath(source_path, cdir), "images"),
        resolution=resolution,
        skybox_num=skybox_num,
        scaffold_file=scaffold_dir,
    )
    # Box cull ONLY with a scaffold (the reference pairing,
    # gaussian_model.py:235-274 + forward.cu:319-321): culling out-of-cell
    # gaussians without one makes border pixels that show out-of-cell
    # content unexplainable, and the gradient pushes in-cell gaussians to
    # cover them (the r4 largescene A/B: 13.6 dB raw merge with
    # cull-no-scaffold vs 17.0 in r3 without the cull). With a scaffold the
    # frozen coarse-model border annulus explains those pixels, so the cull
    # can confine gradient to the cell.
    pipe_cfg = PipelineConfig(
        raster_backend=backend, max_instances=max_instances, capacity=capacity,
        chunk_box_cull=bool(scaffold_dir),
    )
    opt_cfg = OptimizationConfig(
        iterations=iterations,
        densify_from_iter=max(iterations // 10, 50),
        densify_until_iter=int(iterations * 0.8),
        # //20 (not //10): long chunk schedules (≥5k, VERDICT r4 item 6) get
        # ~14 densify events so the chunk actually reaches its capacity;
        # //10 left ~7 events and r3 chunks plateaued at ~50k of 65k rows
        densification_interval=max(iterations // 20, 50),
        opacity_reset_interval=10 * iterations,
        freq_warmup_iterations=max(iterations // 10, 20),
        single_view_weight_from_iter=max(iterations // 3, 100),
        multi_view_weight_from_iter=max(iterations // 2, 100),
        multi_view_sample_num=1024,
    )
    print(f"[pipeline] training chunk_{ci}_{cj}", flush=True)
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
    write_hier(hier_path, h)
    print(f"[pipeline] chunk_{ci}_{cj}: {h.num_points} gaussians → {hier_path}",
          flush=True)
    return hier_path


def _fanout_chunks(
    chunks, source_path: str, output_path: str, workers: int, **kw
) -> None:
    """Run each chunk's training in its own subprocess, `workers` at a time.

    Subprocesses invoke `python -m hidegs_tpu.pipeline --chunk i j ...`,
    which routes to train_one_chunk and exits. A failed worker is retried
    once (idempotent resume: finished chunks short-circuit); a second
    failure raises."""
    import subprocess
    import sys

    env = dict(os.environ)
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            # children mirror the parent's backend: on a CPU host the
            # tunneled-TPU bootstrap (PALLAS_AXON_POOL_IPS) must not
            # re-register itself in the workers
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("PALLAS_AXON_POOL_IPS", None)
    except Exception:
        pass

    def cmd_for(ch):
        return [
            sys.executable, "-m", "hidegs_tpu.pipeline",
            "--source_path", source_path,
            "--output_path", output_path,
            "--chunk", str(ch.i), str(ch.j),
            "--chunk_size", str(kw["chunk_size"]),
            "--min_n_cams", str(kw["min_n_cams"]),
            "--iterations", str(kw["iterations"]),
            "--capacity", str(kw["capacity"]),
            "--max_instances", str(kw["max_instances"]),
            "--backend", kw["backend"],
            "--resolution", str(kw["resolution"]),
            "--skybox_num", str(kw["skybox_num"]),
            "--scaffold_dir", kw.get("scaffold_dir", ""),
        ]

    pending = list(chunks)
    retried = set()
    running = {}  # popen -> chunk
    t0 = time.time()
    while pending or running:
        while pending and len(running) < workers:
            ch = pending.pop(0)
            p = subprocess.Popen(cmd_for(ch), env=env)
            running[p] = ch
            print(f"[pipeline] worker started for chunk_{ch.i}_{ch.j} "
                  f"(pid {p.pid}, {len(running)} running)", flush=True)
        done = [p for p in running if p.poll() is not None]
        if not done:
            time.sleep(2.0)
            continue
        for p in done:
            ch = running.pop(p)
            if p.returncode != 0:
                key = (ch.i, ch.j)
                if key in retried:
                    raise RuntimeError(
                        f"chunk_{ch.i}_{ch.j} worker failed twice "
                        f"(rc={p.returncode})"
                    )
                retried.add(key)
                print(f"[pipeline] chunk_{ch.i}_{ch.j} failed "
                      f"(rc={p.returncode}) — retrying", flush=True)
                pending.append(ch)
            else:
                print(f"[pipeline] chunk_{ch.i}_{ch.j} worker done "
                      f"({time.time()-t0:.0f}s)", flush=True)


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
    workers: int = 1,
    coarse_iterations: int = 0,
):
    """Returns the path of the merged global hierarchy."""
    from hidegs_tpu.data import colmap
    from hidegs_tpu.hier.io import read_hier, write_hier
    from hidegs_tpu.hier.merge import merge_hierarchies
    from hidegs_tpu.preprocess import chunking

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

    # ---- 1.5 coarse global model → per-chunk scaffold ------------------
    # The reference trains each chunk against a frozen border scaffold cut
    # from a coarse whole-scene model (gaussian_model.py:235-274); the
    # scaffold explains the border pixels showing out-of-cell content so
    # the chunk-AABB cull can ship ON (see train_one_chunk's note).
    scaffold_dir = ""
    if coarse_iterations > 0:
        from hidegs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
        from hidegs_tpu.train.trainer import train as _train

        coarse_out = os.path.join(output_path, "coarse")
        sdir = os.path.join(
            coarse_out, "point_cloud", f"iteration_{coarse_iterations}"
        )
        if os.path.exists(os.path.join(sdir, "point_cloud.ply")):
            print("[pipeline] coarse model exists, skipping", flush=True)
        else:
            print(f"[pipeline] coarse global model ({coarse_iterations} iters)",
                  flush=True)
            _train(
                ModelConfig(
                    source_path=source_path, model_path=coarse_out,
                    resolution=resolution, skybox_num=skybox_num,
                ),
                PipelineConfig(
                    raster_backend=backend, max_instances=max_instances,
                    capacity=capacity,
                ),
                OptimizationConfig(
                    iterations=coarse_iterations,
                    densify_from_iter=max(coarse_iterations // 10, 50),
                    densify_until_iter=int(coarse_iterations * 0.8),
                    densification_interval=max(coarse_iterations // 10, 50),
                    opacity_reset_interval=10 * coarse_iterations,
                    freq_warmup_iterations=max(coarse_iterations // 10, 20),
                    single_view_weight=0.0,
                    multi_view_ncc_weight=0.0,
                ),
                save_iterations=(coarse_iterations,), log_every=log_every,
            )
        scaffold_dir = sdir
        print(f"[pipeline] scaffold source: {scaffold_dir} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # ---- 2. per-chunk training + hierarchy build -----------------------
    # Sequential in-process by default; `workers > 1` fans each chunk out to
    # its own subprocess (the TPU analog of the reference's SLURM fan-out,
    # preprocess/generate_chunks.py:17-35) — chunks share nothing but the
    # filesystem, and already-built chunk hierarchies are skipped so a
    # crashed/preempted fan-out resumes where it left off.
    centers = [ch.center for ch in chunks]
    extents = [ch.extent for ch in chunks]
    if workers > 1:
        _fanout_chunks(
            chunks, source_path, output_path, workers,
            chunk_size=chunk_size, min_n_cams=min_n_cams,
            iterations=iterations, capacity=capacity,
            max_instances=max_instances, backend=backend,
            resolution=resolution, skybox_num=skybox_num,
            scaffold_dir=scaffold_dir,
        )
        hier_paths = []
        for ch in chunks:
            p = os.path.join(chunks_dir, f"chunk_{ch.i}_{ch.j}", "hierarchy.hier")
            if not os.path.exists(p):
                raise RuntimeError(f"chunk worker produced no hierarchy: {p}")
            hier_paths.append(p)
    else:
        hier_paths = []
        for ch in chunks:
            hier_paths.append(train_one_chunk(
                source_path, chunks_dir, ch.i, ch.j,
                iterations=iterations, capacity=capacity,
                max_instances=max_instances, backend=backend,
                resolution=resolution, skybox_num=skybox_num,
                log_every=log_every, scaffold_dir=scaffold_dir,
            ))
            print(f"[pipeline] chunk_{ch.i}_{ch.j} done ({time.time()-t0:.0f}s)",
                  flush=True)

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
        # exposure trained during post-opt (VERDICT r3 item 7): per-chunk
        # exposure compensation does not survive the merge, so the global
        # hierarchy re-fits per-image exposure from identity here
        ts = post_optimize(
            h, cams, images, iterations=post_opt_iterations,
            raster_cfg=RasterConfig(backend=backend, max_instances=max_instances),
            log_every=log_every, optimize_exposure=True,
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
    from hidegs_tpu.hier.lod import expand_packed, pack_hierarchy
    from hidegs_tpu.raster.api import RasterConfig
    from hidegs_tpu.train.losses import psnr

    h = read_hier(hier_path)
    P = int(h.num_points)
    budget = 1 << max(int(np.ceil(np.log2(max(P, 2)))), 10)
    arrays = (
        jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)),
        jnp.asarray(h.rot), jnp.asarray(h.alpha), jnp.asarray(h.shs),
    )
    packed = pack_hierarchy(jnp.asarray(h.nodes), jnp.asarray(h.boxes))
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
            cut = expand_packed(
                packed, target, cp.camera_center, budget=budget,
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
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent per-chunk training subprocesses (the "
                         "SLURM-fan-out analog; 1 = sequential in-process)")
    ap.add_argument("--chunk", type=int, nargs=2, default=None, metavar=("I", "J"),
                    help="worker mode: train ONLY chunk (i, j) from an "
                         "already-chunked output dir, then exit")
    ap.add_argument("--coarse_iterations", type=int, default=0,
                    help="train a coarse whole-scene model first and use its "
                         "border annulus as each chunk's frozen scaffold "
                         "(enables the chunk-AABB cull, reference pairing)")
    ap.add_argument("--scaffold_dir", default="",
                    help="worker mode: scaffold checkpoint dir for the chunk")
    args = ap.parse_args(argv)
    if args.chunk is not None:
        train_one_chunk(
            args.source_path, os.path.join(args.output_path, "chunks"),
            args.chunk[0], args.chunk[1],
            iterations=args.iterations, capacity=args.capacity,
            max_instances=args.max_instances, backend=args.backend,
            resolution=args.resolution, skybox_num=args.skybox_num,
            scaffold_dir=args.scaffold_dir,
        )
        return
    run_pipeline(
        args.source_path, args.output_path,
        chunk_size=args.chunk_size, min_n_cams=args.min_n_cams,
        iterations=args.iterations, post_opt_iterations=args.post_opt_iterations,
        capacity=args.capacity, max_instances=args.max_instances,
        backend=args.backend, resolution=args.resolution, skybox_num=args.skybox_num,
        eval_taus=tuple(args.eval_taus), workers=args.workers,
        coarse_iterations=args.coarse_iterations,
    )


if __name__ == "__main__":
    main()
