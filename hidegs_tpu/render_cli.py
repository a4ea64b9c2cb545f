"""Render-only entry point — `python -m hidegs_tpu.render_cli`.

Parity with the reference README's render.py usage (README.md:192-197):
renders every camera of a scene with a trained model into --output_path,
no metrics. Optionally renders the LOD hierarchy via --hierarchy.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from hidegs_tpu.config import ModelConfig, add_group, extract_group
from hidegs_tpu.evaluate import load_gaussian_state_from_ply, save_png
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.checkpoint import find_latest_iteration


def main(argv=None):
    ap = argparse.ArgumentParser("hidegs_tpu render")
    add_group(ap, ModelConfig())
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--backend", default="jnp")
    ap.add_argument("--max_instances", type=int, default=1 << 20)
    ap.add_argument("--tau", type=float, default=0.0, help="LOD target size (hierarchy mode)")
    args = ap.parse_args(argv)
    model_cfg = extract_group(args, ModelConfig)

    from hidegs_tpu.data.scene import load_scene

    scene = load_scene(
        model_cfg.source_path, images=model_cfg.images, resolution=model_cfg.resolution
    )
    cfg = RasterConfig(backend=args.backend, max_instances=args.max_instances)
    os.makedirs(args.output_path, exist_ok=True)

    if model_cfg.hierarchy:
        from hidegs_tpu.hier.io import read_hier
        from hidegs_tpu.hier.interp import render_hierarchy
        from hidegs_tpu.hier.lod import expand_to_size

        h = read_hier(model_cfg.hierarchy)
        nodes, boxes = jnp.asarray(h.nodes), jnp.asarray(h.boxes)
        arrays = (
            jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot),
            jnp.asarray(h.alpha), jnp.asarray(h.shs),
        )
        budget = 1 << max(int(np.ceil(np.log2(max(h.num_points, 1024)))), 10)
        for i in range(len(scene.train_cameras)):
            cam = scene.train_cameras[i]
            cp = cam.cam_params()
            vp = jnp.asarray(np.asarray(cp.camera_center))
            from hidegs_tpu.hier.lod import tau_to_target_size

            # --tau is in PIXELS (reference convention); 0 = exact leaf cut
            target = 0.0 if args.tau == 0 else tau_to_target_size(args.tau, float(cp.fx))
            cut = expand_to_size(
                nodes, boxes, target, vp, budget=budget, num_points=h.num_points
            )
            out = render_hierarchy(cut, *arrays, cp, config=cfg)
            save_png(
                os.path.join(args.output_path, f"{i:05d}.png"),
                np.asarray(jnp.clip(out["render"], 0, 1)),
            )
        print(f"rendered {len(scene.train_cameras)} hierarchy views → {args.output_path}")
        return

    it = args.iteration
    root = os.path.join(model_cfg.model_path, "point_cloud")
    if it == -1:
        it = find_latest_iteration(root)
    arrays = load_gaussian_state_from_ply(
        os.path.join(root, f"iteration_{it}", "point_cloud.ply")
    )
    for i in range(len(scene.train_cameras)):
        cam = scene.train_cameras[i]
        out = render(*arrays, cam.cam_params(), config=cfg)
        save_png(
            os.path.join(args.output_path, f"{i:05d}.png"),
            np.asarray(jnp.clip(out["render"], 0, 1)),
        )
    print(f"rendered {len(scene.train_cameras)} views → {args.output_path}")


if __name__ == "__main__":
    main()
