"""Standalone viewer server.

Two frontends over the same render path:
  * SIBR socket protocol (default) — the reference's network_gui wire format,
    so the SIBR remote viewer connects unchanged:
        python -m hidegs_tpu.viewer --model_path /out/run1 [--port 6009]
  * Browser viewer — zero-dependency orbit viewer over HTTP
    (viewer/http_viewer.py):
        python -m hidegs_tpu.viewer --model_path /out/run1 --http 8080
"""
from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np

from hidegs_tpu.evaluate import load_gaussian_state_from_ply
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.checkpoint import find_latest_iteration
from hidegs_tpu.viewer.network_gui import NetworkGUI


def main(argv=None):
    ap = argparse.ArgumentParser("hidegs_tpu viewer server")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=6009)
    ap.add_argument("--max_instances", type=int, default=1 << 20)
    ap.add_argument("--backend", default="jnp")
    ap.add_argument("--http", type=int, default=0,
                    help="serve the browser viewer on this port instead of "
                         "the SIBR socket protocol")
    args = ap.parse_args(argv)

    it = args.iteration
    root = os.path.join(args.model_path, "point_cloud")
    if it == -1:
        it = find_latest_iteration(root)
    arrays = load_gaussian_state_from_ply(
        os.path.join(root, f"iteration_{it}", "point_cloud.ply")
    )
    cfg = RasterConfig(backend=args.backend, max_instances=args.max_instances)

    def render_fn(cam, msg=None):
        out = render(*arrays, cam, config=cfg)
        return np.asarray(jnp.clip(out["render"], 0, 1))

    if args.http:
        from hidegs_tpu.viewer.http_viewer import HttpViewer

        xyz = np.asarray(arrays[0])
        center = np.median(xyz, axis=0)
        dist = 2.5 * float(np.percentile(
            np.linalg.norm(xyz - center[None], axis=-1), 90
        ))
        viewer = HttpViewer(
            render_fn, center=center, dist=max(dist, 1.0),
            host=args.host, port=args.http,
            info={"iteration": it, "n_gaussians": int(xyz.shape[0])},
        )
        print(f"browser viewer on http://{args.host}:{viewer.port} "
              f"(iteration {it})", flush=True)
        viewer.serve_forever()
        return

    gui = NetworkGUI(args.host, args.port)
    print(f"viewer server on {args.host}:{args.port} (iteration {it})", flush=True)
    while True:
        msg = gui.poll(render_fn, verify=args.model_path)
        if msg is None:
            time.sleep(0.005)


if __name__ == "__main__":
    main()
