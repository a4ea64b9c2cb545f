"""Standalone viewer server: serve a trained model to SIBR over the socket.

    python -m hidegs_tpu.viewer --model_path /out/run1 [--port 6009]

Loads the latest checkpoint ply and answers render requests with the
wire protocol of the reference's network_gui (so the SIBR remote viewer
connects unchanged).
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
    args = ap.parse_args(argv)

    it = args.iteration
    root = os.path.join(args.model_path, "point_cloud")
    if it == -1:
        it = find_latest_iteration(root)
    arrays = load_gaussian_state_from_ply(
        os.path.join(root, f"iteration_{it}", "point_cloud.ply")
    )
    cfg = RasterConfig(backend=args.backend, max_instances=args.max_instances)

    def render_fn(cam, msg):
        out = render(*arrays, cam, config=cfg)
        return np.asarray(jnp.clip(out["render"], 0, 1))

    gui = NetworkGUI(args.host, args.port)
    print(f"viewer server on {args.host}:{args.port} (iteration {it})", flush=True)
    while True:
        msg = gui.poll(render_fn, verify=args.model_path)
        if msg is None:
            time.sleep(0.005)


if __name__ == "__main__":
    main()
