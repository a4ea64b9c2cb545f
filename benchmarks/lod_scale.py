"""Hierarchy LOD at scale (VERDICT r1 missing-item 5).

The reference interpolates parent/child attributes inside preprocessCUDA
(forward.cu:290-343); our design keeps the cut selection (hier/lod.py,
markNodesForSize + computeTsIndexed as vectorized XLA) and the attribute
interpolation (hier/interp.py, gathers + lerp fused by XLA into the
preprocess) on the device side of one jit. Round 1 only exercised this at
toy node counts; this harness builds a ~1M-leaf hierarchy (native C++
builder), then measures on hardware:

  * expand_to_size latency over the full node array per tau;
  * render_hierarchy (cut → interp → full raster) latency and the
    interpolation's share of it;
  * cut sizes per tau (the LOD sweep of runtime_switching.cu:402-478).

Writes docs/lod_scale_r2.json.

Usage: python benchmarks/lod_scale.py [--n 1000000]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hidegs_tpu.data.synthetic import make_uav_gaussians, nadir_grid_camera
    from hidegs_tpu.hier.build import build_hierarchy
    from hidegs_tpu.hier.interp import interpolate_cut, render_hierarchy
    from hidegs_tpu.hier.lod import expand_to_size
    from hidegs_tpu.raster.api import RasterConfig, round_budget

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--taus", type=float, nargs="+",
                    default=[0.0, 1.0, 3.0, 6.0, 15.0])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="docs/lod_scale_r2.json")
    args = ap.parse_args()

    t0 = time.time()
    cache = f"/tmp/lod_scale_hier_{args.n}.hier"
    if os.path.exists(cache):
        from hidegs_tpu.hier.io import read_hier

        h = read_hier(cache)
        P = int(h.num_points)
        print(f"hierarchy from cache {cache}: {h.num_points} points, "
              f"{h.num_nodes} nodes", flush=True)
    else:
        scene = make_uav_gaussians(n_ground=args.n, n_structs=128, seed=1,
                                   extent_xy=30.0)
        P = int(scene.means3d.shape[0])
        print(f"building hierarchy over {P} leaves (native builder)...",
              flush=True)
        h = build_hierarchy(
            np.asarray(scene.means3d), np.asarray(scene.quats),
            np.asarray(scene.scales), np.asarray(scene.opacities),
            np.asarray(scene.shs),
        )
        from hidegs_tpu.hier.io import write_hier

        write_hier(cache, h)
        print(f"hierarchy: {h.num_points} points, {h.num_nodes} nodes "
              f"({time.time()-t0:.0f}s) → cached {cache}", flush=True)

    cam = nadir_grid_camera(0, 0, 1, 1, extent_xy=30.0, altitude=22.0,
                            height=args.res, width=args.res)
    arrays = (
        jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot),
        jnp.asarray(h.alpha), jnp.asarray(h.shs),
    )
    nodes, boxes = jnp.asarray(h.nodes), jnp.asarray(h.boxes)
    budget = round_budget(P)
    rcfg = RasterConfig(backend="pallas", tile=32,
                        max_instances=round_budget(1 << 21),
                        depth_sort_bits=-1)

    def _force(out):
        # fetch ONE element: on the tunneled backend block_until_ready can
        # return before device completion (docs/BENCHMARKS.md r5 finding #2);
        # a value fetch is the only reliable completion barrier. The ~20 ms
        # fetch round trip is part of a real interactive frame anyway.
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])

    def timeit(fn, *a, iters=args.iters):
        out = fn(*a)
        _force(out)
        tt = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            _force(out)
        return out, (time.perf_counter() - tt) / iters * 1e3

    # hierarchy arrays ride as jit ARGUMENTS: closed-over device arrays
    # become inline HLO constants, and at 2M nodes the ~470 MB attribute
    # constants overflow the tunneled chip's remote-compile request (HTTP
    # 413) — and would bloat any compile cache either way
    from hidegs_tpu.hier.lod import expand_packed, pack_hierarchy, tau_to_target_size

    # pack once per hierarchy (r5: gather-free select; see lod.PackedHier)
    packed = jax.block_until_ready(pack_hierarchy(nodes, boxes))

    # --taus are PIXEL granularities (reference convention); 0 = leaf cut
    cut_fn = jax.jit(
        lambda packed_, tau: expand_packed(
            packed_, tau, cam.camera_center, budget=budget, num_points=P
        )
    )
    to_target = lambda tpx: 0.0 if tpx == 0 else tau_to_target_size(tpx, float(cam.fx))
    interp_fn = jax.jit(lambda cut, *arrs: interpolate_cut(cut, *arrs))
    render_fn = jax.jit(
        lambda cut, *arrs: render_hierarchy(cut, *arrs, cam, config=rcfg)["render"]
    )

    # τ-AWARE adaptive path (VERDICT r3 item 3): budgets fit to the actual
    # cut, so latency must DECREASE with τ. Measured alongside the fixed-
    # budget path for the before/after record.
    from hidegs_tpu.hier.interp import AdaptiveHierRenderer

    adaptive = AdaptiveHierRenderer(
        nodes, boxes, *arrays, num_points=P, backend="pallas", tile=32,
    )

    rows = []
    for tau in args.taus:
        cut, cut_ms = timeit(cut_fn, packed, jnp.float32(to_target(tau)))
        n_cut = int(cut.valid.sum())
        _, interp_ms = timeit(interp_fn, cut, *arrays)
        img, render_ms = timeit(render_fn, cut, *arrays)
        _, adaptive_ms = timeit(
            lambda: adaptive.render(cam, tau)["render"]
        )
        rows.append({
            "tau": tau, "cut": n_cut, "cut_ms": round(cut_ms, 2),
            "interp_ms": round(interp_ms, 2), "render_ms": round(render_ms, 2),
            "adaptive_budget": adaptive._budget,
            "adaptive_render_ms": round(adaptive_ms, 2),
            "mean_px": round(float(jnp.mean(img)), 4),
        })
        print(f"tau={tau}: cut={n_cut} select={cut_ms:.2f}ms "
              f"interp={interp_ms:.2f}ms render={render_ms:.2f}ms "
              f"adaptive={adaptive_ms:.2f}ms (budget {adaptive._budget})",
              flush=True)

    out = {
        "leaves": P, "nodes": int(h.num_nodes), "budget": budget,
        "resolution": args.res, "sweep": rows,
        "build_seconds": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
