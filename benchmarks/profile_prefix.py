"""Cumulative-prefix profiling of the render fwd(+bwd) pipeline at scale.

The r3 lesson (docs/BENCHMARKS.md "Measurement methodology warning"):
isolated per-stage jits mis-price ops by up to ~50x vs their in-graph cost —
fusion, launch overlap and materialization differ. This harness instead
times a NESTED sequence of jitted PREFIXES of the real pipeline
(P0 = preprocess, P1 = P0+pack, ..., P6 = full fwd+bwd); consecutive
differences give each stage's in-graph MARGINAL cost, fusion included.
Each prefix returns scalar reductions of every live intermediate so XLA
keeps the compute but skips full materialization of the outputs.

Usage: python benchmarks/profile_prefix.py --n 4000000 [--res 1920 1088]
Sweep: python benchmarks/profile_prefix.py --sweep 1000000 2000000 4000000 6000000
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def build(n, res):
    from hidegs_tpu.data.synthetic import make_uav_gaussians, nadir_grid_camera
    from hidegs_tpu.raster.api import round_budget

    scene = make_uav_gaussians(n_ground=n, n_structs=64, seed=0, extent_xy=30.0)
    W, H = res
    cam = nadir_grid_camera(0, 0, 1, 1, extent_xy=30.0, altitude=22.0,
                            height=H, width=W)
    return scene, cam


def ssum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves if hasattr(x, "dtype"))


def make_prefixes(scene, cam, max_instances, tile, max_blocks):
    from hidegs_tpu.raster import binning as B
    from hidegs_tpu.raster.api import RasterConfig, render
    from hidegs_tpu.raster.pallas_blend import (
        CHUNK,
        blend_tiles_pallas_fwd,
        expand_to_instances,
        pack_gaussian_matrix,
        window_tables,
    )
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    H, W = cam.height, cam.width
    tiles_y, tiles_x = B.tile_grid(H, W, tile)
    num_tiles = tiles_y * tiles_x
    cfg = RasterConfig(backend="pallas", tile=tile, max_instances=max_instances,
                       depth_sort_bits=-1, max_blocks=max_blocks)
    means3d, scales, quats, opacities, shs = scene

    def p0_preprocess(args):
        pre = preprocess_gaussians(*args, cam)
        return ssum(pre)

    def p1_pack(args):
        pre = preprocess_gaussians(*args, cam)
        packed = pack_gaussian_matrix(pre)
        return ssum(pre.radius) + ssum(packed)

    def p2_binning(args):
        pre = preprocess_gaussians(*args, cam)
        packed = pack_gaussian_matrix(pre)
        tb = B.bin_gaussians(pre, tiles_y, tiles_x, max_instances, tile,
                             depth_bits=-1)
        return ssum(packed) + ssum(tb)

    def p3_expand(args):
        pre = preprocess_gaussians(*args, cam)
        packed = pack_gaussian_matrix(pre)
        tb = B.bin_gaussians(pre, tiles_y, tiles_x, max_instances, tile,
                             depth_bits=-1)
        nb = max_blocks or (max_instances + num_tiles * CHUNK) // CHUNK
        tables = window_tables(tb.tile_start, tb.tile_count, nb, max_instances)
        attrs = expand_to_instances(packed, tb.gauss_id)
        return ssum(attrs) + ssum(tables)

    def p4_fwdkernel(args):
        pre = preprocess_gaussians(*args, cam)
        packed = pack_gaussian_matrix(pre)
        tb = B.bin_gaussians(pre, tiles_y, tiles_x, max_instances, tile,
                             depth_bits=-1)
        nb = max_blocks or (max_instances + num_tiles * CHUNK) // CHUNK
        tables = window_tables(tb.tile_start, tb.tile_count, nb, max_instances)
        attrs = expand_to_instances(packed, tb.gauss_id)
        out, obs = blend_tiles_pallas_fwd(
            attrs, tables, tiles_y, tiles_x, tile, nb,
            sentinel=packed.shape[0] - 1,
        )
        return ssum(out) + ssum(obs)

    def p5_fullfwd(args):
        out = render(*args, cam, config=cfg)
        return ssum(out["render"]) + ssum(out["invdepth"]) + ssum(out["alpha"])

    def p6_fwdbwd(args):
        def loss(a):
            out = render(*a, cam, config=cfg)
            return ssum(out["render"]) + ssum(out["invdepth"])

        val, grads = jax.value_and_grad(loss)(args)
        return val + ssum(grads)

    return [
        ("P0 preprocess", p0_preprocess),
        ("P1 +pack", p1_pack),
        ("P2 +binning", p2_binning),
        ("P3 +tables/expand", p3_expand),
        ("P4 +fwd kernel", p4_fwdkernel),
        ("P5 full fwd (api)", p5_fullfwd),
        ("P6 full fwd+bwd", p6_fwdbwd),
    ]


def run_one(n, res, iters, tile):
    from hidegs_tpu.raster.api import round_budget

    scene, cam = build(n, res)
    # budget fit like the trainer would: probe the demand once
    from hidegs_tpu.raster import binning as B
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    pre = preprocess_gaussians(*scene, cam)
    tiles_y, tiles_x = B.tile_grid(cam.height, cam.width, tile)
    tb = B.bin_gaussians(pre, tiles_y, tiles_x, 1 << 21, tile, depth_bits=-1)
    need = int(tb.num_instances)
    max_instances = round_budget(int(need * 1.12))
    from hidegs_tpu.raster.pallas_vjp import needed_blocks

    nb = int(needed_blocks(tb.tile_count))
    max_blocks = -(-int(nb * 1.12) // 256) * 256
    print(f"N={n}: instances={need} budget={max_instances} "
          f"blocks={nb} block_budget={max_blocks}")

    prefixes = make_prefixes(scene, cam, max_instances, tile, max_blocks)
    args = tuple(scene)
    rows = []
    prev = 0.0
    for name, fn in prefixes:
        jfn = jax.jit(fn)
        out = jfn(args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {name:22s} {dt:9.2f} ms   (marginal {dt - prev:+8.2f})")
        rows.append({"stage": name, "ms": round(dt, 2),
                     "marginal_ms": round(dt - prev, 2)})
        prev = dt
    mpix = cam.height * cam.width / 1e6
    print(f"  fwd+bwd throughput: {mpix / (prev / 1e3):.2f} Mpix/s")
    return {"n": n, "instances": need, "budget": max_instances,
            "blocks": nb, "rows": rows,
            "mpix_s": round(mpix / (prev / 1e3), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, nargs=2, default=[1920, 1088])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--sweep", type=int, nargs="*", default=None)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    ns = args.sweep if args.sweep else [args.n]
    import contextlib

    ctx = contextlib.nullcontext()
    if jax.devices()[0].platform == "cpu":  # smoke-test path
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        results = [run_one(n, args.res, args.iters, args.tile) for n in ns]
    if args.out:
        import json
        import os

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        json.dump(results, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
