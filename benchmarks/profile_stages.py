"""Per-stage timing of the fwd+bwd rasterization pipeline on the live device.

Times each pipeline stage as its own jitted function (steady-state, compile
excluded) to locate the glue costs around the Pallas kernels. Used to drive
the round-2 backward-glue optimization (docs/BENCHMARKS.md "Known remaining
hot spots").
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster import binning as B
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.raster.pallas_blend import (
    CHUNK,
    blend_tiles_pallas_fwd,
    pack_instance_attrs,
)
from hidegs_tpu.raster.pallas_vjp import blend_core, blend_tiles_pallas_bwd
from hidegs_tpu.raster.preprocess import preprocess_gaussians

N = 10_000
H = W = 800
MAXI = 1 << 18
ITERS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return out


def main():
    scene = make_toy_gaussians(N, seed=0)
    cam = ring_camera(0, height=H, width=W)
    cfg = RasterConfig(backend="pallas", max_instances=MAXI)
    target = jnp.zeros((3, H, W))
    means3d, scales, quats, opacities, shs = scene

    tiles_y, tiles_x = B.tile_grid(H, W)
    num_tiles = tiles_y * tiles_x

    # ---- stage functions (each jitted on its own)
    pre_fn = jax.jit(
        lambda m, s, q, o, c: preprocess_gaussians(m, s, q, o, c, cam)
    )
    bin_fn = jax.jit(
        lambda pre: B.bin_gaussians(pre, tiles_y, tiles_x, MAXI)
    )
    align_fn = jax.jit(
        lambda tb: B.align_binning(
            tb, N, num_tiles, CHUNK, MAXI + num_tiles * CHUNK
        )
    )
    pack_fn = jax.jit(
        lambda pre, ab: pack_instance_attrs(pre, ab.gauss_id, ab.gauss_id < N)
    )
    fwd_fn = jax.jit(
        lambda attrs, ab: blend_tiles_pallas_fwd(
            attrs, ab.tile_start, ab.tile_count, tiles_y, tiles_x, 16
        )
    )

    pre = timeit("preprocess fwd", pre_fn, means3d, scales, quats, opacities, shs)
    tb = timeit("binning (expand+sort+ranges)", bin_fn, pre)
    ab = timeit("align (chunk layout)", align_fn, tb)
    attrs = timeit("pack (attr gather)", pack_fn, pre, ab)
    tile_out = timeit("blend fwd kernel", fwd_fn, attrs, ab)

    # backward kernel alone (synthetic cotangents)
    g_tiles = jnp.ones_like(tile_out[0])
    gt = jnp.ones_like(tile_out[0])
    bwd_fn = jax.jit(
        lambda attrs, ab, g, gt: blend_tiles_pallas_bwd(
            attrs, ab.tile_start, ab.tile_count, g, gt, tiles_y, tiles_x, 16
        )
    )
    d_attrs = timeit("blend bwd kernel", bwd_fn, attrs, ab, g_tiles, gt)

    # pack VJP (the instance->gaussian gradient scatter)
    def pack_fwd(pre):
        return pack_instance_attrs(pre, ab.gauss_id, ab.gauss_id < N)

    d_attrs_ct = jnp.ones_like(attrs)

    @jax.jit
    def pack_vjp(pre, ct):
        _, f_vjp = jax.vjp(pack_fwd, pre)
        return f_vjp(ct)

    timeit("pack VJP (scatter to gaussians)", pack_vjp, pre, d_attrs_ct)

    # preprocess VJP alone
    def pre_loss(m, s, q, o, c):
        p = preprocess_gaussians(m, s, q, o, c, cam)
        return (
            jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.rgb)
            + jnp.sum(p.opacity) + jnp.sum(p.inv_depth) + jnp.sum(p.normal)
            + jnp.sum(p.distance)
        )

    pre_vjp = jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3, 4)))
    timeit("preprocess VJP", pre_vjp, means3d, scales, quats, opacities, shs)

    # blend core fwd+bwd through custom vjp
    def core_loss(attrs, ab):
        out, _ = blend_core(attrs, ab.tile_start, ab.tile_count, tiles_y, tiles_x, 16)
        return jnp.sum(out)

    core_vjp = jax.jit(jax.grad(core_loss))
    timeit("blend core fwd+bwd (custom vjp)", core_vjp, attrs, ab)

    # full render forward
    rend_fn = jax.jit(
        lambda m, s, q, o, c: render(m, s, q, o, c, cam, config=cfg)["render"]
    )
    timeit("full render fwd", rend_fn, means3d, scales, quats, opacities, shs)

    # full fwd+bwd (the bench workload)
    def loss_fn(m, s, q, o, c):
        out = render(m, s, q, o, c, cam, config=cfg)
        return jnp.mean(jnp.abs(out["render"] - target))

    full = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    timeit("FULL fwd+bwd", full, means3d, scales, quats, opacities, shs)


if __name__ == "__main__":
    main()
