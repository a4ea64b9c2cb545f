"""Dense O(N·pixels) reference rasterizer — the forever-oracle for kernel tests.

Exactly the compositing semantics of the reference's tile kernel
(cuda_rasterizer/forward.cu:440-610) but with no tiling/culling: every
Gaussian is evaluated at every pixel, globally depth-sorted, composited
front-to-back with the same α-clamp (0.99), α-cut (1/255) and transmittance
stop (T < 1e-4) rules. Differentiable end-to-end by plain autodiff; intended
for small scenes / CPU (BASELINE config 1: ~10k gaussians, one 800x800 view).

The sequential per-pixel loop is replaced by the exact closed form
    T_i = exp(cumsum_excl(log(1 - α)))_i ,  w_i = T_i · α_i · [T_incl_i ≥ ε]
which is what the production paths (segmented blend / Pallas chunked matmul)
also compute — so agreement with this oracle validates them.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from hidegs_tpu.core.camera_math import CameraParams
from hidegs_tpu.core.ewa import gaussian_alpha
from hidegs_tpu.core.geometry import plane_depth_from_blend
from hidegs_tpu.raster.preprocess import PreprocessedGaussians

T_EPS = 1e-4  # transmittance stop (forward.cu:558-565)


def render_oracle(
    pre: PreprocessedGaussians,
    cam: CameraParams,
    background: Optional[jnp.ndarray] = None,
    render_geo: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Render all channels densely. Returns the reference output dict
    (gaussian_renderer/__init__.py:204-214 equivalents)."""
    H, W = cam.height, cam.width
    N = pre.mean2d.shape[0]
    if background is None:
        background = jnp.zeros(3, dtype=jnp.float32)

    # Global front-to-back order: depth-sort, invisible gaussians pushed last.
    sort_depth = jnp.where(pre.visible, pre.depth, jnp.inf)
    order = jnp.argsort(sort_depth)

    mean2d = pre.mean2d[order]
    conic = pre.conic[order]
    opacity = pre.opacity[order]
    rgb = pre.rgb[order]
    inv_depth = pre.inv_depth[order]
    normal = pre.normal[order]
    distance = pre.distance[order]
    visible = pre.visible[order]

    # pixel centers
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([u, v], axis=-1).reshape(-1, 2)  # (P, 2)

    # α matrix (N, P)
    alpha = gaussian_alpha(
        mean2d[:, None, :], conic[:, None, :], opacity[:, None], pix[None, :, :]
    )
    alpha = jnp.where(visible[:, None], alpha, 0.0)

    log_t = jnp.log1p(-alpha)  # log(1 - α); α ≤ 0.99 so safe
    cum_incl = jnp.cumsum(log_t, axis=0)
    T_incl = jnp.exp(cum_incl)
    T_excl = jnp.exp(cum_incl - log_t)
    w = T_excl * alpha * (T_incl >= T_EPS)  # (N, P) blend weights

    color = jnp.einsum("np,nc->pc", w, rgb)
    acc_alpha = w.sum(axis=0)  # all_map alpha channel = Σw
    invd = jnp.einsum("np,n->p", w, inv_depth)
    T_final = jnp.where(T_incl.shape[0] > 0, T_incl[-1], jnp.ones_like(acc_alpha))

    out = {}
    out["render"] = (
        color.T.reshape(3, H, W) + T_final.reshape(1, H, W) * background[:, None, None]
    )
    out["alpha"] = acc_alpha.reshape(H, W)
    out["invdepth"] = invd.reshape(H, W)
    out["T_final"] = T_final.reshape(H, W)
    # per-Gaussian observability: #pixels with a real contribution while the
    # pixel was still "fresh" (T > 0.5) — forward.cu:579-582.
    observe_sorted = ((w > 0) & (T_excl > 0.5)).sum(axis=1).astype(jnp.int32)
    out["out_observe"] = jnp.zeros(N, jnp.int32).at[order].set(observe_sorted)

    if render_geo:
        nrm = jnp.einsum("np,nc->pc", w, normal)
        dist = jnp.einsum("np,n->p", w, distance)
        all_map = jnp.concatenate(
            [nrm.T.reshape(3, H, W), acc_alpha.reshape(1, H, W), dist.reshape(1, H, W)],
            axis=0,
        )
        out["rendered_normal"] = all_map[:3]
        out["rendered_distance"] = all_map[4]
        out["all_map"] = all_map
        out["plane_depth"] = plane_depth_from_blend(all_map[4], jnp.moveaxis(all_map[:3], 0, -1), cam)
    return out
