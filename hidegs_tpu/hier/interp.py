"""Hierarchy render path: parent/child interpolation + skybox concat.

JAX equivalent of `render_post` with interp_python=True
(gaussian_renderer/__init__.py:217-324): attributes of each selected node are
lerped with its parent's by the smooth LOD weight t (rotation sign-aligned
first), the skybox tail is appended with t=1, and the LOD alpha correction
α ← t·α + (1−t)·(1−(1−α)^(1/kids)) (forward.cu:547-556) is applied to the
interpolated opacity. The result feeds the standard rasterizer; because this
is ordinary differentiable JAX, the reference's hand-written hierarchy
backward (parent gradient reassignment, backward.cu:459-495) falls out of
autodiff of these gathers/lerps.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hidegs_tpu.hier.lod import HierCut, hierarchy_opacity_correction


class InterpolatedGaussians(NamedTuple):
    means3d: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    shs: jnp.ndarray


def interpolate_cut(
    cut: HierCut,
    means3d: jnp.ndarray,  # (P, 3)
    scales: jnp.ndarray,  # (P, 3) ACTIVATED
    quats: jnp.ndarray,  # (P, 4)
    opacities: jnp.ndarray,  # (P,) ACTIVATED
    shs: jnp.ndarray,  # (P, 16, 3)
    skybox_count: int = 0,
) -> InterpolatedGaussians:
    """Build the (B [+ skybox],) rendering arrays for one LOD cut.

    Invalid budget slots get opacity 0 (render-culled). Skybox points are the
    LAST `skybox_count` gaussians (the reference keeps them at the tail,
    render_post:300-313).
    """
    P = means3d.shape[0]
    ri = jnp.minimum(cut.render_indices, P - 1)
    pi = jnp.minimum(cut.parent_indices, P - 1)
    t = cut.ts[:, None]

    # ONE wide row-gather per index set instead of five narrow per-field
    # gathers: a (P,3)/(P,4) gather uses 3-4 of 128 lanes and cost ~7 ms per
    # gather per 1M rows (the compact_visible finding, raster/preprocess.py);
    # concatenating the attributes first makes each gather 59 lanes wide.
    # The concat itself is one sequential HBM copy (~2 ms/2M rows) and XLA
    # hoists it out of the per-frame loop when the arrays are jit constants.
    sh_dim = shs.shape[1] * shs.shape[2]
    packed = jnp.concatenate(
        [means3d, scales, quats, opacities[:, None],
         shs.reshape(P, sh_dim)], axis=-1,
    )
    row_c = packed[ri]
    row_p = packed[pi]

    m = t * row_c[:, 0:3] + (1 - t) * row_p[:, 0:3]
    s = t * row_c[:, 3:6] + (1 - t) * row_p[:, 3:6]
    sh = (
        t[..., None] * row_c[:, 11:11 + sh_dim].reshape(-1, *shs.shape[1:])
        + (1 - t[..., None]) * row_p[:, 11:11 + sh_dim].reshape(-1, *shs.shape[1:])
    )

    rot_c = row_c[:, 6:10]
    rot_p = row_p[:, 6:10]
    sign = jnp.where(jnp.sum(rot_c * rot_p, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    q = t * rot_c + (1 - t) * rot_p * sign

    op = cut.ts * row_c[:, 10] + (1 - cut.ts) * row_p[:, 10]
    op = hierarchy_opacity_correction(op, cut.ts, cut.kids)
    op = jnp.where(cut.valid, op, 0.0)

    if skybox_count > 0:
        sky = slice(P - skybox_count, P)
        m = jnp.concatenate([m, means3d[sky]])
        s = jnp.concatenate([s, scales[sky]])
        q = jnp.concatenate([q, quats[sky]])
        sh = jnp.concatenate([sh, shs[sky]])
        op = jnp.concatenate([op, opacities[sky]])

    return InterpolatedGaussians(m, s, q, op, sh)


def render_coarse(
    nodes,
    boxes,
    means3d,
    scales,
    quats,
    opacities,
    shs,
    cam,
    coarse_target_size: float = 0.1,
    budget: int = 1 << 16,
    **kwargs,
):
    """Coarse render: a large-granularity LOD cut — the scaffold/coarse-opt
    path (render_coarse, gaussian_renderer/__init__.py:376-488) realized as
    the generic hierarchy render at a coarse target size."""
    import numpy as np

    from hidegs_tpu.hier.lod import expand_to_size

    vp = jnp.asarray(np.asarray(cam.camera_center))
    cut = expand_to_size(
        nodes, boxes, coarse_target_size, vp, budget=budget,
        num_points=int(means3d.shape[0]),
    )
    return render_hierarchy(cut, means3d, scales, quats, opacities, shs, cam, **kwargs)


def render_hierarchy(
    cut: HierCut,
    means3d,
    scales,
    quats,
    opacities,
    shs,
    cam,
    skybox_count: int = 0,
    background: Optional[jnp.ndarray] = None,
    render_geo: bool = False,
    config=None,
    active_sh_degree=3,
):
    """render_post equivalent: interpolate the cut, then the standard render."""
    from hidegs_tpu.raster.api import RasterConfig, render

    ig = interpolate_cut(cut, means3d, scales, quats, opacities, shs, skybox_count)
    return render(
        ig.means3d,
        ig.scales,
        ig.quats,
        ig.opacities,
        ig.shs,
        cam,
        background=background,
        active_sh_degree=active_sh_degree,
        render_geo=render_geo,
        config=config or RasterConfig(),
    )


@partial(
    jax.jit,
    static_argnames=(
        "budget", "num_points", "skybox_count", "config",
        "active_sh_degree", "render_geo",
    ),
)
def fused_lod_frame(
    packed,
    target_size,
    cam,
    means3d, scales, quats, opacities, shs,
    budget: int,
    num_points: int,
    skybox_count: int = 0,
    background=None,
    config=None,
    active_sh_degree: int = 3,
    render_geo: bool = False,
):
    """Cut select + interpolation + raster as ONE jit dispatch.

    On the tunneled chip every dispatch costs a ~20 ms host round trip, so
    the 2-dispatch frame (expand, then interp+render) pays ~40 ms of pure
    latency before any device work. The reference's interactive loop has the
    same shape — one CUDA graph launch per frame (render_hierarchy flow,
    runtime_switching.cu + forward.cu in a single stream)."""
    from hidegs_tpu.hier.lod import expand_packed

    cut = expand_packed(
        packed, target_size, cam.camera_center, budget=budget,
        num_points=num_points,
    )
    out = dict(
        render_hierarchy(
            cut, means3d, scales, quats, opacities, shs, cam,
            skybox_count=skybox_count, background=background,
            render_geo=render_geo, config=config,
            active_sh_degree=active_sh_degree,
        )
    )
    out["num_selected"] = cut.num_selected
    return out


class AdaptiveHierRenderer:
    """τ-aware hierarchy renderer: fits the cut/interp/raster budgets to the
    ACTUAL cut size per (viewpoint, τ) instead of riding worst-case buffers.

    The r3 LOD record (docs/lod_scale_r3_px.json) showed frame latency nearly
    independent of cut size (~320 ms at 1024² whether the cut was 1M or 12.6k
    gaussians) because every stream — cut selection, interpolation gathers,
    raster instance sort — was budget-padded to the leaf count. Here a
    count-only pass (`lod.cut_size`, one N-node reduction) sizes the budget
    first; quarter-octave rounding (`raster.api.round_budget`) plus +12%
    slack and shrink hysteresis keep the jit compile cache small while coarse
    cuts get proportionally small streams — the hierarchy's entire point
    (cheap coarse frames, runtime_switching.cu design).
    """

    def __init__(self, nodes, boxes, means3d, scales, quats, opacities, shs,
                 num_points: int, skybox_count: int = 0,
                 backend: str = "pallas", tile: int = 32,
                 slack: float = 1.12, shrink_factor: float = 0.5,
                 recount_frac: float = 0.01, recount_every: int = 60):
        import numpy as np
        import jax.numpy as jnp

        self.nodes = nodes
        self.boxes = boxes
        self.arrays = (means3d, scales, quats, opacities, shs)
        self.num_points = int(num_points)
        self.skybox_count = int(skybox_count)
        # frame-coherence: the per-frame `cut_size` count is an N-node pass
        # PLUS one host↔device round trip (~20 ms over a tunneled chip —
        # the τ-independent floor of the r4 adaptive frames). Consecutive
        # frames at the same τ from a nearby viewpoint have near-identical
        # cut sizes (the cut varies continuously with distance and the
        # budget carries `slack`), so the count is reused until the camera
        # moves `recount_frac`·scene-diagonal or `recount_every` frames
        # pass; a stale budget is caught exactly by the num_selected check
        # in render() (one fetch shared with the overflow counter).
        bx = np.asarray(boxes)
        diag = float(np.linalg.norm(bx[:, 1, :3].max(0) - bx[:, 0, :3].min(0)))
        self.recount_dist = recount_frac * max(diag, 1e-6)
        self.recount_every = int(recount_every)
        self._count_cache = None
        self._packed = None  # built lazily on first frame (pack_hierarchy)
        self.backend = backend
        self.tile = tile
        self.slack = slack
        self.shrink_factor = shrink_factor
        self._budget = 0

    def _fit_budget(self, n_cut: int) -> int:
        from hidegs_tpu.raster.api import round_budget

        want = round_budget(max(int(n_cut * self.slack), 1 << 10))
        if want > self._budget or want <= self._budget * self.shrink_factor:
            self._budget = want
        return min(self._budget, round_budget(self.num_points))

    def render(self, cam, tau_px: float, render_geo: bool = False,
               background=None, active_sh_degree: int = 3):
        """One frame at pixel granularity `tau_px` (0 = exact leaf cut)."""
        import numpy as np
        import jax.numpy as jnp

        from hidegs_tpu.hier.lod import (
            cut_size_packed, expand_packed, pack_hierarchy, tau_to_target_size,
        )
        from hidegs_tpu.raster.api import RasterConfig, round_budget

        import jax

        # pack once per hierarchy: the packed layout makes the per-frame
        # count pass gather-free and the expansion a single row gather
        if getattr(self, "_packed", None) is None:
            self._packed = jax.block_until_ready(
                pack_hierarchy(self.nodes, self.boxes)
            )

        vp_np = np.asarray(cam.camera_center)
        vp = jnp.asarray(vp_np)
        target = 0.0 if tau_px == 0 else tau_to_target_size(tau_px, float(cam.fx))

        # frame-coherent count reuse (see __init__): skip the count pass AND
        # its host↔device sync when the camera is near the last counted
        # viewpoint at the same τ
        c = self._count_cache
        if (
            c is not None
            and c["tau"] == tau_px
            and c["frames"] < self.recount_every
            and float(np.linalg.norm(vp_np - c["vp"])) <= self.recount_dist
        ):
            c["frames"] += 1
            n_cut = c["n_cut"]
        else:
            n_cut = int(cut_size_packed(self._packed, jnp.float32(target), vp))
            self._count_cache = {
                "tau": tau_px, "vp": vp_np, "frames": 0, "n_cut": n_cut
            }
        budget = self._fit_budget(n_cut)
        # instance budget: start at ~2 tile-instances per cut gaussian (the
        # measured post-cull density at LOD scales; mult=8 over-allocated
        # ~600 MB of instance streams at 1M-leaf cuts and OOMed the chip)
        # and regrow on overflow like the trainer.
        if not hasattr(self, "_max_inst"):
            self._max_inst = 0
        want = round_budget(max(2 * (budget + self.skybox_count), 1 << 14))
        if want > self._max_inst or want * 4 <= self._max_inst:
            self._max_inst = want
        cp = cam.cam_params() if hasattr(cam, "cam_params") else cam
        for _ in range(5):
            config = RasterConfig(
                backend=self.backend, tile=self.tile, depth_sort_bits=-1,
                max_instances=self._max_inst,
            )
            # select + interp + raster as ONE dispatch (fused_lod_frame):
            # each extra dispatch is a ~20 ms tunnel round trip
            out = fused_lod_frame(
                self._packed, jnp.float32(target), cp, *self.arrays,
                budget=budget, num_points=self.num_points,
                skybox_count=self.skybox_count, background=background,
                config=config, render_geo=render_geo,
                active_sh_degree=active_sh_degree,
            )
            # ONE fetch for all three counters — separate int() calls each
            # pay a full tunnel round trip (~20 ms on the axon backend)
            n_sel, overflow, n_inst = (
                int(x)
                for x in jax.device_get(
                    (out["num_selected"], out["overflow"], out["num_instances"])
                )
            )
            if n_sel > budget:
                # a stale cached count under-budgeted the cut — refresh the
                # cache from the true demand and re-expand
                self._count_cache = {
                    "tau": tau_px, "vp": vp_np, "frames": 0, "n_cut": n_sel
                }
                budget = self._fit_budget(n_sel)
                continue
            if overflow == 0:
                return out
            self._max_inst = round_budget(n_inst + 1)
        print(
            f"WARNING: AdaptiveHierRenderer gave up after 5 attempts "
            f"with overflow={overflow} cut={n_sel}/{budget} "
            f"(instance budget {self._max_inst}, demand {n_inst}) "
            f"— frame is missing content",
            flush=True,
        )
        return out
