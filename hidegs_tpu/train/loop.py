"""Training loop — the reconstruction of HiDeGS's absent train.py (SURVEY §3.3).

Every stage of the reference step is present, jitted end-to-end at static
shapes:
  render → photometric (1-λ)·L1 + λ·(1-SSIM) → depth L1 → frequency-spatial
  regularization → single-view normal consistency → [multi-view NCC/geo] →
  backward (autodiff) → masked sparse Adam → densification-stat update;
  periodic densify/prune and opacity reset run as separately-jitted
  static-shape ops from the host loop.

Weight schedules follow OptimizationParams (arguments/__init__.py:88-137):
depth 1.0→0.01 from iter 7000; single-view 0.015 and multi-view 0.15/0.03
activate at iter 7000; densify every 300 in [500, 15000]; opacity reset every
3000; SH degree +1 every 1000.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hidegs_tpu.core.camera_math import CameraParams
from hidegs_tpu.model.adam import AdamState, init_adam, masked_adam_update
from hidegs_tpu.model.densify import (
    DensifyConfig,
    add_densification_stats,
    densify_and_prune,
)
from hidegs_tpu.model.gaussians import GaussianState, oneup_sh_degree, reset_opacity
from hidegs_tpu.model.schedules import LRConfig, expon_lr, lr_tree
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.frequency import frequency_regularization
from hidegs_tpu.train.geometric import MultiViewBatch, multi_view_losses, single_view_normal_loss
from hidegs_tpu.train.losses import dssim_l1


@dataclass(frozen=True)
class TrainConfig:
    """Mirror of OptimizationParams (arguments/__init__.py:88-137) plus
    raster/static-shape settings."""

    iterations: int = 30_000
    lambda_dssim: float = 0.2
    lr: LRConfig = field(default_factory=LRConfig)
    # depth supervision (arguments/__init__.py:113-116)
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01
    depth_schedule_from: int = 7_000
    # geometry losses (arguments/__init__.py:118-135)
    single_view_weight: float = 0.015
    single_view_from: int = 7_000
    multi_view_ncc_weight: float = 0.15
    multi_view_geo_weight: float = 0.03
    multi_view_from: int = 7_000
    multi_view_sample_num: int = 4096
    multi_view_patch_half: int = 1
    multi_view_pixel_noise_th: float = 1.0
    # False (default) = render the source view inside the loss and backprop
    # through both views (PGSR recipe); True = precomputed stop-gradient
    # source depth (cheaper, but regressed quality in the r2 ablation)
    multi_view_detached_src: bool = False
    # frequency regularization (scripts/frequency_regularization.py:1579)
    lambda_freq: float = 0.001
    lambda_scale: float = 0.005
    freq_warmup: int = 1_000
    # densification (arguments/__init__.py:106-112)
    densify_from: int = 500
    densify_until: int = 15_000
    densify_interval: int = 300
    opacity_reset_interval: int = 3_000
    # no opacity resets after this iteration (0 = no backoff); see
    # OptimizationConfig.opacity_reset_until_iter
    opacity_reset_until: int = 0
    densify: DensifyConfig = field(default_factory=DensifyConfig)
    # SH warm-up
    sh_increase_interval: int = 1_000
    # chunk-AABB render cull (forward.cu:319-321): ((minx,miny,minz),
    # (maxx,maxy,maxz)) world box, or None. Static (hashable) tuple so it
    # rides the jitted step's cfg; protected rows (skybox/scaffold) exempt.
    chunk_box: Optional[tuple] = None
    raster: RasterConfig = field(default_factory=RasterConfig)


class TrainState(NamedTuple):
    gaussians: GaussianState
    opt: AdamState
    exposure: jnp.ndarray  # (num_images, 3, 4) per-image exposure matrices
    exposure_m: jnp.ndarray
    exposure_v: jnp.ndarray
    step: jnp.ndarray  # () int32
    rng: jax.Array


class ViewBatch(NamedTuple):
    """One training view. Arrays only (pytree-safe); optional members are
    `None` when the scene has no such data (static across the run)."""

    cam: CameraParams
    image: jnp.ndarray  # (3, H, W) gt
    image_idx: jnp.ndarray  # () int32 — exposure index
    invdepth: Optional[jnp.ndarray] = None  # (H, W) monodepth inverse depth
    depth_mask: Optional[jnp.ndarray] = None  # (H, W) reliability mask
    alpha_mask: Optional[jnp.ndarray] = None  # (H, W)
    multi_view: Optional[MultiViewBatch] = None


def init_train_state(
    gaussians: GaussianState, num_images: int, seed: int = 0
) -> TrainState:
    from hidegs_tpu.utils.buffers import fresh_zeros_like

    eye34 = jnp.zeros((3, 4)).at[:, :3].set(jnp.eye(3))
    exposure = jnp.tile(eye34[None], (max(num_images, 1), 1, 1))
    return TrainState(
        gaussians=gaussians,
        opt=init_adam(gaussians.params),
        exposure=exposure,
        exposure_m=fresh_zeros_like(exposure),
        exposure_v=fresh_zeros_like(exposure),
        step=jnp.int32(0),
        rng=jax.random.PRNGKey(seed),
    )


def apply_exposure(image: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """(3,H,W), (3,4) → exposure-corrected image (render:181-184)."""
    return jnp.einsum("ij,jhw->ihw", M[:, :3], image) + M[:, 3, None, None]


def depth_l1_weight(step, cfg: TrainConfig):
    t = jnp.clip(
        (jnp.asarray(step, jnp.float32) - cfg.depth_schedule_from)
        / max(cfg.iterations - cfg.depth_schedule_from, 1),
        0.0,
        1.0,
    )
    return jnp.exp(
        jnp.log(cfg.depth_l1_weight_init) * (1 - t) + jnp.log(cfg.depth_l1_weight_final) * t
    )


def compute_losses(
    gaussians: GaussianState,
    exposure: jnp.ndarray,
    batch: ViewBatch,
    step,
    rng,
    cfg: TrainConfig,
    mean2d_offset: jnp.ndarray,
    use_exposure: bool,
):
    """Full HiDeGS loss stack. Returns (total, aux dict)."""
    render_geo = cfg.single_view_weight > 0 or batch.multi_view is not None
    box_kw = {}
    if cfg.chunk_box is not None:
        box_kw = dict(
            boxmin=jnp.asarray(cfg.chunk_box[0], jnp.float32),
            boxmax=jnp.asarray(cfg.chunk_box[1], jnp.float32),
            box_exempt=gaussians.protected,
        )
    out = render(
        gaussians.params.xyz,
        gaussians.scales,
        gaussians.quats,
        gaussians.opacities,
        gaussians.shs_flat,
        batch.cam,
        active_sh_degree=gaussians.active_sh_degree,
        render_geo=render_geo,
        config=cfg.raster,
        mean2d_offset=mean2d_offset,
        **box_kw,
    )
    img = out["render"]
    if use_exposure:
        img = apply_exposure(img, exposure[batch.image_idx])
    img = jnp.clip(img, 0.0, 1.0)

    aux: Dict[str, jnp.ndarray] = {}
    gt = batch.image
    if batch.alpha_mask is not None:
        # masked scenes: exclude invalid pixels from the photometric terms
        # (reference multiplies the alpha mask into both images)
        img = img * batch.alpha_mask[None]
        gt = gt * batch.alpha_mask[None]
    photo = dssim_l1(img, gt, cfg.lambda_dssim)
    aux["photo"] = photo
    total = photo

    if batch.invdepth is not None:
        mask = batch.depth_mask if batch.depth_mask is not None else jnp.ones_like(batch.invdepth)
        dl1 = jnp.sum(jnp.abs(out["invdepth"] - batch.invdepth) * mask) / jnp.maximum(
            mask.sum(), 1.0
        )
        w = depth_l1_weight(step, cfg)
        total = total + w * dl1
        aux["depth_l1"] = dl1

    if cfg.lambda_freq > 0 or cfg.lambda_scale > 0:
        freq_loss, _, dbg = frequency_regularization(
            img,
            gt,
            gaussians.scales,
            out["visibility"],
            step,
            lambda_freq=cfg.lambda_freq,
            lambda_scale=cfg.lambda_scale,
            warmup_iterations=cfg.freq_warmup,
        )
        total = total + freq_loss
        aux["freq"] = freq_loss

    if render_geo and cfg.single_view_weight > 0:
        sv = single_view_normal_loss(
            out["rendered_normal"], out["depth_normal"], gt, out["alpha"]
        )
        w_sv = jnp.where(jnp.asarray(step) >= cfg.single_view_from, cfg.single_view_weight, 0.0)
        total = total + w_sv * sv
        aux["single_view"] = sv

    src_out = None
    if batch.multi_view is not None:
        mvb = batch.multi_view
        if mvb.src_plane_depth is None:
            # differentiable source (PGSR recipe): render the source view
            # inside the loss so BOTH views' geometry receives the multi-view
            # gradient — a frozen source depth drags the reference view
            # toward stale source errors (r2 ablation regression)
            src_out = render(
                gaussians.params.xyz,
                gaussians.scales,
                gaussians.quats,
                gaussians.opacities,
                gaussians.shs_flat,
                mvb.src_cam,
                active_sh_degree=gaussians.active_sh_degree,
                render_geo=True,
                config=cfg.raster,
                **box_kw,
            )
            mvb = mvb._replace(src_plane_depth=src_out["plane_depth"])
        ncc_l, geo_l = multi_view_losses(
            out["plane_depth"],
            out["rendered_normal"],
            jnp.mean(batch.image, axis=0),
            batch.cam,
            mvb,
            rng,
            num_samples=cfg.multi_view_sample_num,
            patch_half=cfg.multi_view_patch_half,
            pixel_noise_th=cfg.multi_view_pixel_noise_th,
        )
        w_mv = jnp.where(jnp.asarray(step) >= cfg.multi_view_from, 1.0, 0.0)
        total = total + w_mv * (
            cfg.multi_view_ncc_weight * ncc_l + cfg.multi_view_geo_weight * geo_l
        )
        aux["mv_ncc"] = ncc_l
        aux["mv_geo"] = geo_l

    aux["total"] = total
    aux["visibility"] = out["visibility"]
    aux["radii"] = out["radii"]
    # budget counters feed the trainer's grow/shrink loop. The differentiable
    # multi-view path renders the SOURCE view too — its demand must be folded
    # in, or a source viewpoint needing more instances than the budget is
    # silently truncated (corrupting the NCC/geo gradient) with no overflow
    # signal to trigger re-growth (advisor r3, medium).
    if src_out is not None:
        aux["overflow"] = out["overflow"] + src_out["overflow"]
        aux["block_overflow"] = out["block_overflow"] + src_out["block_overflow"]
        aux["num_instances"] = jnp.maximum(
            out["num_instances"], src_out["num_instances"]
        )
        aux["needed_blocks"] = jnp.maximum(
            out["needed_blocks"], src_out["needed_blocks"]
        )
        aux["visible_overflow"] = (
            out["visible_overflow"] + src_out["visible_overflow"]
        )
        aux["num_visible"] = jnp.maximum(
            out["num_visible"], src_out["num_visible"]
        )
    else:
        aux["overflow"] = out["overflow"]
        aux["block_overflow"] = out["block_overflow"]
        aux["num_instances"] = out["num_instances"]
        aux["needed_blocks"] = out["needed_blocks"]
        aux["visible_overflow"] = out["visible_overflow"]
        aux["num_visible"] = out["num_visible"]
    return total, aux


def _slice_rows(ts: TrainState, R: int) -> TrainState:
    """View of the first R gaussian rows (params/opt/stats); other fields
    pass through. Valid only when alive rows occupy the prefix [0, R) —
    maintained by `compact_gaussians` at densify cadence."""
    from hidegs_tpu.model.gaussians import GaussianParams

    g = ts.gaussians
    sl = lambda x: x[:R]
    slp = lambda p: GaussianParams(*(sl(leaf) for leaf in p))
    return ts._replace(
        gaussians=g._replace(
            params=slp(g.params),
            alive=sl(g.alive),
            grad_max=sl(g.grad_max),
            grad_abs_max=sl(g.grad_abs_max),
            max_radii2d=sl(g.max_radii2d),
            protected=sl(g.protected),
        ),
        opt=ts.opt._replace(m=slp(ts.opt.m), v=slp(ts.opt.v), step=sl(ts.opt.step)),
    )


def _unslice_rows(full: TrainState, view: TrainState) -> TrainState:
    """Write the view's updated prefix rows back into the full-capacity
    buffers (donated, so XLA updates in place). Scalar/TrainState-level
    fields come from the view (the step updated them)."""
    from hidegs_tpu.model.gaussians import GaussianParams

    def wb(f, v):
        return jax.lax.dynamic_update_slice(f, v, (0,) * f.ndim)

    def wbp(fp, vp):
        return GaussianParams(*(wb(f, v) for f, v in zip(fp, vp)))

    fg, vg = full.gaussians, view.gaussians
    return view._replace(
        gaussians=vg._replace(
            params=wbp(fg.params, vg.params),
            alive=wb(fg.alive, vg.alive),
            grad_max=wb(fg.grad_max, vg.grad_max),
            grad_abs_max=wb(fg.grad_abs_max, vg.grad_abs_max),
            max_radii2d=wb(fg.max_radii2d, vg.max_radii2d),
            protected=wb(fg.protected, vg.protected),
        ),
        opt=view.opt._replace(
            m=wbp(full.opt.m, view.opt.m),
            v=wbp(full.opt.v, view.opt.v),
            step=wb(full.opt.step, view.opt.step),
        ),
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "use_exposure", "row_budget"),
    donate_argnums=(0,),
)
def train_step(
    ts: TrainState,
    batch: ViewBatch,
    cfg: TrainConfig,
    use_exposure: bool = False,
    row_budget: int = 0,
):
    """One fully-jitted training iteration (render→loss→grad→sparse Adam→stats).

    `row_budget` (static): with 0 < R < capacity, the step runs on the
    prefix rows [0, R) only — every N-row stage (preprocess, pack, binning,
    Adam) scales with the LIVE gaussian count instead of the padded
    capacity. Requires the alive-prefix invariant (compact_gaussians)."""
    full_ts = None
    if 0 < row_budget < ts.gaussians.capacity:
        full_ts = ts
        ts = _slice_rows(ts, row_budget)
    rng, step_rng = jax.random.split(ts.rng)
    C = ts.gaussians.capacity
    zeros2d = jnp.zeros((C, 2), jnp.float32)

    def loss_fn(params, exposure, mean2d_offset):
        g = ts.gaussians._replace(params=params)
        return compute_losses(
            g, exposure, batch, ts.step, step_rng, cfg, mean2d_offset, use_exposure
        )

    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
        ts.gaussians.params, ts.exposure, zeros2d
    )
    param_grads, expo_grads, screen_grads = grads

    # Finite-step gate: ONE non-finite pixel in the loss poisons the
    # gradient of EVERY visible gaussian, and the masked Adam then writes
    # NaN into all of them in a single step (observed in the r4 analytic
    # run: 260k rows died between steps 12600 and 12700). A bad step is
    # skipped wholesale — params, moments, stats and exposure keep their
    # previous values; `step_ok` lands in metrics so the host can count.
    step_ok = jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(param_grads):
        step_ok = step_ok & jnp.isfinite(jnp.sum(leaf))
    aux["step_ok"] = step_ok.astype(jnp.float32)

    visible = aux["visibility"] & step_ok
    lrs = lr_tree(ts.step, cfg.lr, ts.gaussians.spatial_lr_scale)
    new_params, new_opt = masked_adam_update(
        ts.gaussians.params, param_grads, ts.opt, lrs, visible
    )

    g_state = ts.gaussians._replace(params=new_params)
    # match the reference's gradient units: the CUDA backward scales
    # dL/dmean2D by (0.5·W, 0.5·H) (backward.cu:604,754 ddelx_dx/ddely_dy),
    # and densify_grad_threshold=0.015 is calibrated for those units — raw
    # pixel-unit grads would be ~W/2 smaller and never trigger densification
    grad_scale = jnp.array(
        [0.5 * batch.cam.width, 0.5 * batch.cam.height], jnp.float32
    )
    g_state = add_densification_stats(
        g_state, screen_grads * grad_scale, visible, aux["radii"]
    )

    # exposure Adam (dense, tiny) — separate optimizer like the reference's
    # exposure_optimizer (gaussian_model.py:313-314)
    if use_exposure:
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = jnp.maximum(ts.step + 1, 1).astype(jnp.float32)
        m = b1 * ts.exposure_m + (1 - b1) * expo_grads
        v = b2 * ts.exposure_v + (1 - b2) * expo_grads**2
        lr_e = expon_lr(ts.step, cfg.lr.exposure_lr_init, cfg.lr.exposure_lr_final, cfg.iterations)
        new_expo = ts.exposure - lr_e * (m / (1 - b1**t)) / (
            jnp.sqrt(v / (1 - b2**t)) + eps
        )
        # finite-step gate (see above): skip the exposure update too
        m = jnp.where(step_ok, m, ts.exposure_m)
        v = jnp.where(step_ok, v, ts.exposure_v)
        new_expo = jnp.where(step_ok, new_expo, ts.exposure)
    else:
        m, v, new_expo = ts.exposure_m, ts.exposure_v, ts.exposure

    new_ts = TrainState(
        gaussians=g_state,
        opt=new_opt,
        exposure=new_expo,
        exposure_m=m,
        exposure_v=v,
        step=ts.step + 1,
        rng=rng,
    )
    if full_ts is not None:
        new_ts = _unslice_rows(full_ts, new_ts)
    metrics = {k: v for k, v in aux.items() if v.ndim == 0}
    return new_ts, metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def densify_step(ts: TrainState, scene_extent, cfg: TrainConfig):
    rng, drng = jax.random.split(ts.rng)
    g, opt, info = densify_and_prune(ts.gaussians, ts.opt, scene_extent, cfg.densify, drng)
    return ts._replace(gaussians=g, opt=opt, rng=rng), info


def maybe_host_side_schedule(
    ts: TrainState, cfg: TrainConfig, scene_extent: float, step: int = None
):
    """Host-loop schedule hooks: densify / opacity reset / SH warm-up.
    Called once per iteration with the *python int* step (post-increment).

    Pass `step` when the host already knows it (the loop counter): reading
    `int(ts.step)` blocks on the device every iteration, which on a
    high-latency link (tunneled chip, multi-pod dispatch) caps throughput at
    one round-trip per step — measured 0.24 s/step vs ~40 ms of compute on
    the r3 quality run."""
    step = int(ts.step) if step is None else step
    info = None
    if step % cfg.sh_increase_interval == 0:
        ts = ts._replace(gaussians=oneup_sh_degree(ts.gaussians))
    if step > cfg.densify_until and step % cfg.densify_interval == 0:
        # densify's non-finite scrub stops with the window, but rows can
        # still diverge afterwards (r4 analytic run: 139 rows between 15k
        # and 30k) — keep scrubbing at the same cadence so a late blow-up
        # is one dead row, not a corrupt checkpoint
        from hidegs_tpu.model.densify import scrub_nonfinite

        g, _n = scrub_nonfinite(ts.gaussians)
        ts = ts._replace(gaussians=g)
    if cfg.densify_from <= step <= cfg.densify_until:
        if step % cfg.densify_interval == 0:
            ts, info = densify_step(ts, scene_extent, cfg)
        if step % cfg.opacity_reset_interval == 0 and (
            cfg.opacity_reset_until <= 0 or step <= cfg.opacity_reset_until
        ):
            # clamp to 0.01 AND zero the opacity Adam moments, matching the
            # reference's replace_tensor_to_optimizer surgery
            # (gaussian_model.py:542-560) — see reset_opacity_moments
            from hidegs_tpu.model.adam import reset_opacity_moments

            ts = ts._replace(
                gaussians=reset_opacity(ts.gaussians),
                opt=reset_opacity_moments(ts.opt),
            )
    return ts, info
