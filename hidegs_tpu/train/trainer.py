"""Scene-level trainer — the `train.py` the reference never shipped,
reconstructed per SURVEY §3.3 and runnable as `python -m hidegs_tpu.train`.

Glue between the data layer (COLMAP scene, neighbor graph), the model layer
(padded gaussian state + skybox + KNN init) and the jitted train step. All
host-side: shuffled view order, multi-view source-depth rendering, periodic
densify/opacity-reset/SH schedules, checkpoints, metric logging.
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import os
import random
import time
import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    add_group,
    extract_group,
    save_cfg_args,
)
from hidegs_tpu.model.densify import DensifyConfig
from hidegs_tpu.model.gaussians import GaussianState, init_from_points, make_skybox
from hidegs_tpu.model.knn import initial_scales
from hidegs_tpu.model.schedules import LRConfig
from hidegs_tpu.raster.api import RasterConfig, render, suggest_max_instances
from hidegs_tpu.train.checkpoint import save_train_state
from hidegs_tpu.train.geometric import MultiViewBatch
from hidegs_tpu.train.loop import (
    TrainConfig,
    TrainState,
    ViewBatch,
    init_train_state,
    maybe_host_side_schedule,
    train_step,
)


def train_config_from_opt(opt: OptimizationConfig, pipe: PipelineConfig, n_init: int) -> TrainConfig:
    max_inst = pipe.max_instances or suggest_max_instances(n_init)
    return TrainConfig(
        iterations=opt.iterations,
        lambda_dssim=opt.lambda_dssim,
        lr=LRConfig(
            position_lr_init=opt.position_lr_init,
            position_lr_final=opt.position_lr_final,
            position_lr_delay_mult=opt.position_lr_delay_mult,
            position_lr_max_steps=opt.position_lr_max_steps,
            feature_lr=opt.feature_lr,
            opacity_lr=opt.opacity_lr,
            scaling_lr=opt.scaling_lr,
            rotation_lr=opt.rotation_lr,
            exposure_lr_init=opt.exposure_lr_init,
            exposure_lr_final=opt.exposure_lr_final,
        ),
        depth_l1_weight_init=opt.depth_l1_weight_init,
        depth_l1_weight_final=opt.depth_l1_weight_final,
        depth_schedule_from=opt.depth_from_iter,
        single_view_weight=opt.single_view_weight,
        single_view_from=opt.single_view_weight_from_iter,
        multi_view_ncc_weight=opt.multi_view_ncc_weight,
        multi_view_geo_weight=opt.multi_view_geo_weight,
        multi_view_from=opt.multi_view_weight_from_iter,
        multi_view_sample_num=min(opt.multi_view_sample_num, 16384),
        multi_view_patch_half=max(opt.multi_view_patch_size // 2, 1),
        multi_view_pixel_noise_th=opt.multi_view_pixel_noise_th,
        lambda_freq=opt.lambda_freq,
        lambda_scale=opt.lambda_scale,
        freq_warmup=opt.freq_warmup_iterations,
        densify_from=opt.densify_from_iter,
        densify_until=opt.densify_until_iter,
        densify_interval=opt.densification_interval,
        opacity_reset_interval=opt.opacity_reset_interval,
        opacity_reset_until=opt.opacity_reset_until_iter,
        densify=DensifyConfig(
            grad_threshold=opt.densify_grad_threshold,
            abs_grad_threshold=opt.densify_abs_grad_threshold,
            min_opacity=opt.min_opacity,
            percent_dense=opt.percent_dense,
            max_growth_frac=opt.densify_max_growth,
        ),
        raster=RasterConfig(backend=pipe.raster_backend, max_instances=max_inst,
                            antialias=pipe.antialiasing, tile=pipe.tile,
                            depth_sort_bits=pipe.depth_sort_bits),
    )


def load_scene_scaffold(model_cfg: ModelConfig):
    """Border scaffold for a chunk scene (gaussian_model.py:235-274): the
    annulus of a coarse/neighbor model around the chunk cell, loaded as raw
    params. None when model_cfg.scaffold_file is empty."""
    if not model_cfg.scaffold_file:
        return None
    from hidegs_tpu.utils.storage import load_scaffold

    center_f = os.path.join(model_cfg.source_path, "center.txt")
    extent_f = os.path.join(model_cfg.source_path, "extent.txt")
    center = np.loadtxt(center_f).reshape(-1)[:3]
    extent = np.loadtxt(extent_f).reshape(-1)[:3]
    return load_scaffold(model_cfg.scaffold_file, center, extent)


def init_gaussians_from_scene(
    scene, model_cfg: ModelConfig, capacity: int, scaffold=None
) -> GaussianState:
    pts = np.asarray(scene.info.points, np.float32)
    cols = np.asarray(scene.info.colors, np.float32)
    protected = None
    if scaffold is None:
        scaffold = load_scene_scaffold(model_cfg)
    if model_cfg.skybox_num > 0:
        sky_pts, sky_cols = make_skybox(
            model_cfg.skybox_num, scene.info.nerf_norm_center, scene.info.nerf_norm_radius
        )
        # skybox appended at the TAIL (reference keeps it addressable at the
        # end, render_post:300-305)
        pts = np.concatenate([pts, sky_pts])
        cols = np.concatenate([cols, sky_cols])
        protected = np.zeros(len(pts), bool)
        protected[-model_cfg.skybox_num:] = True
    knn = initial_scales(jnp.asarray(pts))
    state = init_from_points(
        jnp.asarray(pts),
        jnp.asarray(cols),
        capacity=capacity,
        spatial_lr_scale=scene.info.nerf_norm_radius,
        knn_scale=knn,
        protected_mask=jnp.asarray(protected) if protected is not None else None,
    )
    if scaffold is not None:
        from hidegs_tpu.model.gaussians import prepend_raw_points

        state = prepend_raw_points(state, scaffold, protected=True)
    return state


# budget counters are fetched once per this many steps (one device sync per
# window keeps the dispatch pipeline deep on high-latency links)
OVERFLOW_CHECK_EVERY = 8
# active-row budget headroom: train-step prefix sized to n_alive·(1+this),
# rounded to the next power of two (octave granularity keeps recompiles to
# ~log2(growth) over a whole run)
ROW_BUDGET_SLACK = 0.05


def fit_row_budget(n_alive: int, capacity: int) -> int:
    """Octave-rounded active-row budget for the sliced train step."""
    want = max(int(n_alive * (1.0 + ROW_BUDGET_SLACK)), 1 << 12)
    return min(1 << (want - 1).bit_length(), capacity)
# consecutive clean steps before a downward budget re-fit is considered
SHRINK_WINDOW = 200
# only shrink when the re-fitted budget is at most this fraction of the
# current one (hysteresis against grow/shrink oscillation)
SHRINK_FACTOR = 0.7


# compaction pays only past this row count: the construction (cumsum +
# scatter + packed gather, ~5 N-row passes) costs about what it saves from
# binning below it. Measured crossover on v5e (chained-dependency timing,
# 18% visible, fwd+bwd): 1M rows 133→146 ms (LOSS), 4M rows 389→339 ms
# (−13% WIN). docs/BENCHMARKS.md r5.
COMPACTION_MIN_ROWS = 2_000_000


def _fit_visible_budget(peak_visible: int, row_budget: int) -> int:
    """Visible-row compaction budget from an observed per-view peak: +25%
    slack (new splats grow into their footprint between windows), quarter-
    octave rounded. Returns 0 (compaction off) when the fit wouldn't beat
    simply running on the full row prefix — the compaction itself costs
    ~5 N-row passes, so it needs both a size margin and enough rows for the
    N-row savings to exceed the construction (COMPACTION_MIN_ROWS)."""
    from hidegs_tpu.raster.api import round_budget

    if peak_visible <= 0 or row_budget < COMPACTION_MIN_ROWS:
        return 0
    fit = round_budget(int(peak_visible * 1.25))
    if fit >= row_budget * SHRINK_FACTOR:
        return 0
    return fit


def _maybe_shrink_budgets(
    cfg: TrainConfig, win_max_inst: int, win_max_blocks: int, it: int,
    win_max_visible: int = 0, row_budget: int = 0,
):
    """Re-fit budgets to the window's peak demand (+12% slack, same policy as
    the initial fit). Returns (cfg, shrunk?)."""
    from hidegs_tpu.raster.api import round_budget

    shrunk = False
    if win_max_visible > 0 and cfg.raster.max_visible:
        fit_v = _fit_visible_budget(win_max_visible, row_budget or (1 << 62))
        if fit_v and fit_v <= cfg.raster.max_visible * SHRINK_FACTOR:
            print(
                f"  shrinking max_visible {cfg.raster.max_visible} → {fit_v} "
                f"(peak visible {win_max_visible})",
                flush=True,
            )
            cfg = dataclasses.replace(
                cfg, raster=dataclasses.replace(cfg.raster, max_visible=fit_v)
            )
            shrunk = True
    if win_max_inst > 0:
        fit = round_budget(int(win_max_inst * 1.12))
        if fit <= cfg.raster.max_instances * SHRINK_FACTOR:
            print(
                f"  budgets idle for {SHRINK_WINDOW} steps — shrinking "
                f"max_instances {cfg.raster.max_instances} → {fit} "
                f"(peak demand {win_max_inst})",
                flush=True,
            )
            cfg = dataclasses.replace(
                cfg, raster=dataclasses.replace(cfg.raster, max_instances=fit)
            )
            shrunk = True
    if win_max_blocks > 0 and cfg.raster.max_blocks:
        fit_b = -(-int(win_max_blocks * 1.12) // 256) * 256
        if fit_b <= cfg.raster.max_blocks * SHRINK_FACTOR:
            print(
                f"  shrinking max_blocks {cfg.raster.max_blocks} → {fit_b} "
                f"(peak demand {win_max_blocks})",
                flush=True,
            )
            cfg = dataclasses.replace(
                cfg, raster=dataclasses.replace(cfg.raster, max_blocks=fit_b)
            )
            shrunk = True
    return cfg, shrunk


# Device-side view cache: bounded LRU keyed by camera identity.
#
# Caching fixes the tunneled-TPU host-RSS leak (~6.5 MB/step of transfer
# buffers never released — the r4 analytic 30k run grew to ~60 GB and was
# OOM-killed at iteration 24400) and removes a per-step host→device transfer.
# But an UNBOUNDED per-camera cache grows HBM with dataset size (thousands of
# full-res views ≈ tens of GB — ADVICE r4 medium), so the cache is LRU with a
# byte budget: small scenes stay fully resident (leak fix intact), large
# scenes churn the oldest views. Budget via HIDEGS_VIEW_CACHE_MB (default
# 4096 MB ≈ 500+ views at 512²).
_VIEW_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_VIEW_CACHE_BYTES = [0]


def _view_cache_budget() -> int:
    return int(os.environ.get("HIDEGS_VIEW_CACHE_MB", "4096")) * (1 << 20)


def _entry_nbytes(dev: dict) -> int:
    n = 0
    for v in dev.values():
        if hasattr(v, "nbytes"):
            n += v.nbytes
    return n


def _view_cache_put(key, dev):
    _VIEW_CACHE[key] = dev
    _VIEW_CACHE_BYTES[0] += _entry_nbytes(dev)
    budget = _view_cache_budget()
    while _VIEW_CACHE_BYTES[0] > budget and len(_VIEW_CACHE) > 1:
        _, old = _VIEW_CACHE.popitem(last=False)
        _VIEW_CACHE_BYTES[0] -= _entry_nbytes(old)


def _camera_device_arrays(cam):
    """Per-camera device arrays from the bounded LRU cache (see above)."""
    key = id(cam)
    dev = _VIEW_CACHE.get(key)
    if dev is not None:
        _VIEW_CACHE.move_to_end(key)
        return dev
    use_depth = cam.invdepth is not None and cam.depth_reliable
    depth_mask = None
    invdepth = None
    if use_depth:
        # DELIBERATE DEVIATION from the reference mask (scene/cameras.py:
        # 110-117 uses alpha_mask-or-ones): we additionally require
        # invdepth > 0 per pixel, supervising only where monodepth produced
        # a valid sample — the per-image depth_reliable flag alone would let
        # zero-filled holes pull depth toward infinity (ADVICE r4 low;
        # verified on the terrain runs, docs/BENCHMARKS.md)
        dm = np.asarray(cam.invdepth) > 0
        if cam.alpha_mask is not None:
            dm = dm & (np.asarray(cam.alpha_mask) > 0.5)
        depth_mask = jnp.asarray(dm, jnp.float32)
        invdepth = jnp.asarray(cam.invdepth)
    dev = {
        "cam": cam.cam_params(),
        "image": jnp.asarray(cam.image),
        "invdepth": invdepth,
        "depth_mask": depth_mask,
        "alpha_mask": (
            jnp.asarray(cam.alpha_mask) if cam.alpha_mask is not None else None
        ),
        "gray": None,  # filled lazily (source views only)
    }
    _view_cache_put(key, dev)
    return dev


def build_view_batch(cam, idx: int, cfg: TrainConfig, src_cam=None, src_depth=None):
    mv = None
    if src_cam is not None:
        # src_depth=None → the jitted loss renders the source view itself and
        # backprops through both views (MultiViewBatch docstring)
        sdev = _camera_device_arrays(src_cam)
        if sdev["gray"] is None:
            sdev["gray"] = jnp.asarray(src_cam.grayscale())
            _VIEW_CACHE_BYTES[0] += sdev["gray"].nbytes
        mv = MultiViewBatch(
            src_image_gray=sdev["gray"],
            src_plane_depth=src_depth,
            src_cam=sdev["cam"],
        )
    dev = _camera_device_arrays(cam)
    return ViewBatch(
        cam=dev["cam"],
        image=dev["image"],
        image_idx=jnp.int32(idx),
        invdepth=dev["invdepth"],
        depth_mask=dev["depth_mask"],
        alpha_mask=dev["alpha_mask"],
        multi_view=mv,
    )


def render_plane_depth(ts: TrainState, cam_params, cfg: TrainConfig):
    g = ts.gaussians
    out = render(
        jax.lax.stop_gradient(g.params.xyz),
        g.scales,
        g.quats,
        g.opacities,
        g.shs_flat,
        cam_params,
        active_sh_degree=g.active_sh_degree,
        render_geo=True,
        config=cfg.raster,
    )
    return jax.lax.stop_gradient(out["plane_depth"])


def save_frequency_panel(ts: TrainState, cam, cfg: TrainConfig, model_path: str, it: int):
    """Dump the 2x2 frequency-regularization debug panel for the current view
    (render / gt / high-freq mask / gt log-FFT). Matches the reference's
    save_visualizations hook (frequency_regularization.py:1446-1577), which
    writes panels every 1000 iterations while the freq loss is active. The
    view is re-rendered outside the jitted step — cheap at the dump cadence."""
    from hidegs_tpu.train.frequency import high_frequency_mask, save_debug_panel

    g = ts.gaussians
    out = render(
        jax.lax.stop_gradient(g.params.xyz),
        g.scales,
        g.quats,
        g.opacities,
        g.shs_flat,
        cam.cam_params(),
        active_sh_degree=g.active_sh_degree,
        config=cfg.raster,
    )
    gt = jnp.asarray(cam.image)
    mask = high_frequency_mask(gt)
    save_debug_panel(
        jnp.clip(out["render"], 0.0, 1.0),
        gt,
        mask,
        os.path.join(model_path, "freq_debug"),
        it,
        camera_name=os.path.splitext(cam.info.image_name)[0] if cam.info.image_name else "",
    )


def train(
    model_cfg: ModelConfig,
    pipe_cfg: PipelineConfig,
    opt_cfg: OptimizationConfig,
    save_iterations=(7_000, 30_000),
    log_every: int = 100,
    scene=None,
    seed: int = 0,
):
    """Full training run. Returns the final TrainState."""
    if scene is None:
        from hidegs_tpu.data.scene import load_scene

        scene = load_scene(
            model_cfg.source_path,
            images=model_cfg.images,
            depths=model_cfg.depths,
            eval_split=model_cfg.eval,
            resolution=model_cfg.resolution,
            multi_view_num=model_cfg.multi_view_num,
            multi_view_max_angle=model_cfg.multi_view_max_angle,
            multi_view_min_dis=model_cfg.multi_view_min_dis,
            multi_view_max_dis=model_cfg.multi_view_max_dis,
            cache_all=lambda info: _cache_images(model_cfg, info),
        )
    n_views = len(scene.train_cameras)
    assert n_views > 0, "no training cameras"

    scaffold = load_scene_scaffold(model_cfg)
    n_scaffold = 0 if scaffold is None else len(scaffold["xyz"])
    if model_cfg.scaffold_file:
        print(f"scaffold: {n_scaffold} border rows from "
              f"{model_cfg.scaffold_file}", flush=True)
    # capacity must hold the frozen scaffold rows too (prepend_raw_points
    # raises when the dead tail can't fit them); scaffold rows never grow,
    # so they add 1x, not 4x
    n_init = len(scene.info.points) + model_cfg.skybox_num
    capacity = pipe_cfg.capacity or min(
        max(
            1 << int(np.ceil(np.log2(max(4 * n_init + n_scaffold, 1 << 14)))),
            1 << 14,
        ),
        opt_cfg.max_all_points,
    )
    if pipe_cfg.capacity and n_scaffold:
        need = int(1.5 * n_init) + n_scaffold
        if capacity < need:
            capacity = 1 << int(np.ceil(np.log2(need)))
            print(
                f"capacity raised to {capacity} to hold the {n_scaffold}-row "
                "scaffold",
                flush=True,
            )
    cfg = train_config_from_opt(opt_cfg, pipe_cfg, n_init)
    if getattr(pipe_cfg, "chunk_box_cull", False):
        center_f = os.path.join(model_cfg.source_path, "center.txt")
        extent_f = os.path.join(model_cfg.source_path, "extent.txt")
        if os.path.exists(center_f) and os.path.exists(extent_f):
            # chunk-AABB render cull (forward.cu:319-321): the training box
            # is the chunk cell with 1.5x slack (out-of-cell content near
            # the border still participates, matching the chunker's far-
            # camera padding), protected rows exempt. XY ONLY: chunk cells
            # are gridded over CAMERA centers (chunking.compute_chunks), so
            # their z-extent is a thin slab at flight altitude — a 3D box
            # excludes the ground content entirely (the same lesson the r3
            # merge cull learned, hier/merge.py XY-only note; the first r4
            # largescene run trained every chunk against empty renders).
            c = np.loadtxt(center_f).reshape(-1)[:3]
            e = np.loadtxt(extent_f).reshape(-1)[:3] * 1.5
            lo = c - e / 2
            hi = c + e / 2
            lo[2], hi[2] = -1e9, 1e9
            cfg = dataclasses.replace(
                cfg,
                chunk_box=(
                    tuple(float(v) for v in lo),
                    tuple(float(v) for v in hi),
                ),
            )
            print(f"chunk box cull: {cfg.chunk_box}", flush=True)
    if cfg.raster.backend == "pallas":
        # initial block budget: half the worst case (the tile-intersection
        # cull typically drops ≥40% of rect instances); block_overflow
        # triggers ×2 re-budgeting below, capped at the worst case
        from hidegs_tpu.raster.binning import tile_grid
        from hidegs_tpu.raster.pallas_blend import CHUNK

        num_tiles = max(
            tile_grid(c.height, c.width, pipe_cfg.tile)[0]
            * tile_grid(c.height, c.width, pipe_cfg.tile)[1]
            for c in scene.train_cameras
        )
        worst = cfg.raster.max_instances // CHUNK + num_tiles
        blocks0 = min(-(-worst // 2 // 256) * 256, worst)
        cfg = dataclasses.replace(
            cfg, raster=dataclasses.replace(cfg.raster, max_blocks=blocks0)
        )
    state = init_gaussians_from_scene(scene, model_cfg, capacity, scaffold=scaffold)
    ts = init_train_state(state, num_images=n_views, seed=seed)
    # active-row budget: the train step runs on the alive prefix only (rows
    # beyond it are dead padding; compact_gaussians restores the prefix
    # invariant after every densify). Makes the N-row stages scale with the
    # live model, not the 4x-padded capacity (VERDICT r3 weak #2).
    # Compact once up front: a scaffold (prepend_raw_points) lands in the
    # LAST dead slots, outside the initial-cloud prefix — slicing without
    # compaction would drop the scaffold from rendering AND from the
    # chunk-box-cull exemption until the first densify event.
    from hidegs_tpu.model.gaussians import compact_gaussians

    g0, opt0 = compact_gaussians(ts.gaussians, ts.opt)
    ts = ts._replace(gaussians=g0, opt=opt0)
    row_budget = fit_row_budget(int(ts.gaussians.alive.sum()), capacity)

    # auto-resume from the latest iteration_* checkpoint (Scene(load_iteration=-1)
    # semantics, utils/system_utils.py:25-27) — pod-preemption recovery
    start_iter = 1
    if model_cfg.model_path:
        from hidegs_tpu.train.checkpoint import find_latest_iteration, load_train_state

        ckpt_root = os.path.join(model_cfg.model_path, "point_cloud")
        latest = find_latest_iteration(ckpt_root)
        if latest is not None and latest < cfg.iterations:
            try:
                ts, latest = load_train_state(ts, ckpt_root, latest)
                start_iter = latest + 1
                print(f"resumed from iteration {latest}", flush=True)
                # restore the alive-prefix invariant (a checkpoint may hold
                # prune holes from after its last compaction)
                from hidegs_tpu.model.gaussians import compact_gaussians

                g, opt = compact_gaussians(ts.gaussians, ts.opt)
                ts = ts._replace(gaussians=g, opt=opt)
                row_budget = fit_row_budget(int(g.alive.sum()), capacity)
            except (ValueError, KeyError) as e:
                print(f"resume failed ({e}); training from scratch", flush=True)

    if model_cfg.model_path:
        save_cfg_args(model_cfg.model_path, model_cfg, pipe_cfg, opt_cfg)
        scene.save_multi_view_json(os.path.join(model_cfg.model_path, "multi_view.json"))
        from hidegs_tpu.data.scene import save_scene_artifacts

        save_scene_artifacts(scene, model_cfg.model_path)

    rng = random.Random(seed)
    order = []
    t0 = time.time()
    use_mv = cfg.multi_view_ncc_weight > 0 and scene.neighbors
    # budget-overflow bookkeeping: counters from step it are inspected at
    # step it+1 (a single-step lag keeps dispatch async instead of syncing on
    # every step's metrics) — formerly only every log_every steps, which let
    # overflow silently drop contributions for up to 99 steps.
    # Budgets also SHRINK: after SHRINK_WINDOW consecutive clean steps whose
    # peak demand fits well below the current budget, re-fit downward — so a
    # densify-driven transient that doubled the sort/fold streams doesn't
    # stay doubled for the rest of a 6M-scale run (VERDICT r2 weak #7).
    # Counters are fetched in WINDOWS of OVERFLOW_CHECK_EVERY steps with one
    # device_get per window — a per-step int() sync caps throughput at one
    # link round-trip per step (measured 0.24 s/step vs ~40 ms compute on
    # the tunneled chip; the same math applies to real pod dispatch). An
    # overflow can therefore drop contributions for up to
    # OVERFLOW_CHECK_EVERY-1 extra steps before the re-budget lands.
    pending_overflow = []
    total_dropped_inst = 0
    total_dropped_blocks = 0
    total_skipped_steps = 0
    clean_steps = 0
    win_max_inst = 0
    win_max_blocks = 0
    win_max_visible = 0
    last_schedule_event = 0  # last densify/opacity-reset step (shrink cooldown)
    budget_log = [(start_iter, cfg.raster.max_instances, cfg.raster.max_blocks)]
    for it in range(start_iter, cfg.iterations + 1):
        if len(pending_overflow) >= OVERFLOW_CHECK_EVERY:
            vals = [
                tuple(int(x) for x in row)
                for row in jax.device_get(pending_overflow)
            ]
            pending_overflow = []
            ov = sum(v[0] for v in vals)
            bov = sum(v[1] for v in vals)
            bad = sum(1 for v in vals if len(v) > 4 and v[4] == 0)
            if bad:
                total_skipped_steps += bad
                print(f"  {bad} non-finite steps skipped in window ending @{it}",
                      flush=True)
            v_ov = sum(v[5] for v in vals if len(v) > 6)
            v_peak = max([0] + [v[6] for v in vals if len(v) > 6])
            changed = False
            if v_ov > 0:
                # visible-row compaction overflow DROPS model rows from the
                # render — grow immediately (2x, capped at the row prefix,
                # where render() auto-disables compaction)
                new_vb = min(cfg.raster.max_visible * 2, row_budget)
                print(
                    f"  visible budget overflow ({v_ov} rows) — growing "
                    f"max_visible {cfg.raster.max_visible} → {new_vb}",
                    flush=True,
                )
                cfg = dataclasses.replace(
                    cfg, raster=dataclasses.replace(cfg.raster, max_visible=new_vb)
                )
                changed = True
            elif (
                cfg.raster.max_visible == 0
                and v_peak > 0
                and getattr(pipe_cfg, "visible_compaction", True)
            ):
                # first demand observation: enable compaction if it pays
                fit = _fit_visible_budget(v_peak, row_budget)
                if fit:
                    print(
                        f"  enabling visible-row compaction: max_visible={fit} "
                        f"(peak visible {v_peak} of {row_budget} rows)",
                        flush=True,
                    )
                    cfg = dataclasses.replace(
                        cfg, raster=dataclasses.replace(cfg.raster, max_visible=fit)
                    )
                    changed = True
            if ov > 0:
                total_dropped_inst += ov
                new_budget = cfg.raster.max_instances * 2
                print(
                    f"  instance budget overflow ({ov} dropped) — "
                    f"growing max_instances {cfg.raster.max_instances} → {new_budget}",
                    flush=True,
                )
                cfg = dataclasses.replace(
                    cfg, raster=dataclasses.replace(cfg.raster, max_instances=new_budget)
                )
                changed = True
            if bov > 0 and cfg.raster.max_blocks:
                total_dropped_blocks += bov
                new_blocks = cfg.raster.max_blocks * 2
                print(
                    f"  block budget overflow ({bov} blocks) — "
                    f"growing max_blocks {cfg.raster.max_blocks} → {new_blocks}",
                    flush=True,
                )
                cfg = dataclasses.replace(
                    cfg, raster=dataclasses.replace(cfg.raster, max_blocks=new_blocks)
                )
                changed = True
            if changed:
                clean_steps = win_max_inst = win_max_blocks = win_max_visible = 0
                budget_log.append(
                    (it, cfg.raster.max_instances, cfg.raster.max_blocks)
                )
            else:
                clean_steps += len(vals)
                win_max_inst = max([win_max_inst] + [v[2] for v in vals])
                win_max_blocks = max([win_max_blocks] + [v[3] for v in vals])
                win_max_visible = max(
                    [win_max_visible] + [v[6] for v in vals if len(v) > 6]
                )
                # no shrinking near schedule events: during densification
                # demand rises monotonically, and for ~2 windows after the
                # last densify/reset the new splats are still growing into
                # their final screen footprint — a shrink there is soon
                # followed by an overflow re-grow, and each flip is a
                # recompile (~minutes on a tunneled chip). Observed live in
                # the r3 largescene run: 16384→...→57344, and again
                # 524288→57344→114688 when gating only on the densify window.
                settled = (it - last_schedule_event) >= 2 * SHRINK_WINDOW
                if clean_steps >= SHRINK_WINDOW and settled:
                    cfg, shrunk = _maybe_shrink_budgets(
                        cfg, win_max_inst, win_max_blocks, it,
                        win_max_visible=win_max_visible, row_budget=row_budget,
                    )
                    clean_steps = win_max_inst = win_max_blocks = win_max_visible = 0
                    if shrunk:
                        budget_log.append(
                            (it, cfg.raster.max_instances, cfg.raster.max_blocks)
                        )
        if not order:
            order = list(range(n_views))
            rng.shuffle(order)
        vi = order.pop()
        cam = scene.train_cameras[vi]

        src_cam = src_depth = None
        if use_mv and it >= cfg.multi_view_from and scene.neighbors.get(vi):
            si = rng.choice(scene.neighbors[vi])
            src_cam = scene.train_cameras[si]
            if cfg.multi_view_detached_src:
                src_depth = render_plane_depth(ts, src_cam.cam_params(), cfg)

        batch = build_view_batch(cam, vi, cfg, src_cam, src_depth)
        ts, metrics = train_step(
            ts, batch, cfg, use_exposure=opt_cfg.use_exposure,
            row_budget=row_budget,
        )
        if model_cfg.model_path and it in save_iterations:
            # save BEFORE the schedule hook: an opacity reset landing on the
            # same iteration otherwise leaves a freshly-clamped (near-
            # transparent) model in the checkpoint — the analytic r4
            # iteration_15000 evaluated at 8.5 dB while training loss was
            # 0.2 for exactly this reason (15000 % 3000 == 0)
            d = save_train_state(
                ts, os.path.join(model_cfg.model_path, "point_cloud"), it
            )
            print(f"saved checkpoint → {d}", flush=True)
        pending_overflow.append((
            metrics.get("overflow", 0),
            metrics.get("block_overflow", 0),
            metrics.get("num_instances", 0),
            metrics.get("needed_blocks", 0),
            metrics.get("step_ok", 1),
            metrics.get("visible_overflow", 0),
            metrics.get("num_visible", 0),
        ))
        # step passed explicitly: int(ts.step) would sync on the device every
        # iteration (see maybe_host_side_schedule docstring)
        ts, dens_info = maybe_host_side_schedule(
            ts, cfg, scene_extent=scene.extent, step=it
        )
        if dens_info is not None or (
            cfg.densify_from <= it <= cfg.densify_until
            and it % cfg.opacity_reset_interval == 0
            and (cfg.opacity_reset_until <= 0 or it <= cfg.opacity_reset_until)
        ):
            last_schedule_event = it
        if dens_info is not None:
            # restore the alive-prefix invariant (densify fills the lowest
            # dead slots, but prune leaves holes) and re-fit the active-row
            # budget to the new alive count
            from hidegs_tpu.model.gaussians import compact_gaussians

            g, opt = compact_gaussians(ts.gaussians, ts.opt)
            ts = ts._replace(gaussians=g, opt=opt)
            new_rb = fit_row_budget(int(dens_info["n_alive"]), capacity)
            if new_rb != row_budget:
                print(
                    f"  row budget {row_budget} → {new_rb} "
                    f"(alive {int(dens_info['n_alive'])})",
                    flush=True,
                )
                # scale the visible-compaction budget with the row growth so
                # the freshly-densified rows don't overflow it for the 8-step
                # counter lag (overflow here drops rows from the RENDER)
                if cfg.raster.max_visible and new_rb > row_budget:
                    from hidegs_tpu.raster.api import round_budget

                    grown = min(
                        round_budget(
                            int(cfg.raster.max_visible * new_rb / row_budget)
                        ),
                        new_rb,
                    )
                    cfg = dataclasses.replace(
                        cfg,
                        raster=dataclasses.replace(
                            cfg.raster, max_visible=grown
                        ),
                    )
                row_budget = new_rb
            print(
                f"  densify@{it}: clone={int(dens_info['n_clone'])} "
                f"split={int(dens_info['n_split'])} "
                f"pruned={int(dens_info['n_pruned'])} "
                f"dropped={int(dens_info['n_dropped'])} "
                f"alive={int(dens_info['n_alive'])} "
                f"score p50/p90/p99="
                f"{float(dens_info['score_p50']):.4f}/"
                f"{float(dens_info['score_p90']):.4f}/"
                f"{float(dens_info['score_p99']):.4f} "
                f"grad p50/p99={float(dens_info['grad_p50']):.5f}/"
                f"{float(dens_info['grad_p99']):.5f} "
                f"radii p50/p99={float(dens_info['radii_p50']):.0f}/"
                f"{float(dens_info['radii_p99']):.0f}",
                flush=True,
            )

        if it % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            n_alive = int(ts.gaussians.alive.sum())
            print(
                f"[{it}/{cfg.iterations}] loss={m.get('total', 0):.4f} "
                f"photo={m.get('photo', 0):.4f} alive={n_alive} "
                f"({(time.time() - t0):.1f}s)",
                flush=True,
            )
        if (
            model_cfg.model_path
            and pipe_cfg.debug_panel_every > 0
            and it % pipe_cfg.debug_panel_every == 0
        ):
            save_frequency_panel(ts, cam, cfg, model_cfg.model_path, it)
    # drain counters from the final (partial) window — otherwise up to
    # OVERFLOW_CHECK_EVERY-1 trailing steps' overflow is never fetched and a
    # run can end with silently dropped contributions and no report
    if pending_overflow:
        vals = [
            tuple(int(x) for x in row) for row in jax.device_get(pending_overflow)
        ]
        pending_overflow = []
        total_dropped_inst += sum(v[0] for v in vals)
        total_dropped_blocks += sum(v[1] for v in vals)
        total_skipped_steps += sum(1 for v in vals if len(v) > 4 and v[4] == 0)
    if total_dropped_inst or total_dropped_blocks:
        print(
            f"run summary: {total_dropped_inst} instances and "
            f"{total_dropped_blocks} kernel blocks were dropped by budget "
            f"overflows before re-budgeting caught up",
            flush=True,
        )
    if total_skipped_steps:
        print(f"run summary: {total_skipped_steps} steps skipped by the "
              "finite-step gate (non-finite loss/grads)", flush=True)
    if len(budget_log) > 1:
        traj = " → ".join(
            f"@{s}:{mi}/{mb or '-'}" for s, mi, mb in budget_log
        )
        print(f"run summary: budget trajectory (step:instances/blocks) {traj}",
              flush=True)
    return ts


def _available_ram_bytes() -> int:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 8 << 30  # conservative default when /proc is unavailable


def _cache_images(model_cfg, scene_info=None) -> bool:
    """Decoded-image caching policy (ModelConfig.cache_images).

    "always"/"never" are explicit; "auto" estimates the decoded float32
    footprint from the COLMAP intrinsics (known before any image is decoded)
    and caches only when it fits in <40% of available RAM — otherwise the
    lazy CameraDataset path (camera_utils.py:122-144 semantics) decodes per
    step. Estimate uses pre-downscale sizes, so it is conservative."""
    mode = getattr(model_cfg, "cache_images", "auto")
    if mode == "always":
        return True
    if mode == "never":
        return False
    if scene_info is None:
        return True
    bytes_needed = sum(
        int(c.width) * int(c.height) * 3 * 4
        for c in scene_info.train_cameras + scene_info.test_cameras
    )
    return bytes_needed < 0.4 * _available_ram_bytes()


def main(argv=None):
    parser = argparse.ArgumentParser("hidegs_tpu trainer")
    add_group(parser, ModelConfig())
    add_group(parser, PipelineConfig())
    add_group(parser, OptimizationConfig())
    parser.add_argument("--save_iterations", type=int, nargs="+", default=[7_000, 30_000])
    args = parser.parse_args(argv)
    model_cfg = extract_group(args, ModelConfig)
    pipe_cfg = extract_group(args, PipelineConfig)
    opt_cfg = extract_group(args, OptimizationConfig)
    train(model_cfg, pipe_cfg, opt_cfg, save_iterations=tuple(args.save_iterations))


if __name__ == "__main__":
    main()
