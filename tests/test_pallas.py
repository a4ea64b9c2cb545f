"""Pallas kernel parity vs the segmented jnp blend (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render


def render_both(n=250, h=64, w=80, seed=0, geo=True, tile=16, mm=False):
    scene = make_toy_gaussians(n, seed=seed)
    cam = ring_camera(0, height=h, width=w)
    out_jnp = render(
        *scene, cam, render_geo=geo,
        config=RasterConfig(backend="jnp", max_instances=1 << 14, tile=tile),
    )
    with pltpu.force_tpu_interpret_mode():
        out_pl = render(
            *scene, cam, render_geo=geo,
            config=RasterConfig(
                backend="pallas", max_instances=1 << 14, tile=tile, mm_geom=mm
            ),
        )
    return out_jnp, out_pl


@pytest.mark.parametrize(
    "tile,mm",
    [
        pytest.param(16, False, marks=pytest.mark.slow),
        pytest.param(32, False, marks=pytest.mark.slow),
        pytest.param(16, True, marks=pytest.mark.slow),
        (32, True),  # production default (mm); other combos in the slow tier
    ],
)
def test_pallas_forward_matches_jnp(tile, mm):
    # tile=32 is the production default (config.PipelineConfig.tile); tile=16
    # is the reference's block size (config.h:16-17) — both must agree with
    # the segmented jnp oracle, in both the factored (VPU) and matmul (MXU)
    # geometry formulations
    out_jnp, out_pl = render_both(tile=tile, mm=mm)
    for key in ["render", "invdepth", "alpha", "T_final", "rendered_normal", "rendered_distance"]:
        np.testing.assert_allclose(
            np.array(out_pl[key]), np.array(out_jnp[key]), atol=3e-4, rtol=1e-3,
            err_msg=key,
        )
    # observe counters agree except where the kernel's tile-level early exit
    # stops counting deep-behind-opaque gaussians (w≈0 there anyway)
    np.testing.assert_array_equal(
        np.array(out_pl["out_observe"]), np.array(out_jnp["out_observe"])
    )


@pytest.mark.parametrize(
    "tile,mm",
    [
        pytest.param(16, False, marks=pytest.mark.slow),
        pytest.param(32, False, marks=pytest.mark.slow),
        pytest.param(16, True, marks=pytest.mark.slow),
        (32, True),  # production default; default tier checks the mm path
    ],
)
def test_pallas_gradients_match_jnp(tile, mm):
    scene = make_toy_gaussians(120, seed=1)
    cam = ring_camera(0, height=48, width=48)
    target = jnp.zeros((3, 48, 48))
    bg = jnp.array([0.3, 0.2, 0.1])

    def loss_fn(backend):
        cfg = RasterConfig(
            backend=backend, max_instances=1 << 13, tile=tile, mm_geom=mm
        )

        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs, cam, background=bg, config=cfg)
            return jnp.mean((out["render"] - target) ** 2)

        return f

    args = tuple(scene)
    g_j = jax.grad(loss_fn("jnp"), argnums=(0, 1, 2, 3, 4))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss_fn("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["means", "scales", "quats", "opac", "shs"], g_j, g_p):
        a, b = np.array(a), np.array(b)
        assert np.isfinite(b).all(), name
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=5e-3, err_msg=name)


@pytest.mark.slow
def test_pallas_backend_in_train_step():
    """The pallas custom-VJP path composes with the full jitted train step."""
    from hidegs_tpu.model.gaussians import init_from_points
    from hidegs_tpu.train.loop import TrainConfig, ViewBatch, init_train_state, train_step

    scene = make_toy_gaussians(40, seed=2)
    cam = ring_camera(0, height=32, width=32)
    cfg_r = RasterConfig(backend="pallas", max_instances=1 << 11)
    cfg = TrainConfig(
        iterations=10, raster=cfg_r, freq_warmup=10_000, single_view_weight=0.015,
        single_view_from=0,
    )
    with pltpu.force_tpu_interpret_mode():
        gt = render(*scene, cam, config=cfg_r)["render"]
        state = init_from_points(scene.means3d, jnp.full((40, 3), 0.5), capacity=64)
        ts = init_train_state(state, num_images=1)
        ts, metrics = train_step(ts, ViewBatch(cam=cam, image=gt, image_idx=jnp.int32(0)), cfg)
    assert np.isfinite(float(metrics["total"]))
    for name in ts.gaussians.params._fields:
        assert np.isfinite(np.asarray(getattr(ts.gaussians.params, name))).all(), name


def test_pallas_block_budget_parity_and_overflow():
    """A block budget ≥ needed blocks must render identically to the worst
    case; a too-small budget must report block_overflow and still produce
    finite output (missing tiles fall back to background)."""
    from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
    from hidegs_tpu.raster.pallas_vjp import needed_blocks
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    scene = make_toy_gaussians(250, seed=0)
    cam = ring_camera(0, height=64, width=80)
    ty, tx = tile_grid(cam.height, cam.width)
    tb = bin_gaussians(preprocess_gaussians(*scene, cam), ty, tx, 1 << 14)
    need = int(needed_blocks(tb.tile_count))
    assert need > 0

    with pltpu.force_tpu_interpret_mode():
        out_full = render(
            *scene, cam, config=RasterConfig(backend="pallas", max_instances=1 << 14)
        )
        out_fit = render(
            *scene, cam,
            config=RasterConfig(
                backend="pallas", max_instances=1 << 14, max_blocks=need
            ),
        )
        out_tiny = render(
            *scene, cam,
            config=RasterConfig(
                backend="pallas", max_instances=1 << 14, max_blocks=max(need // 2, 1)
            ),
        )
    assert int(out_fit["block_overflow"]) == 0
    for k in ("render", "invdepth", "alpha", "T_final"):
        np.testing.assert_allclose(
            np.array(out_fit[k]), np.array(out_full[k]), atol=1e-6, err_msg=k
        )
    assert int(out_tiny["block_overflow"]) > 0
    assert np.isfinite(np.array(out_tiny["render"])).all()


@pytest.mark.slow
def test_pallas_block_budget_gradients_match():
    """Gradients with a fitted block budget match the worst-case budget."""
    scene = make_toy_gaussians(120, seed=1)
    cam = ring_camera(0, height=48, width=48)
    target = jnp.zeros((3, 48, 48))
    from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
    from hidegs_tpu.raster.pallas_vjp import needed_blocks
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    ty, tx = tile_grid(cam.height, cam.width)
    tb = bin_gaussians(preprocess_gaussians(*scene, cam), ty, tx, 1 << 13)
    need = int(needed_blocks(tb.tile_count))

    def grads(max_blocks):
        cfg = RasterConfig(backend="pallas", max_instances=1 << 13, max_blocks=max_blocks)

        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs, cam, config=cfg)
            return jnp.mean((out["render"] - target) ** 2)

        with pltpu.force_tpu_interpret_mode():
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*scene)

    g_full = grads(0)
    g_fit = grads(need)
    for a, b in zip(g_full, g_fit):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


@pytest.mark.parametrize(
    "scenario,max_instances,blocks_frac",
    [
        pytest.param("ample", 1 << 13, 0.0, marks=pytest.mark.slow),
        pytest.param("truncated_blocks", 1 << 13, 0.5, marks=pytest.mark.slow),
        # the toy scene wants 601 instances; 512 forces a full stream
        ("saturated_instances", 1 << 9, 0.0),
    ],
)
def test_grad_reduce_prefix_matches_scatter(scenario, max_instances, blocks_frac):
    """The scatter-free 'prefix' gradient fold must match 'scatter' exactly —
    including with tile-cull drops (on by default), a truncated block budget,
    and a SATURATED instance budget, where r2's clamp bug misrouted the last
    instance's gradient/observe onto the preceding slot (ADVICE r2 #1/#2)."""
    scene = make_toy_gaussians(400, seed=3)
    cam = ring_camera(0, height=48, width=64)
    target = jnp.zeros((3, 48, 64))
    from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
    from hidegs_tpu.raster.pallas_vjp import needed_blocks
    from hidegs_tpu.raster.preprocess import preprocess_gaussians

    ty, tx = tile_grid(cam.height, cam.width)
    tb = bin_gaussians(preprocess_gaussians(*scene, cam), ty, tx, max_instances)
    max_blocks = int(int(needed_blocks(tb.tile_count)) * blocks_frac)
    if scenario == "saturated_instances":
        assert int(tb.overflow) > 0, "scenario must exercise a full instance stream"

    def run(grad_reduce):
        cfg = RasterConfig(
            backend="pallas", max_instances=max_instances, max_blocks=max_blocks,
            grad_reduce=grad_reduce,
        )

        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs, cam, config=cfg)
            return jnp.mean((out["render"] - target) ** 2), out["out_observe"]

        with pltpu.force_tpu_interpret_mode():
            (_, obs), g = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4), has_aux=True)(*scene)
        return g, obs

    g_s, obs_s = run("scatter")
    g_p, obs_p = run("prefix")
    np.testing.assert_array_equal(np.array(obs_p), np.array(obs_s))
    for name, a, b in zip(["means", "scales", "quats", "opac", "shs"], g_s, g_p):
        a, b = np.array(a), np.array(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=5e-5, err_msg=name)


@pytest.mark.slow
def test_bf16_stream_forward_and_grads_close():
    """bf16 attribute stream (tile-relative mean2d, f32 math) must track the
    f32 pallas path within bf16 rounding: ~0.4% relative on conic/opacity →
    percent-level image/grad agreement. Exactness is NOT expected."""
    scene = make_toy_gaussians(100, seed=3)
    cam = ring_camera(0, height=32, width=32)
    target = jnp.zeros((3, 32, 32))

    def loss_fn(bf16):
        cfg = RasterConfig(
            backend="pallas", max_instances=1 << 13, tile=16,
            mm_geom=True, bf16_stream=bf16, grad_reduce="prefix",
        )

        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs, cam, config=cfg)
            return out["render"], jnp.mean((out["render"] - target) ** 2)

        return f

    args = tuple(scene)
    with pltpu.force_tpu_interpret_mode():
        img32, _ = loss_fn(False)(*args)
        img16, _ = loss_fn(True)(*args)
        g32 = jax.grad(lambda *a: loss_fn(False)(*a)[1], argnums=(0, 3))(*args)
        g16 = jax.grad(lambda *a: loss_fn(True)(*a)[1], argnums=(0, 3))(*args)
    img32, img16 = np.array(img32), np.array(img16)
    assert np.isfinite(img16).all()
    # image within ~2% of dynamic range
    assert np.abs(img16 - img32).max() < 0.03, np.abs(img16 - img32).max()
    for name, a, b in zip(["means", "opac"], g32, g16):
        a, b = np.array(a), np.array(b)
        assert np.isfinite(b).all(), name
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=5e-2, err_msg=name)
