"""Pallas kernel parity vs the segmented jnp blend (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render


def render_both(n=250, h=64, w=80, seed=0, geo=True):
    scene = make_toy_gaussians(n, seed=seed)
    cam = ring_camera(0, height=h, width=w)
    out_jnp = render(
        *scene, cam, render_geo=geo, config=RasterConfig(backend="jnp", max_instances=1 << 14)
    )
    with pltpu.force_tpu_interpret_mode():
        out_pl = render(
            *scene, cam, render_geo=geo,
            config=RasterConfig(backend="pallas", max_instances=1 << 14),
        )
    return out_jnp, out_pl


def test_pallas_forward_matches_jnp():
    out_jnp, out_pl = render_both()
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


def test_pallas_gradients_match_jnp():
    scene = make_toy_gaussians(120, seed=1)
    cam = ring_camera(0, height=48, width=48)
    target = jnp.zeros((3, 48, 48))
    bg = jnp.array([0.3, 0.2, 0.1])

    def loss_fn(backend):
        cfg = RasterConfig(backend=backend, max_instances=1 << 13)

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
