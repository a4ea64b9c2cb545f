"""Golden-image regression (SURVEY §4 layer 4) + checkpoint resume."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_render.npz")


def test_render_matches_golden():
    """Any semantic change to the render pipeline must consciously update the
    committed golden (regenerate with tests/conftest CPU settings)."""
    scene = make_toy_gaussians(200, seed=42)
    cam = ring_camera(0, height=64, width=64)
    out = render(
        *scene, cam, render_geo=True, config=RasterConfig(backend="jnp", max_instances=1 << 14)
    )
    g = np.load(GOLDEN)
    np.testing.assert_allclose(
        np.asarray(out["render"], np.float32), g["render"].astype(np.float32),
        atol=2e-3, err_msg="render drifted from golden",
    )
    np.testing.assert_allclose(
        np.asarray(out["invdepth"], np.float32), g["invdepth"].astype(np.float32), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["alpha"], np.float32), g["alpha"].astype(np.float32), atol=2e-3
    )


def test_checkpoint_resume_bitexact(tmp_path):
    """Save at step k, restore, continue — must equal uninterrupted run."""
    from hidegs_tpu.model.gaussians import init_from_points
    from hidegs_tpu.train.checkpoint import load_train_state, save_train_state
    from hidegs_tpu.train.loop import TrainConfig, ViewBatch, init_train_state, train_step

    scene = make_toy_gaussians(50, seed=1)
    cam = ring_camera(0, height=32, width=32)
    cfg = TrainConfig(
        iterations=100, raster=RasterConfig(backend="jnp", max_instances=1 << 12),
        freq_warmup=10_000, single_view_weight=0.0,
    )
    gt = render(*scene, cam, config=cfg.raster)["render"]

    def fresh_ts():
        # build a brand-new state each time: train_step donates its input
        # buffers, so sharing one pytree across runs would reuse dead buffers
        state = init_from_points(scene.means3d, jnp.full((50, 3), 0.5), capacity=64)
        return init_train_state(state, num_images=1, seed=0)

    def run(n, ts):
        for _ in range(n):
            ts, _ = train_step(ts, ViewBatch(cam=cam, image=gt, image_idx=jnp.int32(0)), cfg)
        return ts

    ts_a = run(6, fresh_ts())

    ts_b = run(3, fresh_ts())
    save_train_state(ts_b, str(tmp_path), 3)
    ts_b2, it = load_train_state(fresh_ts(), str(tmp_path), 3)
    assert it == 3
    ts_b3 = run(3, ts_b2)

    np.testing.assert_array_equal(
        np.asarray(ts_a.gaussians.params.xyz), np.asarray(ts_b3.gaussians.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(ts_a.opt.m.xyz), np.asarray(ts_b3.opt.m.xyz)
    )
    assert int(ts_a.step) == int(ts_b3.step) == 6
