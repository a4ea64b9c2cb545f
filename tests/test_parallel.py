"""Multi-device (8 virtual CPU) view-parallel training test."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.model.gaussians import init_from_points
from hidegs_tpu.model.knn import initial_scales
from hidegs_tpu.parallel.mesh import make_mesh
from hidegs_tpu.parallel.sharded import make_dp_train_step, stack_view_batches
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.loop import TrainConfig, ViewBatch, init_train_state, train_step
from hidegs_tpu.train.losses import psnr

H = W = 32
RCFG = RasterConfig(backend="jnp", max_instances=1 << 12)


def setup(n=60, n_views=8):
    scene = make_toy_gaussians(n, seed=0)
    cams = [ring_camera(i, n_cams=n_views, height=H, width=W) for i in range(n_views)]
    gts = [render(*scene, c, config=RCFG)["render"] for c in cams]
    pts = scene.means3d
    state = init_from_points(
        pts, jnp.full((n, 3), 0.5), capacity=64, knn_scale=initial_scales(pts)
    )
    return cams, gts, state


@pytest.mark.slow
def test_dp_step_runs_on_mesh():
    assert jax.device_count() >= 8
    cams, gts, state = setup()
    mesh = make_mesh(8, data=8, model=1)
    cfg = TrainConfig(
        iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0
    )
    step, place = make_dp_train_step(cfg, mesh)
    ts = init_train_state(state, num_images=8)
    batches = [
        ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(8)
    ]
    batch = stack_view_batches(batches)
    ts, batch = place(ts, batch)
    for _ in range(10):
        ts, metrics = step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts.step) == 10
    # params actually moved
    assert float(jnp.abs(ts.gaussians.params.sh_dc).max()) > 0


@pytest.mark.slow
def test_dp_matches_sequential_gradients():
    """One DP step over V views == averaged-loss sequential semantics:
    verify the param update direction is consistent with per-view steps by
    checking loss decreases over a few DP steps."""
    cams, gts, state = setup()
    mesh = make_mesh(8, data=8, model=1)
    cfg = TrainConfig(iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0)
    step, place = make_dp_train_step(cfg, mesh)
    ts = init_train_state(state, num_images=8)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(8)]
    )
    ts, batch = place(ts, batch)
    losses = []
    for _ in range(30):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.005, losses[:3] + losses[-3:]


@pytest.mark.slow
def test_dp_visibility_union_semantics():
    cams, gts, state = setup()
    mesh = make_mesh(8, data=8, model=1)
    cfg = TrainConfig(iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0)
    step, place = make_dp_train_step(cfg, mesh)
    ts = init_train_state(state, num_images=8)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(8)]
    )
    ts0, batch = place(ts, batch)
    ts1, _ = step(ts0, batch)
    # gaussians visible in no view must be exactly frozen (dead padded slots)
    moved = np.abs(np.array(ts1.gaussians.params.xyz) - 0.0).sum(axis=-1)
    alive = np.array(ts1.gaussians.alive)
    assert (moved[~alive] == 0).all()


@pytest.mark.slow
def test_dp_with_gaussian_sharding():
    """2x4 mesh: views over 'data', gaussian capacity dim over 'model'."""
    cams, gts, state = setup(n=64, n_views=2)
    mesh = make_mesh(8, data=2, model=4)
    cfg = TrainConfig(iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0)
    step, place = make_dp_train_step(cfg, mesh)
    ts = init_train_state(state, num_images=2)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(2)]
    )
    ts, batch = place(ts, batch, shard_gaussians=True)
    losses = []
    for _ in range(5):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # param leaves really are sharded over the model axis
    sh = ts.gaussians.params.xyz.sharding
    assert "model" in str(sh.spec) or sh.is_fully_replicated is False


def test_camera_band_split_matches_full_render():
    """Space-parallel decomposition: band renders concatenate to the full frame."""
    from hidegs_tpu.parallel.bands import assemble_bands, split_camera_bands

    scene = make_toy_gaussians(200, seed=3)
    cam = ring_camera(0, height=64, width=64)
    cfg = RasterConfig(backend="jnp", max_instances=1 << 14)
    full = render(*scene, cam, config=cfg)["render"]
    bands = split_camera_bands(cam, 4)
    imgs = [render(*scene, b, config=cfg)["render"] for b in bands]
    np.testing.assert_allclose(
        np.asarray(assemble_bands(imgs)), np.asarray(full), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_band_parallel_step_over_mesh():
    """One view split into 8 bands sharded over the data axis trains."""
    from hidegs_tpu.parallel.bands import split_camera_bands

    scene = make_toy_gaussians(60, seed=4)
    cam = ring_camera(0, height=64, width=32)
    cfg_r = RasterConfig(backend="jnp", max_instances=1 << 12)
    gt = render(*scene, cam, config=cfg_r)["render"]
    bands = split_camera_bands(cam, 8)
    gts = [gt[:, i * 8 : (i + 1) * 8, :] for i in range(8)]
    mesh = make_mesh(8, data=8, model=1)
    cfg = TrainConfig(iterations=50, raster=cfg_r, freq_warmup=10_000, single_view_weight=0.0)
    step, place = make_dp_train_step(cfg, mesh)
    state = init_from_points(
        scene.means3d, jnp.full((60, 3), 0.5), capacity=64,
        knn_scale=initial_scales(scene.means3d),
    )
    ts = init_train_state(state, num_images=8)
    batch = stack_view_batches(
        [ViewBatch(cam=bands[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(8)]
    )
    ts, batch = place(ts, batch)
    losses = []
    for _ in range(8):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_dp_bf16_grad_reduction_matches_f32():
    """The compressed-wire (bf16 psum via shard_map) step tracks the implicit
    f32-GSPMD step closely: same first-step update direction, loss converges.
    (SURVEY §7.3 #7 — grad compression for the cross-slice reduce.)"""
    cams, gts, state = setup()
    mesh = make_mesh(8, data=8, model=1)
    cfg = TrainConfig(iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0)
    step32, place = make_dp_train_step(cfg, mesh)
    step16, _ = make_dp_train_step(cfg, mesh, grad_reduce_dtype=jnp.bfloat16)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(8)]
    )
    # steps donate their input state, and device_put may alias on CPU — give
    # each step its own deep copy and snapshot xyz before stepping
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)
    ts0 = init_train_state(state, num_images=8)
    ts0b = copy(ts0)
    ts0, batch = place(ts0, batch)
    xyz0 = np.array(ts0.gaussians.params.xyz)
    a, ma = step32(ts0, batch)
    ts0b, _ = place(ts0b, batch)
    b, mb = step16(ts0b, batch)
    assert np.isfinite(float(mb["loss"]))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-4)
    da = np.array(a.gaussians.params.xyz) - xyz0
    db = np.array(b.gaussians.params.xyz) - xyz0
    # Adam normalizes magnitudes, so compare update directions where moved
    moved = (np.abs(da).max(-1) > 0) | (np.abs(db).max(-1) > 0)
    num = (da[moved] * db[moved]).sum()
    den = np.linalg.norm(da[moved]) * np.linalg.norm(db[moved]) + 1e-12
    assert num / den > 0.99, num / den
    # and the bf16 step trains: loss decreases over a few steps
    losses = [float(mb["loss"])]
    ts = b
    for _ in range(15):
        ts, m = step16(ts, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.003, losses


@pytest.mark.slow
def test_dp_pallas_kernel_path_on_mesh():
    """The production Pallas blend/VJP on the device mesh (VERDICT r2 weak
    #4): a shard_map DP step with the kernels in TPU-interpret mode must (a)
    compile with the bf16 compressed gradient all-reduce, (b) produce the
    same update direction as the jnp-backend GSPMD step, (c) train.

    shard_map (manual partitioning) is required on CPU hosts: interpret-mode
    pallas lowers its DMA to io_callbacks, which the GSPMD partitioner
    rejects as replicated side-effecting custom calls."""
    from jax.experimental.pallas import tpu as pltpu

    n, V = 64, 2
    h = w = 16
    scene = make_toy_gaussians(n, seed=0)
    cams = [ring_camera(i, n_cams=V, height=h, width=w) for i in range(V)]
    cfg_jnp = RasterConfig(backend="jnp", max_instances=1 << 9)
    cfg_pl = RasterConfig(backend="pallas", max_instances=1 << 9, tile=16)
    gts = [render(*scene, c, config=cfg_jnp)["render"] for c in cams]
    mesh = make_mesh(2, data=2, model=1)

    def run(rcfg, interp):
        cfg = TrainConfig(
            iterations=100, raster=rcfg, freq_warmup=10_000, single_view_weight=0.0
        )
        kwargs = dict(grad_reduce_dtype=jnp.bfloat16) if rcfg.backend == "pallas" else {}
        step, place = make_dp_train_step(cfg, mesh, **kwargs)
        state = init_from_points(
            scene.means3d, jnp.full((n, 3), 0.5), capacity=128,
            knn_scale=initial_scales(scene.means3d),
        )
        ts = init_train_state(state, num_images=V)
        batch = stack_view_batches(
            [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(V)]
        )
        ts, batch = place(ts, batch)
        xyz0 = np.array(ts.gaussians.params.xyz)
        ctx = pltpu.force_tpu_interpret_mode() if interp else _null()
        with ctx:
            hlo = step.lower(ts, batch).compile().as_text()
            losses = []
            for _ in range(4):
                ts, m = step(ts, batch)
                losses.append(float(m["loss"]))
        return np.array(ts.gaussians.params.xyz) - xyz0, losses, hlo

    import contextlib as _ctxlib

    _null = _ctxlib.nullcontext
    d_jnp, _, _ = run(cfg_jnp, interp=False)
    d_pl, losses, hlo = run(cfg_pl, interp=True)
    # (a) the explicit gradient psum is present in the compiled HLO (the CPU
    # backend may promote the bf16 wire format back to f32 — the dtype claim
    # is covered numerically by test_dp_bf16_grad_reduction_matches_f32)
    assert any(
        "all-reduce" in ln and "shard_map/psum" in ln for ln in hlo.splitlines()
    ), "expected the shard_map gradient all-reduce in the pallas step"
    # (b) same first-step update direction as the validated jnp GSPMD step
    moved = (np.abs(d_jnp).max(-1) > 0) | (np.abs(d_pl).max(-1) > 0)
    num = (d_jnp[moved] * d_pl[moved]).sum()
    den = np.linalg.norm(d_jnp[moved]) * np.linalg.norm(d_pl[moved]) + 1e-12
    assert num / den > 0.98, num / den
    # (c) it trains
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_replicate_preprocessed_collective_pattern():
    """Gaussian-sharded runs with replicate_preprocessed must resolve the
    instance-expansion gather with a C-sized all-gather of the compacted
    screen rows, NOT a V*max_instances-sized all-reduce (docs/SHARDING.md)."""
    import re

    cams, gts, state = setup(n=64, n_views=2)
    mesh = make_mesh(8, data=2, model=4)
    cfg = TrainConfig(
        iterations=100, raster=RCFG, freq_warmup=10_000, single_view_weight=0.0
    )
    step, place = make_dp_train_step(cfg, mesh, replicate_preprocessed=True)
    ts = init_train_state(state, num_images=2)
    batch = stack_view_batches(
        [ViewBatch(cam=cams[i], image=gts[i], image_idx=jnp.int32(i)) for i in range(2)]
    )
    ts, batch = place(ts, batch, shard_gaussians=True)
    txt = step.lower(ts, batch).compile().as_text()
    inst = 2 * RCFG.max_instances  # V * max_instances
    bad = [
        ln for ln in txt.splitlines()
        if "all-reduce(" in ln and f"{inst}" in ln.split("=")[0]
    ]
    assert not bad, f"instance-sized all-reduce survived: {bad[:2]}"
    # and the step still runs and learns
    losses = []
    for _ in range(5):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
