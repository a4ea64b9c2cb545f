"""Losses, SSIM, frequency regularizer."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.train import losses
from hidegs_tpu.train.frequency import (
    frequency_pyramid_loss,
    frequency_regularization,
    high_frequency_mask,
    scale_regularization,
)


def rand_img(key, c=3, h=64, w=64):
    return jax.random.uniform(key, (c, h, w))


def test_ssim_identity():
    img = rand_img(jax.random.PRNGKey(0))
    assert float(losses.ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(1)
    img = rand_img(key)
    noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
    assert float(losses.ssim(img, noisy)) < float(losses.ssim(img, img))


def test_psnr():
    img = rand_img(jax.random.PRNGKey(2))
    assert float(losses.psnr(img, img)) > 100
    off = jnp.clip(img + 0.1, 0, 1)
    p = float(losses.psnr(img, off))
    assert 15 < p < 30


def test_psnr_masked():
    img = rand_img(jax.random.PRNGKey(3), h=8, w=8)
    bad = img.at[:, :4].set(0.0)
    mask = jnp.zeros((8, 8)).at[4:].set(1.0)  # only unchanged rows
    assert float(losses.psnr(bad, img, mask)) > 100


def test_dssim_l1_zero_for_identical():
    img = rand_img(jax.random.PRNGKey(4))
    assert float(losses.dssim_l1(img, img)) < 1e-5


def test_image_gradient_weight_edges_low():
    img = jnp.zeros((3, 32, 32)).at[:, :, 16:].set(1.0)  # vertical edge
    w = losses.image_gradient_weight(img)
    assert float(w[16, 15]) < 0.1  # at the edge: weight ~0
    assert float(w[16, 5]) > 0.9  # flat region: weight ~1


def test_lncc_identical_patches():
    key = jax.random.PRNGKey(5)
    p = jax.random.uniform(key, (10, 49))
    loss, mask = losses.lncc(p, p)
    np.testing.assert_allclose(loss, 0.0, atol=1e-4)
    assert bool(mask.all())
    # anti-correlated → loss 2, masked out
    loss2, mask2 = losses.lncc(p, -p)
    np.testing.assert_allclose(loss2, 2.0, atol=1e-3)
    assert not bool(mask2.any())


def test_frequency_loss_zero_identical():
    img = rand_img(jax.random.PRNGKey(6))
    assert float(frequency_pyramid_loss(img, img)) < 1e-6


def test_frequency_loss_detects_blur():
    key = jax.random.PRNGKey(7)
    img = rand_img(key, h=64, w=64)
    # blur = downsample+upsample
    small = img.reshape(3, 32, 2, 32, 2).mean(axis=(2, 4))
    blurred = jnp.repeat(jnp.repeat(small, 2, axis=1), 2, axis=2)
    l_blur = float(frequency_pyramid_loss(blurred, img))
    assert l_blur > 1e-4  # blur penalized


def test_high_frequency_mask_localizes_texture():
    # left half: smooth ramp; right half: noise → mask should concentrate right.
    # (a spatially-uniform pattern like a perfect checkerboard normalizes away
    # under the reference's min-max step, so locality is the meaningful test)
    key = jax.random.PRNGKey(9)
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, 64)[None, :], (64, 64))
    noise = jax.random.uniform(key, (64, 64))
    img2d = jnp.concatenate([ramp[:, :32], noise[:, 32:]], axis=1)
    img = jnp.broadcast_to(img2d, (3, 64, 64))
    m = high_frequency_mask(img)
    left = float(m[:, :30].mean())
    right = float(m[:, 34:].mean())
    assert right > 0.5
    assert right > left + 0.3


def test_scale_regularization():
    scales = jnp.array([[0.005, 0.005, 0.005], [0.5, 0.01, 0.01]])
    vis = jnp.array([True, True])
    loss = float(scale_regularization(scales, vis))
    assert loss > 0
    # only small scales → zero
    assert float(scale_regularization(scales[:1], vis[:1])) == 0.0
    # invisible → zero
    assert float(scale_regularization(scales, jnp.array([False, False]))) == 0.0


def test_frequency_regularization_warmup_and_grad():
    key = jax.random.PRNGKey(8)
    gt = rand_img(key)
    rendered = jnp.clip(gt + 0.1 * jax.random.normal(key, gt.shape), 0, 1)
    scales = jnp.abs(jax.random.normal(key, (50, 3))) * 0.1
    vis = jnp.ones(50, bool)
    loss_w, _, dbg = frequency_regularization(rendered, gt, scales, vis, iteration=10)
    assert float(loss_w) == 0.0  # warm-up
    loss, mask, dbg = frequency_regularization(rendered, gt, scales, vis, iteration=5000)
    assert float(loss) > 0
    assert mask.shape == (64, 64)

    def f(r):
        l, _, _ = frequency_regularization(r, gt, scales, vis, iteration=5000)
        return l

    g = jax.grad(f)(rendered)
    assert np.isfinite(np.array(g)).all()
    assert np.abs(np.array(g)).max() > 0


def test_dilate_erode():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    d = losses.dilate(m)
    assert float(d.sum()) == 9.0
    e = losses.erode(d)
    assert float(e.sum()) == 1.0 and float(e[4, 4]) == 1.0


def test_homography_matches_projection_on_plane():
    """Plane-induced homography must agree with direct projection for points
    ON the plane (regression: a sign-flipped formula warped patches hundreds
    of pixels off and silently zeroed the multi-view losses)."""
    from hidegs_tpu.core.camera_math import project_points
    from hidegs_tpu.core.geometry import apply_homography, homography_from_plane
    from hidegs_tpu.data.synthetic import ring_camera

    cam0 = ring_camera(0, n_cams=8, height=96, width=96)
    cam1 = ring_camera(1, n_cams=8, height=96, width=96)
    n = jnp.array([[0.0, 0.0, -1.0]])  # plane z = 5 in ref frame: nᵀX = -5
    d = jnp.array([-5.0])
    H = homography_from_plane(n, d, cam0, cam1)
    uv = jnp.array([[48.0, 48.0], [20.0, 70.0], [80.0, 15.0]])
    x = (uv[:, 0] - cam0.cx) / cam0.fx
    y = (uv[:, 1] - cam0.cy) / cam0.fy
    X = jnp.stack([x, y, jnp.ones_like(x)], -1) * 5.0
    R_rel = cam1.R @ cam0.R.T
    t_rel = cam1.t - R_rel @ cam0.t
    uv_direct, _ = project_points(X @ R_rel.T + t_rel, cam1)
    uv_h = apply_homography(jnp.broadcast_to(H, (3, 3, 3)), uv)
    np.testing.assert_allclose(np.asarray(uv_h), np.asarray(uv_direct), atol=1e-3)


@pytest.mark.slow
def test_multi_view_losses_nonzero_on_real_pair():
    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.raster.api import RasterConfig, render
    from hidegs_tpu.train.geometric import MultiViewBatch, multi_view_losses

    cfg = RasterConfig(backend="jnp", max_instances=1 << 14)
    scene = make_toy_gaussians(500, seed=2)
    cam0 = ring_camera(0, n_cams=8, height=96, width=96)
    cam1 = ring_camera(1, n_cams=8, height=96, width=96)
    out0 = render(*scene, cam0, render_geo=True, config=cfg)
    out1 = render(*scene, cam1, render_geo=True, config=cfg)
    ncc, geo = multi_view_losses(
        out0["plane_depth"], out0["rendered_normal"],
        jnp.mean(out0["render"], axis=0), cam0,
        MultiViewBatch(
            src_image_gray=jnp.mean(out1["render"], axis=0),
            src_plane_depth=out1["plane_depth"], src_cam=cam1,
        ),
        jax.random.PRNGKey(0), num_samples=4096,
    )
    assert float(geo) > 0.0, "geometric term must see valid samples"
    assert 0.0 < float(ncc) < 2.0
