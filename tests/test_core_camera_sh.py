import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.core import camera_math as cm
from hidegs_tpu.core import sh as shm


def make_test_cam(h=64, w=96):
    # camera at (0,0,-5) looking at +z
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 5.0])
    return cm.make_camera(R, t, fx=80.0, fy=80.0, height=h, width=w)


def test_camera_center():
    cam = make_test_cam()
    np.testing.assert_allclose(cam.camera_center, jnp.array([0.0, 0.0, -5.0]), atol=1e-6)


def test_project_roundtrip():
    cam = make_test_cam()
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (100, 3)) * jnp.array([1.0, 1.0, 0.5]) + jnp.array([0, 0, 1.0])
    p_cam = cm.world_to_camera(pts, cam)
    uv, z = cm.project_points(p_cam, cam)
    np.testing.assert_allclose(z, p_cam[:, 2], atol=1e-6)
    # unproject via rays: uv → direction * z → camera point
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    np.testing.assert_allclose(x, p_cam[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y, p_cam[:, 1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cm.camera_to_world(p_cam, cam), pts, rtol=1e-4, atol=1e-4)


def test_pixel_rays_center():
    cam = make_test_cam(h=4, w=4)
    rays = cm.pixel_rays(cam)
    assert rays.shape == (4, 4, 3)
    np.testing.assert_allclose(rays[..., 2], jnp.ones((4, 4)), atol=1e-6)
    # central symmetric
    np.testing.assert_allclose(rays[0, 0, 0], -rays[0, 3, 0], atol=1e-6)


def test_depth_to_points():
    cam = make_test_cam(h=8, w=8)
    depth = jnp.full((8, 8), 2.0)
    pts = cm.depth_to_points_cam(depth, cam)
    np.testing.assert_allclose(pts[..., 2], depth, atol=1e-6)


def test_fov_focal_roundtrip():
    f = cm.fov_to_focal(cm.focal_to_fov(100.0, 640), 640)
    assert abs(f - 100.0) < 1e-6


def test_sh_dc_constant_color():
    rgb = jnp.array([0.2, 0.5, 0.8])
    dc = shm.rgb_to_sh_dc(rgb)
    sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(dc)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    out = shm.sh_to_rgb(3, sh, dirs)
    np.testing.assert_allclose(out, jnp.broadcast_to(rgb, (5, 3)), atol=1e-5)


def test_sh_degree_mask():
    m0 = shm.degree_mask(0)
    m1 = shm.degree_mask(1)
    m3 = shm.degree_mask(3)
    assert m0.sum() == 1 and m1.sum() == 4 and m3.sum() == 16


def test_sh_basis_orthogonality():
    # Monte-Carlo orthonormality check over the sphere: E[Y_i Y_j] = δ_ij/(4π)
    key = jax.random.PRNGKey(1)
    dirs = jax.random.normal(key, (50000, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    B = shm.sh_basis(dirs)  # (M, 16)
    gram = (B.T @ B) / dirs.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


def test_sh_clamp_grad():
    # clamp at 0 must zero gradients (matches reference clamp-mask backward)
    sh = jnp.zeros((1, 16, 3)).at[0, 0, :].set(jnp.array([-10.0, 0.0, 10.0]))
    dirs = jnp.array([[0.0, 0.0, 1.0]])

    def f(s):
        return shm.sh_to_rgb(3, s, dirs).sum()

    g = jax.grad(f)(sh)
    assert g[0, 0, 0] == 0.0  # clamped channel
    assert g[0, 0, 2] > 0.0
