"""Camera matrices, projections and ray generation.

Functional parity with the reference's graphics utilities
(reference: utils/graphics_utils.py:46-91, scene/cameras.py:121-160) but
expressed as a flat `CameraParams` pytree usable inside jit.

Conventions (COLMAP / reference):
  * `R` is world→camera rotation, `t` world→camera translation:
    X_cam = R @ X_world + t.  +z looks forward, +y down in image space.
  * Pixel coordinates: u = fx * x/z + cx, v = fy * y/z + cy, with (u, v)
    measured so that pixel centers are at half-integer offsets (pixel (i, j)
    center is (j + 0.5, i + 0.5)).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CameraParams:
    """Camera pytree passed into jitted render/train fns.

    Pose/intrinsics are array children (traced); `height`/`width` are static
    aux data — the rasterizer derives tile-grid shapes from them, so they must
    stay concrete under jit.
    """

    R: jnp.ndarray  # (3, 3) world→camera rotation
    t: jnp.ndarray  # (3,)   world→camera translation
    fx: jnp.ndarray  # ()
    fy: jnp.ndarray  # ()
    cx: jnp.ndarray  # ()  principal point, pixels
    cy: jnp.ndarray  # ()
    height: int  # static
    width: int  # static
    # Frustum extent used by the EWA tangent clamp. Differs from height/width
    # only for band crops (parallel/bands.py): a crop must keep the FULL
    # frame's clamp or near-band-edge gaussians get pulled inward.
    full_height: int = 0  # 0 → height
    full_width: int = 0  # 0 → width

    def tree_flatten(self):
        return (self.R, self.t, self.fx, self.fy, self.cx, self.cy), (
            self.height,
            self.width,
            self.full_height,
            self.full_width,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, height=aux[0], width=aux[1],
                   full_height=aux[2], full_width=aux[3])

    @property
    def frustum_height(self) -> int:
        return self.full_height or self.height

    @property
    def frustum_width(self) -> int:
        return self.full_width or self.width

    @property
    def camera_center(self) -> jnp.ndarray:
        """World-space camera origin: -Rᵀ t."""
        return -self.R.T @ self.t

    @property
    def world_view_transform(self) -> jnp.ndarray:
        """4x4 world→camera matrix (row-major math convention M @ [x;1])."""
        M = jnp.eye(4, dtype=self.R.dtype)
        M = M.at[:3, :3].set(self.R)
        M = M.at[:3, 3].set(self.t)
        return M

    @property
    def K(self) -> jnp.ndarray:
        """3x3 intrinsics."""
        return jnp.array(
            [
                [self.fx, 0.0, self.cx],
                [0.0, self.fy, self.cy],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    @property
    def fov_x(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.width / (2.0 * self.fx))

    @property
    def fov_y(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.height / (2.0 * self.fy))


def make_camera(
    R,
    t,
    fx,
    fy,
    cx=None,
    cy=None,
    height: int = 0,
    width: int = 0,
    dtype=jnp.float32,
    xp=jnp,
) -> CameraParams:
    """`xp=np` builds a HOST-resident camera (numpy leaves): jit tracing
    converts them on use, while host-side consumers (the analytic GT
    ray-caster, COLMAP writers) read them without device round-trips — on
    the tunneled-TPU host a single tiny device→host fetch costs ~RTT."""
    if cx is None:
        cx = width / 2.0
    if cy is None:
        cy = height / 2.0
    return CameraParams(
        R=xp.asarray(R, dtype),
        t=xp.asarray(t, dtype),
        fx=xp.asarray(fx, dtype),
        fy=xp.asarray(fy, dtype),
        cx=xp.asarray(cx, dtype),
        cy=xp.asarray(cy, dtype),
        height=int(height),
        width=int(width),
    )


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_camera(points: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """(N, 3) world points → camera frame."""
    return points @ cam.R.T + cam.t


def camera_to_world(points_cam: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    return (points_cam - cam.t) @ cam.R


def project_points(points_cam: jnp.ndarray, cam: CameraParams, eps: float = 1e-6):
    """Camera-frame points → pixel coords (u, v) and depth z.

    Returns ((N, 2) uv, (N,) z). No clipping; callers cull on z.
    """
    z = points_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < eps, jnp.sign(z) * eps + (z == 0) * eps, z)
    u = cam.fx * points_cam[..., 0] / zs + cam.cx
    v = cam.fy * points_cam[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_rays(cam: CameraParams) -> jnp.ndarray:
    """Unit-z camera-space ray directions per pixel, shape (H, W, 3).

    ray = ((u - cx)/fx, (v - cy)/fy, 1) at pixel centers; multiplying by
    depth z gives camera-space points (reference: scene/cameras.py:141-149,
    utils/graphics_utils.py:108-128).
    """
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32) + 0.5,
        jnp.arange(cam.width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def depth_to_points_cam(depth: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """(H, W) z-depth map → (H, W, 3) camera-space points."""
    return pixel_rays(cam) * depth[..., None]


def ndc_from_pixels(uv: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Pixel coords → [-1, 1] NDC (used by grid-sample style lookups)."""
    u = uv[..., 0] / cam.width * 2.0 - 1.0
    v = uv[..., 1] / cam.height * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)
