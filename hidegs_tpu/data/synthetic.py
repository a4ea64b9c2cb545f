"""Synthetic toy scenes for tests and benchmarks.

Plays the role the reference has no equivalent of (it has no tests, SURVEY §4)
— a deterministic gaussian-cloud + ring-of-cameras generator sized for the
BASELINE config-1 workload (10k gaussians, one 800x800 view, CPU-runnable).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.core.camera_math import CameraParams, make_camera
from hidegs_tpu.core.sh import NUM_SH_COEFFS, rgb_to_sh_dc


class ToyScene(NamedTuple):
    means3d: jnp.ndarray  # (N, 3)
    scales: jnp.ndarray  # (N, 3) linear
    quats: jnp.ndarray  # (N, 4) wxyz
    opacities: jnp.ndarray  # (N,)
    shs: jnp.ndarray  # (N, 16, 3)


def make_toy_gaussians(
    n: int,
    key=None,
    extent: float = 2.0,
    scale_range=(0.02, 0.12),
    seed: int = 0,
) -> ToyScene:
    if key is None:
        key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    log_lo, log_hi = np.log(scale_range[0]), np.log(scale_range[1])
    scales = jnp.exp(jax.random.uniform(k2, (n, 3), minval=log_lo, maxval=log_hi))
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.random.uniform(k4, (n,), minval=0.3, maxval=0.95)
    rgb = jax.random.uniform(k5, (n, 3), minval=0.05, maxval=0.95)
    shs = jnp.zeros((n, NUM_SH_COEFFS, 3)).at[:, 0, :].set(rgb_to_sh_dc(rgb))
    return ToyScene(means, scales, quats, opac, shs)


def ring_camera(
    idx: int,
    n_cams: int = 8,
    radius: float = 6.0,
    height: int = 128,
    width: int = 128,
    focal: float = None,
    target=(0.0, 0.0, 0.0),
) -> CameraParams:
    """Camera `idx` on a horizontal ring looking at the origin."""
    if focal is None:
        focal = 0.9 * max(height, width)
    theta = 2.0 * np.pi * idx / n_cams
    pos = np.array([radius * np.sin(theta), -0.5, -radius * np.cos(theta)])
    tgt = np.asarray(target, dtype=np.float64)
    fwd = tgt - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # image +y is down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows of R are camera axes in world coords (x=right, y=down, z=fwd)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ pos
    # host-resident (xp=np): synthetic cameras feed both jitted renders and
    # host-side consumers (analytic GT, COLMAP writers); see make_camera
    return make_camera(R, t, fx=focal, fy=focal, height=height, width=width, xp=np)


def make_uav_gaussians(
    n_ground: int = 20_000,
    n_structs: int = 24,
    extent_xy: float = 12.0,
    seed: int = 0,
) -> ToyScene:
    """UAV-nadir-style scene: a high-frequency textured ground sheet plus
    box-like structures. Plays the role of a WHU/ISPRS-like workload (fine
    ground texture for the frequency losses, vertical structure for
    depth/normal terms) — the container ships no real datasets.

    Ground gaussians are thin disks (small z-scale) at z≈0 with a procedural
    checker+noise albedo; structures are clusters forming walls/roofs.
    """
    rng = np.random.default_rng(seed)
    # ---- ground sheet ----
    gx = rng.uniform(-extent_xy, extent_xy, n_ground)
    gy = rng.uniform(-extent_xy, extent_xy, n_ground)
    gz = rng.normal(0.0, 0.02, n_ground)
    g_means = np.stack([gx, gy, gz], -1)
    cell = 2 * extent_xy / np.sqrt(n_ground)  # mean spacing
    g_scales = np.stack(
        [rng.uniform(0.8, 1.6, n_ground) * cell,
         rng.uniform(0.8, 1.6, n_ground) * cell,
         np.full(n_ground, 0.1 * cell)], -1)
    g_quats = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n_ground, 1))
    # procedural albedo: checker + two sine octaves + per-splat noise
    checker = ((np.floor(gx / 1.5) + np.floor(gy / 1.5)) % 2) * 0.25
    waves = 0.15 * np.sin(3.1 * gx) * np.cos(2.7 * gy) + 0.1 * np.sin(11.0 * gy)
    base = np.stack([0.35 + checker, 0.45 + waves, 0.3 + 0.2 * checker], -1)
    g_rgb = np.clip(base + rng.normal(0, 0.08, (n_ground, 3)), 0.02, 0.98)
    g_opac = rng.uniform(0.7, 0.98, n_ground)

    # ---- structures: boxes of splats (walls + roof) ----
    s_means, s_scales, s_rgb = [], [], []
    for _ in range(n_structs):
        cx_, cy_ = rng.uniform(-0.8 * extent_xy, 0.8 * extent_xy, 2)
        w, d, h = rng.uniform(0.6, 1.8, 3) * np.array([1, 1, 1.6])
        col = rng.uniform(0.2, 0.9, 3)
        m = 160
        face = rng.integers(0, 5, m)
        u, v = rng.uniform(-1, 1, (2, m))
        px = np.where(face == 0, -w, np.where(face == 1, w, u * w))
        py = np.where(face == 2, -d, np.where(face == 3, d, v * d))
        pz = np.where(face == 4, h, (rng.uniform(0, 1, m)) * h)
        pz = np.where(face < 4, rng.uniform(0, 1, m) * h, h)
        s_means.append(np.stack([cx_ + px, cy_ + py, pz], -1))
        s_scales.append(np.full((m, 3), 0.12) * rng.uniform(0.7, 1.5, (m, 1)))
        s_rgb.append(np.clip(col + rng.normal(0, 0.06, (m, 3)), 0.05, 0.95))
    means = np.concatenate([g_means] + s_means).astype(np.float32)
    scales = np.concatenate([g_scales] + s_scales).astype(np.float32)
    rgb = np.concatenate([g_rgb] + s_rgb).astype(np.float32)
    n = means.shape[0]
    quats = np.concatenate(
        [g_quats, np.tile(np.array([1.0, 0, 0, 0]), (n - n_ground, 1))]
    ).astype(np.float32)
    opac = np.concatenate(
        [g_opac, rng.uniform(0.75, 0.98, n - n_ground)]
    ).astype(np.float32)
    shs = jnp.zeros((n, NUM_SH_COEFFS, 3)).at[:, 0, :].set(
        rgb_to_sh_dc(jnp.asarray(rgb))
    )
    return ToyScene(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                    jnp.asarray(opac), shs)


def nadir_grid_camera(
    ix: int, iy: int, nx: int, ny: int,
    extent_xy: float = 12.0, altitude: float = 14.0, tilt: float = 0.12,
    height: int = 256, width: int = 256, focal: float = None,
) -> CameraParams:
    """Camera (ix, iy) of a UAV lawnmower grid: near-nadir, slight alternating
    tilt (like the reference's UAV captures, 40–65 m altitude README.md:128)."""
    if focal is None:
        focal = 0.9 * max(height, width)
    margin = 0.75
    x = (-margin + 2 * margin * ix / max(nx - 1, 1)) * extent_xy
    y = (-margin + 2 * margin * iy / max(ny - 1, 1)) * extent_xy
    pos = np.array([x, y, altitude])
    # look mostly straight down (+z is up in scene coords → camera z = -z̑)
    ang = tilt * (1 if (ix + iy) % 2 == 0 else -1)
    fwd = np.array([np.sin(ang), 0.02, -np.cos(ang)])
    fwd /= np.linalg.norm(fwd)
    up_hint = np.array([0.0, 1.0, 0.0])
    right = np.cross(up_hint, fwd); right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ pos
    # host-resident (xp=np): synthetic cameras feed both jitted renders and
    # host-side consumers (analytic GT, COLMAP writers); see make_camera
    return make_camera(R, t, fx=focal, fy=focal, height=height, width=width, xp=np)


def procedural_texture(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """High-frequency procedural albedo at world ground coordinates (u, v).

    Checker + two sine octaves + hash-based value noise — content a finite
    gaussian mixture can approximate but never represent exactly, so quality
    deltas between loss configurations are meaningful (VERDICT r1 item 2:
    round-1 GT was rendered FROM gaussians, which the model class fits
    exactly). Returns (..., 3) in [0, 1].
    """
    checker = ((np.floor(u / 0.9) + np.floor(v / 0.9)) % 2.0) * 0.30
    fine = ((np.floor(u / 0.22) + np.floor(v / 0.22)) % 2.0) * 0.12
    waves = 0.14 * np.sin(5.3 * u) * np.cos(4.1 * v) + 0.10 * np.sin(17.0 * v + 2.0 * u)
    # deterministic value noise from an integer lattice hash, bilinear interp
    def hash01(ix, iy):
        h = (ix.astype(np.int64) * 374761393 + iy.astype(np.int64) * 668265263) % 2147483647
        h = (h ^ (h >> 13)) * 1274126177 % 2147483647
        return (h % 65536).astype(np.float64) / 65536.0

    gu, gv = u / 0.35, v / 0.35
    iu, iv = np.floor(gu), np.floor(gv)
    fu, fv = gu - iu, gv - iv
    n = (
        hash01(iu, iv) * (1 - fu) * (1 - fv)
        + hash01(iu + 1, iv) * fu * (1 - fv)
        + hash01(iu, iv + 1) * (1 - fu) * fv
        + hash01(iu + 1, iv + 1) * fu * fv
    )
    r = 0.38 + checker + 0.18 * (n - 0.5)
    g = 0.45 + waves + fine
    b = 0.33 + 0.22 * checker - 0.10 * waves + 0.12 * (n - 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0.02, 0.98)


def render_analytic_scene(
    cam: CameraParams,
    spheres: np.ndarray = None,
    sphere_colors: np.ndarray = None,
    sky=(0.70, 0.80, 0.95),
    sun=(0.45, 0.35, 0.80),
) -> np.ndarray:
    """Exact ray-cast render of a procedurally-textured ground plane (z=0)
    plus lambertian spheres — analytic ground truth that is NOT in the
    gaussian model class. Returns (3, H, W) float32 in [0, 1].

    spheres: (K, 4) rows [cx, cy, cz, radius]; scene coords have +z up.
    """
    H, W = cam.height, cam.width
    # ONE device_get for all camera leaves: per-field np.asarray() would make
    # ~6 tiny device→host round-trips per camera, which on the tunneled-TPU
    # host dominates (and wedges when the tunnel is degraded)
    import jax

    R_, t_, cx_, cy_, fx_, fy_ = jax.device_get(
        (cam.R, cam.t, cam.cx, cam.cy, cam.fx, cam.fy)
    )
    R = np.asarray(R_, np.float64)
    t = np.asarray(t_, np.float64)
    origin = -R.T @ t  # camera center in world
    xs = (np.arange(W) + 0.5 - float(cx_)) / float(fx_)
    ys = (np.arange(H) + 0.5 - float(cy_)) / float(fy_)
    dx, dy = np.meshgrid(xs, ys)  # (H, W)
    d_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1)
    d_world = d_cam @ R  # rows of R are camera axes => d_world = Rᵀ d_cam
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)

    t_hit = np.full((H, W), np.inf)
    color = np.tile(np.asarray(sky, np.float64), (H, W, 1))

    # ground plane z = 0
    dz = d_world[..., 2]
    t_pl = np.where(np.abs(dz) > 1e-9, -origin[2] / dz, np.inf)
    ok = (t_pl > 1e-6) & (t_pl < t_hit)
    pu = origin[0] + t_pl * d_world[..., 0]
    pv = origin[1] + t_pl * d_world[..., 1]
    tex = procedural_texture(pu, pv)
    color = np.where(ok[..., None], tex, color)
    t_hit = np.where(ok, t_pl, t_hit)

    if spheres is not None:
        sundir = np.asarray(sun, np.float64)
        sundir = sundir / np.linalg.norm(sundir)
        for (cx_, cy_, cz_, rad), col in zip(np.asarray(spheres), np.asarray(sphere_colors)):
            oc = origin - np.array([cx_, cy_, cz_])
            b = np.einsum("hwc,c->hw", d_world, oc)
            c = oc @ oc - rad * rad
            disc = b * b - c
            t_sp = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0.0)), np.inf)
            ok = (t_sp > 1e-6) & (t_sp < t_hit)
            p = origin[None, None] + t_sp[..., None] * d_world
            n = (p - np.array([cx_, cy_, cz_])[None, None]) / rad
            lam = np.clip(np.einsum("hwc,c->hw", n, sundir), 0.0, 1.0) * 0.7 + 0.3
            shaded = np.asarray(col)[None, None] * lam[..., None]
            color = np.where(ok[..., None], shaded, color)
            t_hit = np.where(ok, t_sp, t_hit)

    return np.transpose(color, (2, 0, 1)).astype(np.float32)


def analytic_init_points(
    n_ground: int,
    extent_xy: float,
    spheres: np.ndarray = None,
    sphere_colors: np.ndarray = None,
    n_per_sphere: int = 400,
    seed: int = 0,
):
    """Noisy init point cloud for the analytic scene (plays COLMAP sparse
    points): ground samples colored by the true texture + sphere-surface
    samples. Returns (points (N,3), colors (N,3))."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-extent_xy, extent_xy, n_ground)
    gy = rng.uniform(-extent_xy, extent_xy, n_ground)
    gz = rng.normal(0.0, 0.01, n_ground)
    cols = procedural_texture(gx, gy)
    pts = [np.stack([gx, gy, gz], -1)]
    cs = [cols]
    if spheres is not None:
        for (cx_, cy_, cz_, rad), col in zip(np.asarray(spheres), np.asarray(sphere_colors)):
            v = rng.normal(size=(n_per_sphere, 3))
            v /= np.linalg.norm(v, axis=-1, keepdims=True)
            pts.append(np.array([cx_, cy_, cz_]) + rad * v)
            cs.append(np.tile(np.asarray(col, np.float64)[None], (n_per_sphere, 1)))
    return (
        np.concatenate(pts).astype(np.float32),
        np.clip(np.concatenate(cs), 0, 1).astype(np.float32),
    )


def write_analytic_colmap_scene(
    root: str,
    cams,
    spheres: np.ndarray = None,
    sphere_colors: np.ndarray = None,
    extent_xy: float = 12.0,
    n_points: int = 12_000,
    seed: int = 0,
):
    """COLMAP-layout dataset whose GT images are the ANALYTIC ray-cast scene
    (render_analytic_scene) — ground truth outside the gaussian model class,
    so quality numbers measure reconstruction, not self-fitting (the
    realizable-GT variant below fits exactly by construction). Sparse points
    come from analytic_init_points (noisy ground/sphere samples standing in
    for triangulation)."""
    import os

    from PIL import Image

    from hidegs_tpu.core.transforms import rotmat_to_quat
    from hidegs_tpu.data import colmap

    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    H, W = cams[0].height, cams[0].width
    ccams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H,
        np.array([float(cams[0].fx), float(cams[0].fy), W / 2, H / 2]))}
    imgs = {}
    for i, cam in enumerate(cams, start=1):
        img = render_analytic_scene(cam, spheres, sphere_colors)
        name = f"v{i:04d}.png"
        Image.fromarray(
            (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(root, "images", name))
        q = np.asarray(rotmat_to_quat(jnp.asarray(np.asarray(cam.R)[None])))[0]
        imgs[i] = colmap.ColmapImage(
            i, q.astype(np.float64), np.asarray(cam.t, np.float64), 1, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64))
    pts, cols = analytic_init_points(
        n_points, extent_xy, spheres, sphere_colors, seed=seed
    )
    colmap.write_cameras_binary(ccams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(root, "sparse/0/images.bin"))
    colmap.write_points3d_binary(
        pts.astype(np.float64), (cols * 255).astype(np.uint8),
        os.path.join(root, "sparse/0/points3D.bin"))
    return root


def write_synthetic_colmap_scene(
    root: str,
    scene: ToyScene,
    cams,
    render_config=None,
    point_stride: int = 4,
    jitter_points: float = 0.0,
    seed: int = 0,
):
    """Render `scene` from `cams` and write a COLMAP-layout dataset
    (sparse/0/*.bin + images/*.png) usable by the trainer CLI, the pipeline
    driver, and evaluate.py. `point_stride` thins the gaussian centers into
    the sparse point cloud (COLMAP sparse points are far sparser than the
    final model); `jitter_points` adds noise like real triangulation error."""
    import os

    from PIL import Image

    from hidegs_tpu.core.sh import sh_dc_to_rgb
    from hidegs_tpu.core.transforms import rotmat_to_quat
    from hidegs_tpu.data import colmap
    from hidegs_tpu.raster.api import RasterConfig, render

    if render_config is None:
        render_config = RasterConfig(backend="jnp", max_instances=1 << 18)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    H, W = cams[0].height, cams[0].width
    ccams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H,
        np.array([float(cams[0].fx), float(cams[0].fy), W / 2, H / 2]))}
    imgs = {}
    for i, cam in enumerate(cams, start=1):
        out = render(*scene, cam, config=render_config)
        img = np.clip(np.asarray(out["render"]).transpose(1, 2, 0), 0, 1)
        name = f"v{i:04d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "images", name))
        q = np.asarray(rotmat_to_quat(jnp.asarray(np.asarray(cam.R)[None])))[0]
        imgs[i] = colmap.ColmapImage(
            i, q.astype(np.float64), np.asarray(cam.t, np.float64), 1, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64))

    rng = np.random.default_rng(seed)
    pts = np.asarray(scene.means3d)[::point_stride].astype(np.float64)
    if jitter_points:
        pts = pts + rng.normal(0, jitter_points, pts.shape)
    cols = np.clip(np.asarray(sh_dc_to_rgb(scene.shs[::point_stride, 0, :])), 0, 1)
    colmap.write_cameras_binary(ccams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(root, "sparse/0/images.bin"))
    colmap.write_points3d_binary(
        pts, (cols * 255).astype(np.uint8), os.path.join(root, "sparse/0/points3D.bin"))
    return root


# --------------------------------------------------------------------------
# Realistic-image benchmark scene (VERDICT r3 item 1): a textured HEIGHT
# FIELD rendered with view-dependent lighting, plus synthetic monodepth with
# realistic error statistics and COLMAP-style noisy sparse points. Unlike
# the plane+spheres analytic scene, this workload carries the error modes
# the HiDeGS-specific losses exist for: parallax-dependent shading (multi-
# view NCC), smooth monodepth bias (depth reliability + multi-view geo),
# sharp texture over smooth geometry (frequency regularizer).
# --------------------------------------------------------------------------


def _value_noise(u, v, cell, seed=0):
    """Deterministic bilinear value noise on a lattice of size `cell`."""

    def hash01(ix, iy):
        h = (
            ix.astype(np.int64) * 374761393
            + iy.astype(np.int64) * 668265263
            + np.int64(seed) * 97002337
        ) % 2147483647
        h = (h ^ (h >> 13)) * 1274126177 % 2147483647
        return (h % 65536).astype(np.float64) / 65536.0

    gu, gv = u / cell, v / cell
    iu, iv = np.floor(gu), np.floor(gv)
    fu, fv = gu - iu, gv - iv
    fu = fu * fu * (3 - 2 * fu)  # smoothstep → C1 height field
    fv = fv * fv * (3 - 2 * fv)
    return (
        hash01(iu, iv) * (1 - fu) * (1 - fv)
        + hash01(iu + 1, iv) * fu * (1 - fv)
        + hash01(iu, iv + 1) * (1 - fu) * fv
        + hash01(iu + 1, iv + 1) * fu * fv
    )


def terrain_height(u, v, hmax: float = 2.4, seed: int = 0):
    """Smooth multi-octave height field h(u, v) ≥ 0 (+z up)."""
    h = (
        0.50 * _value_noise(u, v, 9.0, seed)
        + 0.30 * _value_noise(u, v, 3.7, seed + 1)
        + 0.14 * _value_noise(u, v, 1.6, seed + 2)
        + 0.06 * _value_noise(u, v, 0.7, seed + 3)
    )
    # gentle large-scale swell so oblique rays see silhouettes
    h = h + 0.18 * (1 + np.sin(0.21 * u + 0.8) * np.cos(0.17 * v - 0.4)) / 2
    return hmax * h


def _terrain_normal(u, v, hmax, seed, eps=0.05):
    hx = (terrain_height(u + eps, v, hmax, seed) - terrain_height(u - eps, v, hmax, seed)) / (2 * eps)
    hy = (terrain_height(u, v + eps, hmax, seed) - terrain_height(u, v - eps, hmax, seed)) / (2 * eps)
    n = np.stack([-hx, -hy, np.ones_like(hx)], axis=-1)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def render_terrain_scene(
    cam: CameraParams,
    extent_xy: float = 12.0,
    hmax: float = 2.4,
    seed: int = 0,
    sun=(0.45, 0.35, 0.80),
    sky=(0.70, 0.80, 0.95),
    n_steps: int = 160,
    n_bisect: int = 12,
):
    """Ray-marched render of the textured height field with Lambert + Blinn-
    Phong (view-dependent) shading. Returns ((3, H, W) image in [0, 1],
    (H, W) ray-hit distance with inf for sky)."""
    import jax

    H, W = cam.height, cam.width
    R_, t_, cx_, cy_, fx_, fy_ = jax.device_get(
        (cam.R, cam.t, cam.cx, cam.cy, cam.fx, cam.fy)
    )
    R = np.asarray(R_, np.float64)
    t = np.asarray(t_, np.float64)
    origin = -R.T @ t
    xs = (np.arange(W) + 0.5 - float(cx_)) / float(fx_)
    ys = (np.arange(H) + 0.5 - float(cy_)) / float(fy_)
    dx, dy = np.meshgrid(xs, ys)
    d = np.stack([dx, dy, np.ones_like(dx)], axis=-1) @ R
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dz = d[..., 2]

    # march only descending rays, from just below the camera to the z=0 crossing
    desc = dz < -1e-4
    t_lo = np.where(desc, np.maximum((origin[2] - hmax) / -np.where(desc, dz, -1.0), 0.3), 0.3)
    t_hi = np.where(desc, (origin[2] - 0.0) / -np.where(desc, dz, -1.0) + 1.0, 1.0)

    hit_t = np.full((H, W), np.inf)
    prev_above = np.ones((H, W), bool)
    prev_t = t_lo.copy()
    for s in range(n_steps):
        tt = t_lo + (t_hi - t_lo) * (s / (n_steps - 1))
        px = origin[0] + tt * d[..., 0]
        py = origin[1] + tt * d[..., 1]
        pz = origin[2] + tt * dz
        above = pz > terrain_height(px, py, hmax, seed)
        crossed = prev_above & ~above & desc & ~np.isfinite(hit_t)
        # bracket [prev_t, tt] for newly crossed rays
        if crossed.any():
            a = np.where(crossed, prev_t, 0.0)
            b = np.where(crossed, tt, 1.0)
            for _ in range(n_bisect):
                m = 0.5 * (a + b)
                mx = origin[0] + m * d[..., 0]
                my = origin[1] + m * d[..., 1]
                mz = origin[2] + m * dz
                mabove = mz > terrain_height(mx, my, hmax, seed)
                a = np.where(mabove, m, a)
                b = np.where(mabove, b, m)
            hit_t = np.where(crossed, 0.5 * (a + b), hit_t)
        prev_above = above
        prev_t = tt
    hit = np.isfinite(hit_t)

    th = np.where(hit, hit_t, 1.0)
    pu = origin[0] + th * d[..., 0]
    pv = origin[1] + th * d[..., 1]
    albedo = procedural_texture(pu, pv)
    n = _terrain_normal(pu, pv, hmax, seed)
    # slope-tinted albedo (rockier on steep faces) — more texture variety
    slope = np.clip(1.0 - n[..., 2], 0.0, 1.0)
    albedo = albedo * (1.0 - 0.5 * slope[..., None]) + 0.5 * slope[..., None] * np.array([0.45, 0.40, 0.36])

    sund = np.asarray(sun, np.float64)
    sund /= np.linalg.norm(sund)
    lam = np.clip(np.einsum("hwc,c->hw", n, sund), 0.0, 1.0)
    # Blinn-Phong specular: view direction makes shading VIEW-DEPENDENT —
    # the same surface point changes appearance across cameras, which is the
    # photometric inconsistency the LNCC multi-view term is built for
    view = -d
    half = view + sund[None, None]
    half /= np.linalg.norm(half, axis=-1, keepdims=True) + 1e-9
    spec = np.clip(np.einsum("hwc,c->hw", n, sund) > 0, 0, 1) * (
        np.clip(np.einsum("hwc,hwc->hw", n, half), 0.0, 1.0) ** 32
    )
    shaded = albedo * (0.30 + 0.70 * lam)[..., None] + 0.18 * spec[..., None]

    # sky gradient for non-hit rays
    skyc = np.asarray(sky, np.float64)[None, None] * (
        0.85 + 0.15 * np.clip(dz, 0, 1)[..., None]
    )
    color = np.where(hit[..., None], shaded, skyc)
    return (
        np.transpose(np.clip(color, 0, 1), (2, 0, 1)).astype(np.float32),
        np.where(hit, hit_t, np.inf).astype(np.float32),
    )


def synthetic_monodepth(
    ray_depth: np.ndarray,  # (H, W) hit distance, inf = sky
    seed: int = 0,
    rel_err: float = 0.04,
    hole_frac: float = 0.01,
):
    """Corrupt true inverse depth the way a monodepth net fails: an unknown
    per-image affine (scale, offset), a SMOOTH low-frequency multiplicative
    error field (rel_err amplitude), and holes. Returns (uint16 png array,
    depth_params {scale, offset} that map png/65535 back to scene inverse
    depth up to the smooth error — exactly what make_depth_scale's robust
    fit would recover from COLMAP sparse depth)."""
    rng = np.random.default_rng(seed)
    H, W = ray_depth.shape
    inv = np.where(np.isfinite(ray_depth), 1.0 / np.maximum(ray_depth, 1e-6), 0.0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    err = rel_err * _value_noise(
        xx / W * 6.0, yy / H * 6.0, 1.0, seed=seed + 11
    )
    err = 2.0 * (err / rel_err - 0.5) * rel_err  # [-rel_err, rel_err]
    inv_md = inv * (1.0 + err)
    # unknown per-image affine the depth_params must undo
    alpha = float(rng.uniform(0.6, 1.6))
    beta = float(rng.uniform(0.02, 0.1))
    raw = alpha * inv_md + beta
    raw[inv <= 0] = 0.0  # sky: no monodepth sample
    # random hole blotches (failed predictions)
    n_holes = max(int(hole_frac * H * W / 64), 1)
    for _ in range(n_holes):
        hy, hx = rng.integers(0, H), rng.integers(0, W)
        r = int(rng.integers(3, 9))
        raw[max(hy - r, 0):hy + r, max(hx - r, 0):hx + r] = 0.0
    mx = raw.max()
    png = np.clip(raw / max(mx, 1e-9) * 65535.0, 0, 65535).astype(np.uint16)
    # the loader first normalizes png→[0,1]: png/65535 = raw/mx, so
    # (png/65535)·(mx/α) − β/α = inv_md — the affine make_depth_scale's
    # robust fit would recover; the smooth `err` field remains as the
    # realistic residual the multi-view terms must handle
    params = {"scale": mx / alpha, "offset": -beta / alpha}
    return png, params


def write_terrain_colmap_scene(
    root: str,
    cams,
    extent_xy: float = 12.0,
    hmax: float = 2.4,
    n_points: int = 16_000,
    seed: int = 0,
    point_noise: float = 0.04,
    outlier_frac: float = 0.01,
    depth_rel_err: float = 0.04,
):
    """COLMAP-layout dataset for the realistic benchmark: ray-marched GT
    images, 16-bit monodepth pngs + sparse/0/depth_params.json, and noisy
    sparse points (triangulation noise ∝ depth + gross outliers)."""
    import os

    from PIL import Image

    from hidegs_tpu.core.transforms import rotmat_to_quat
    from hidegs_tpu.data import colmap

    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "depths"), exist_ok=True)
    H, W = cams[0].height, cams[0].width
    ccams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H,
        np.array([float(cams[0].fx), float(cams[0].fy), W / 2, H / 2]))}
    imgs = {}
    depth_params = {}
    for i, cam in enumerate(cams, start=1):
        img, ray_depth = render_terrain_scene(
            cam, extent_xy=extent_xy, hmax=hmax, seed=seed
        )
        name = f"v{i:04d}"
        Image.fromarray(
            (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(root, "images", name + ".png"))
        png, params = synthetic_monodepth(
            ray_depth, seed=seed + i, rel_err=depth_rel_err
        )
        Image.fromarray(png).save(os.path.join(root, "depths", name + ".png"))
        depth_params[name] = params
        q = np.asarray(rotmat_to_quat(jnp.asarray(np.asarray(cam.R)[None])))[0]
        imgs[i] = colmap.ColmapImage(
            i, q.astype(np.float64), np.asarray(cam.t, np.float64), 1,
            name + ".png", np.zeros((0, 2)), np.zeros((0,), np.int64))

    # sparse points: surface samples with depth-proportional noise + outliers
    rng = np.random.default_rng(seed + 999)
    gx = rng.uniform(-extent_xy, extent_xy, n_points)
    gy = rng.uniform(-extent_xy, extent_xy, n_points)
    gz = terrain_height(gx, gy, hmax, seed)
    noise = rng.normal(0.0, point_noise, (n_points, 3))
    pts = np.stack([gx, gy, gz], -1) + noise
    n_out = int(outlier_frac * n_points)
    if n_out:
        idx = rng.choice(n_points, n_out, replace=False)
        pts[idx, 2] += rng.uniform(1.0, 6.0, n_out)  # floaters
    cols = procedural_texture(pts[:, 0], pts[:, 1])
    cols = np.clip(cols + rng.normal(0, 0.05, cols.shape), 0, 1)

    import json

    colmap.write_cameras_binary(ccams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(root, "sparse/0/images.bin"))
    colmap.write_points3d_binary(
        pts.astype(np.float64), (cols * 255).astype(np.uint8),
        os.path.join(root, "sparse/0/points3D.bin"))
    with open(os.path.join(root, "sparse/0/depth_params.json"), "w") as f:
        json.dump(depth_params, f)
    return root
