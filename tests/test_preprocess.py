"""Preprocess pipeline: chunking, depth-scale fit, reorientation, merger."""
import numpy as np
import pytest

from hidegs_tpu.data import colmap
from hidegs_tpu.preprocess import chunking, depth_scale, reorient


def grid_scene(n_side=6, spacing=10.0, n_pts=200):
    """Cameras on an XY grid looking down +z; points below them."""
    rng = np.random.RandomState(0)
    imgs = {}
    k = 1
    for i in range(n_side):
        for j in range(n_side):
            center = np.array([i * spacing, j * spacing, 0.0])
            R = np.eye(3)
            t = -R @ center
            imgs[k] = colmap.ColmapImage(
                k, np.array([1.0, 0, 0, 0]), t, 1, f"im_{k:03d}.png",
                np.zeros((0, 2)), np.zeros((0,), np.int64),
            )
            k += 1
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48, np.array([50.0, 50.0, 32.0, 24.0]))}
    xyz = rng.rand(n_pts, 3) * np.array([n_side * spacing, n_side * spacing, 5.0])
    rgb = (rng.rand(n_pts, 3) * 255).astype(np.uint8)
    err = rng.rand(n_pts)
    return cams, imgs, xyz, rgb, err


def test_chunking_grid():
    cams, imgs, xyz, rgb, err = grid_scene()
    chunks = chunking.compute_chunks(
        cams, imgs, xyz, err, chunk_size=30.0, min_n_cams=4, add_far_cams=False
    )
    assert len(chunks) >= 4
    all_cams = set()
    for ch in chunks:
        assert len(ch.camera_ids) >= 4
        all_cams |= set(ch.camera_ids)
    assert len(all_cams) == len(imgs)  # every camera in some chunk
    # points of retained chunks stay within their cells; coverage is partial
    # because under-populated edge chunks are dropped (reference behavior:
    # make_chunk.py min_n_cams)
    total = np.zeros(len(xyz[err < 10]), bool)
    for ch in chunks:
        total |= ch.point_mask
    assert total.mean() > 0.5


def test_write_chunks(tmp_path):
    cams, imgs, xyz, rgb, err = grid_scene()
    chunks = chunking.compute_chunks(
        cams, imgs, xyz, err, chunk_size=30.0, min_n_cams=4, add_far_cams=False
    )
    chunking.write_chunks(chunks, cams, imgs, xyz, rgb, err, str(tmp_path))
    assert (tmp_path / "chunks.txt").exists()
    d = tmp_path / f"chunk_{chunks[0].i}_{chunks[0].j}"
    assert (d / "sparse" / "0" / "images.bin").exists()
    assert (d / "center.txt").exists()
    # chunk model loads back
    cams2, imgs2, pts2 = (
        colmap.read_cameras_binary(str(d / "sparse/0/cameras.bin")),
        colmap.read_images_binary(str(d / "sparse/0/images.bin")),
        colmap.read_points3d_binary(str(d / "sparse/0/points3D.bin")),
    )
    assert len(imgs2) == len(chunks[0].camera_ids)


def test_depth_scale_fit_recovers_known_transform():
    # construct a camera viewing known points; mono = (colmap_inv - off)/s
    rng = np.random.RandomState(1)
    n = 100
    t = np.zeros(3)
    fx = fy = 60.0
    cx, cy = 32.0, 24.0
    H, W = 48, 64
    true_scale, true_offset = 0.05, 0.1
    # dense smooth inverse-mono map; colmap depths derived to match it exactly
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    mono = (0.2 + 0.004 * uu + 0.006 * vv).astype(np.float32)
    uv = np.stack([rng.uniform(2, W - 3, n), rng.uniform(2, H - 3, n)], -1)
    xi, yi = uv[:, 0].astype(int), uv[:, 1].astype(int)
    inv_mono_at_pts = mono[yi, xi]
    # cv2.remap convention: coordinates ARE array indices (no half-center)
    uv = np.stack([xi, yi], -1).astype(np.float64)
    inv_colmap = inv_mono_at_pts * true_scale + true_offset
    z = 1.0 / inv_colmap
    pts = np.stack([(uv[:, 0] - cx) / fx * z, (uv[:, 1] - cy) / fy * z, z], -1)

    img = colmap.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), t, 1, "a.png", uv, np.arange(len(pts), dtype=np.int64)
    )
    cam = colmap.ColmapCamera(1, "PINHOLE", W, H, np.array([fx, fy, cx, cy]))
    ordered = np.zeros((len(pts) + 1, 3))
    ordered[: len(pts)] = pts
    fit = depth_scale.fit_image_depth_scale(img, cam, ordered, mono)
    assert fit is not None
    assert abs(fit["scale"] - true_scale) / true_scale < 0.2
    assert abs(fit["offset"] - true_offset) < 0.05


def test_reorientation_aligns_plane():
    rng = np.random.RandomState(2)
    # cameras on a tilted plane
    n_vec = np.array([0.3, -0.9, 0.3])
    n_vec /= np.linalg.norm(n_vec)
    basis = np.linalg.svd(n_vec[None])[2][1:]
    coords = rng.rand(50, 2) * 10
    centers = coords @ basis + 0.01 * rng.randn(50, 3)
    R = reorient.reorientation_matrix(centers)
    rotated = centers @ R.T
    # after rotation the plane normal is ±y → y-extent tiny
    assert np.ptp(rotated[:, 1]) < 0.1 * np.ptp(rotated[:, 0])


def test_drop_outlier_cameras():
    cams, imgs, xyz, rgb, err = grid_scene(n_side=3)
    far = colmap.ColmapImage(
        99, np.array([1.0, 0, 0, 0]), np.array([-1e4, -1e4, 0.0]), 1, "far.png",
        np.zeros((0, 2)), np.zeros((0,), np.int64),
    )
    imgs[99] = far
    kept = reorient.drop_outlier_cameras(imgs)
    assert 99 not in kept
    assert len(kept) == len(imgs) - 1


def test_merge_hierarchies():
    from hidegs_tpu.data.synthetic import make_toy_gaussians
    from hidegs_tpu.hier.build import _build_hierarchy_py
    from hidegs_tpu.hier.merge import merge_hierarchies

    hs, centers, extents = [], [], []
    for k, off in enumerate([(-3.0, 0, 0), (3.0, 0, 0)]):
        s = make_toy_gaussians(24, seed=k, extent=1.5)
        pos = np.asarray(s.means3d) + np.array(off)
        h = _build_hierarchy_py(
            pos, np.asarray(s.quats), np.asarray(s.scales),
            np.asarray(s.opacities), np.asarray(s.shs),
        )
        hs.append(h)
        centers.append(np.array(off))
        extents.append(np.array([6.0, 6.0, 6.0]))
    merged = merge_hierarchies(hs, centers, extents)
    assert merged.num_points == hs[0].num_points + hs[1].num_points + 1
    assert merged.num_nodes == hs[0].num_nodes + hs[1].num_nodes + 1
    # chunk roots point at the global root
    from hidegs_tpu.hier.io import COUNT_CHILDREN, PARENT

    assert merged.nodes[1, PARENT] == 0
    assert merged.nodes[1 + hs[0].num_nodes, PARENT] == 0
    assert merged.nodes[0, COUNT_CHILDREN] == 2
    # renders through the LOD path
    import jax.numpy as jnp

    from hidegs_tpu.data.synthetic import ring_camera
    from hidegs_tpu.hier.interp import render_hierarchy
    from hidegs_tpu.hier.lod import expand_to_size
    from hidegs_tpu.raster.api import RasterConfig

    cam = ring_camera(0, height=48, width=48, radius=10.0)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    cut = expand_to_size(
        jnp.asarray(merged.nodes), jnp.asarray(merged.boxes), 1e-9, vp,
        budget=128, num_points=merged.num_points,
    )
    out = render_hierarchy(
        cut, jnp.asarray(merged.pos), jnp.exp(jnp.asarray(merged.scale)),
        jnp.asarray(merged.rot), jnp.asarray(merged.alpha), jnp.asarray(merged.shs),
        cam, config=RasterConfig(backend="jnp", max_instances=1 << 13),
    )
    assert np.isfinite(np.asarray(out["render"])).all()


def test_knn_match_pairs():
    from hidegs_tpu.preprocess.colmap_driver import knn_match_pairs, write_match_list

    pos = {f"im{i}": np.array([i * 1.0, 0, 0]) for i in range(6)}
    pairs = knn_match_pairs(pos, k=2)
    assert ("im0", "im1") in pairs
    assert all(a < b for a, b in pairs)  # canonical order, no dupes
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "pairs.txt")
        write_match_list(pairs, p)
        assert len(open(p).readlines()) == len(pairs)


def test_mask_utilities(tmp_path):
    from PIL import Image

    from hidegs_tpu.preprocess.masks import (
        black_border_mask,
        normalize_mask,
        prepare_masks,
    )

    img = np.full((8, 8, 3), 128, np.uint8)
    img[:2, :] = 0  # black band
    m = black_border_mask(img)
    assert m.dtype == np.uint8
    assert (m[:2] == 0).all() and (m[2:] == 255).all()

    assert (normalize_mask(np.array([[True, False]])) == [[255, 0]]).all()
    assert (normalize_mask(np.array([[0.9, 0.1]], np.float32)) == [[255, 0]]).all()
    assert (normalize_mask(np.array([[60000, 10]], np.uint16)) == [[255, 0]]).all()

    (tmp_path / "images").mkdir()
    Image.fromarray(img).save(tmp_path / "images" / "a.png")
    n = prepare_masks(str(tmp_path / "images"), str(tmp_path / "masks"), from_black_border=True)
    assert n == 1
    out = np.asarray(Image.open(tmp_path / "masks" / "a.png"))
    assert (out[:2] == 0).all()


# ---------------------------------------------------------------------------
# Procrustes chunk re-alignment (transform_colmap equivalent)


def _make_colmap_model(root, R_list, t_list, pts, rgb):
    import os

    from hidegs_tpu.data import colmap
    from hidegs_tpu.hier.refine import _rotmat_to_quat_np

    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 64, np.array([60.0, 60.0, 32.0, 32.0]))}
    imgs = {}
    for i, (R, t) in enumerate(zip(R_list, t_list)):
        q = _rotmat_to_quat_np(R[None])[0]
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, q.astype(np.float64), np.asarray(t, np.float64), 1,
            f"im_{i:03d}.png", np.zeros((0, 2)), np.zeros((0,), np.int64),
        )
    colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(sparse, "images.bin"))
    colmap.write_points3d_binary(pts, rgb, os.path.join(sparse, "points3D.bin"))


def test_procrustes_recovers_sim3():
    from hidegs_tpu.preprocess.align import apply_sim3, procrustes

    rng = np.random.RandomState(0)
    X0 = rng.randn(50, 3)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    X1 = (X0 @ Q.T) * 2.5 + np.array([3.0, -1.0, 0.5])
    sim3 = procrustes(X0, X1)
    assert np.allclose(apply_sim3(sim3, X1), X0, atol=1e-6)


def test_align_chunk_end_to_end(tmp_path):
    from hidegs_tpu.data import colmap
    from hidegs_tpu.preprocess.align import align_chunk

    rng = np.random.RandomState(3)
    n_cams = 10
    # original (global-frame) chunk model
    centers = rng.randn(n_cams, 3) * 2.0
    R_list = []
    for _ in range(n_cams):
        Q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        R_list.append(Q)
    t_list = [-R @ c for R, c in zip(R_list, centers)]
    pts = rng.randn(40, 3)
    rgb = rng.randint(0, 255, (40, 3)).astype(np.uint8)

    in_dir = str(tmp_path / "orig")
    _make_colmap_model(in_dir, R_list, t_list, pts, rgb)
    with open(tmp_path / "orig" / "center.txt", "w") as f:
        f.write("0 0 0\n")
    with open(tmp_path / "orig" / "extent.txt", "w") as f:
        f.write("100 100 100\n")

    # refined model: same cameras/points expressed in a drifted sim3 frame
    Qd, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(Qd) < 0:
        Qd[:, 0] *= -1
    s_d, t_d = 1.7, np.array([5.0, 2.0, -3.0])
    centers_new = centers @ Qd.T * s_d + t_d
    pts_new = pts @ Qd.T * s_d + t_d
    R_new = [R @ Qd.T for R in R_list]
    t_new = [-R @ c for R, c in zip(R_new, centers_new)]

    new_dir = str(tmp_path / "refined")
    _make_colmap_model(new_dir, R_new, t_new, pts_new, rgb)

    out_dir = str(tmp_path / "aligned")
    info = align_chunk(in_dir, new_dir, out_dir)
    assert info["n_cams"] == n_cams
    assert info["n_points"] == 40

    out_imgs = colmap.read_images_binary(out_dir + "/sparse/0/images.bin")
    for i, c_true in enumerate(centers):
        im = out_imgs[i + 1]
        c = -colmap.qvec_to_rotmat(im.qvec).T @ im.tvec
        assert np.allclose(c, c_true, atol=1e-4), (i, c, c_true)
    xyz, _, _, _ = colmap.read_points3d_binary(out_dir + "/sparse/0/points3D.bin")
    assert np.allclose(xyz, pts, atol=1e-4)
