"""Data layer: COLMAP IO roundtrip, scene readers, neighbor graph, PLY IO."""
import json
import os

import numpy as np
import pytest

from hidegs_tpu.data import colmap
from hidegs_tpu.data.cameras import CameraInfo, resolution_policy
from hidegs_tpu.data.readers import get_nerfpp_norm, load_colmap_scene
from hidegs_tpu.data.scene import multi_view_neighbors
from hidegs_tpu.utils import ply


def make_colmap_dir(tmp_path, n_cams=6, n_pts=50):
    rng = np.random.RandomState(0)
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))
    }
    imgs = {}
    for i in range(1, n_cams + 1):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        imgs[i] = colmap.ColmapImage(
            i, q, rng.randn(3), 1, f"img_{i:03d}.jpg",
            rng.rand(3, 2) * 100, np.array([0, 1, 2], np.int64),
        )
    xyz = rng.randn(n_pts, 3)
    rgb = (rng.rand(n_pts, 3) * 255).astype(np.uint8)
    colmap.write_cameras_binary(cams, str(sparse / "cameras.bin"))
    colmap.write_images_binary(imgs, str(sparse / "images.bin"))
    colmap.write_points3d_binary(xyz, rgb, str(sparse / "points3D.bin"))
    (tmp_path / "images").mkdir()
    return cams, imgs, xyz, rgb


def test_colmap_binary_roundtrip(tmp_path):
    cams, imgs, xyz, rgb = make_colmap_dir(tmp_path)
    sparse = str(tmp_path / "sparse" / "0")
    cams2 = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    imgs2 = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    xyz2, rgb2, err2, ids2 = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(imgs2[i].tvec, imgs[i].tvec)
        assert imgs2[i].name == imgs[i].name
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_load_colmap_scene_split(tmp_path):
    make_colmap_dir(tmp_path)
    info = load_colmap_scene(str(tmp_path), eval_split=True, llffhold=3)
    assert len(info.train_cameras) == 4
    assert len(info.test_cameras) == 2
    assert info.points.shape == (50, 3)
    assert info.nerf_norm_radius > 0
    # PINHOLE intrinsics parsed with principal point
    c = info.train_cameras[0]
    assert c.fx == 500.0 and c.cx == 320.0


def test_nerfpp_norm():
    infos = [
        CameraInfo(i, np.eye(3), np.array([x, 0, 0]), 1, 1, 0, 0, 10, 10, "", "")
        for i, x in enumerate([-1.0, 1.0])
    ]
    radius, center = get_nerfpp_norm(infos)
    np.testing.assert_allclose(center, [0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(radius, 1.1)


def test_multi_view_neighbors():
    # cameras on a line looking the same way: all mutually valid within dist
    infos = [
        CameraInfo(i, np.eye(3), np.array([-(i * 0.5), 0, 0]), 1, 1, 0, 0, 10, 10, "", "")
        for i in range(5)
    ]
    g = multi_view_neighbors(infos, num_neighbors=2, scene_radius=1.0, max_dis=2.0)
    assert g[0] == [1, 2]  # nearest two
    assert g[2] == [1, 3] or g[2] == [3, 1]
    # opposite-facing camera excluded by angle
    R_flip = np.diag([1.0, -1.0, -1.0])
    infos2 = infos[:2] + [
        CameraInfo(9, R_flip, np.array([0.25, 0, 0]), 1, 1, 0, 0, 10, 10, "", "")
    ]
    g2 = multi_view_neighbors(infos2, num_neighbors=3, scene_radius=1.0)
    assert 2 not in g2[0]


def test_resolution_policy():
    assert resolution_policy(3200, 2400, -1) == (1600, 1200, 2.0)
    assert resolution_policy(800, 600, -1) == (800, 600, 1.0)
    assert resolution_policy(800, 600, 2) == (400, 300, 2.0)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    props = {
        "x": rng.randn(10).astype(np.float32),
        "y": rng.randn(10).astype(np.float32),
        "red": (rng.rand(10) * 255).astype(np.uint8),
    }
    p = str(tmp_path / "test.ply")
    ply.write_ply(p, props)
    back = ply.read_ply(p)
    np.testing.assert_allclose(back["x"], props["x"])
    np.testing.assert_array_equal(back["red"], props["red"])


def test_gaussian_ply_roundtrip(tmp_path):
    import jax

    from hidegs_tpu.model.gaussians import init_from_points

    rng = np.random.RandomState(2)
    pts = rng.randn(20, 3).astype(np.float32)
    cols = rng.rand(20, 3).astype(np.float32)
    st = init_from_points(pts, cols, capacity=32)
    p = str(tmp_path / "gs.ply")
    ply.save_gaussian_ply(p, st)
    back = ply.load_gaussian_arrays(p)
    assert back["xyz"].shape == (20, 3)
    np.testing.assert_allclose(back["xyz"], pts, rtol=1e-6)
    np.testing.assert_allclose(back["sh_dc"], np.asarray(st.params.sh_dc)[:20], rtol=1e-6)
    np.testing.assert_allclose(back["scaling"], np.asarray(st.params.scaling)[:20], rtol=1e-6)
    assert back["sh_rest"].shape == (20, 15, 3)


def test_images_text_with_empty_points_line(tmp_path):
    """COLMAP text images with zero POINTS2D have an EMPTY second line; the
    parser must keep pairing headers and points correctly."""
    txt = (
        "# comment\n"
        "1 1 0 0 0 0.5 0.5 0.5 1 a.png\n"
        "\n"  # image 1 has no points
        "2 1 0 0 0 1.5 1.5 1.5 1 b.png\n"
        "10.0 20.0 7 30.0 40.0 8\n"
    )
    p = tmp_path / "images.txt"
    p.write_text(txt)
    imgs = colmap.read_images_text(str(p))
    assert set(imgs) == {1, 2}
    assert len(imgs[1].xys) == 0
    assert imgs[2].name == "b.png"
    np.testing.assert_allclose(imgs[2].xys, [[10.0, 20.0], [30.0, 40.0]])
    np.testing.assert_array_equal(imgs[2].point3d_ids, [7, 8])


def test_camera_loading_with_depth_and_mask(tmp_path):
    """Full loadCam path: image + 16-bit inverse-depth png + alpha mask +
    depth_params scaling and reliability gating (scene/cameras.py:101-119)."""
    import numpy as np
    from PIL import Image

    from hidegs_tpu.data.cameras import CameraInfo, load_camera

    rng = np.random.RandomState(0)
    img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "im.png")
    inv16 = (rng.rand(24, 32) * 65535).astype(np.uint16)
    Image.fromarray(inv16, mode="I;16").save(tmp_path / "im_depth.png")
    mask = np.zeros((24, 32), np.uint8)
    mask[:, 16:] = 255
    Image.fromarray(mask).save(tmp_path / "im_mask.png")

    info = CameraInfo(
        uid=1, R=np.eye(3), t=np.zeros(3), fx=30, fy=30, cx=16, cy=12,
        width=32, height=24,
        image_path=str(tmp_path / "im.png"), image_name="im.png",
        depth_path=str(tmp_path / "im_depth.png"),
        depth_params={"scale": 2.0, "offset": 0.1, "med_scale": 2.0},
        mask_path=str(tmp_path / "im_mask.png"),
    )
    cam = load_camera(info)
    assert cam.image.shape == (3, 24, 32)
    assert cam.invdepth is not None and cam.invdepth.shape == (24, 32)
    # scaled: inv/65535*2 + 0.1 ∈ [0.1, 2.1]
    assert cam.invdepth.min() >= 0.1 - 1e-5 and cam.invdepth.max() <= 2.1 + 1e-5
    assert cam.depth_reliable
    assert cam.alpha_mask is not None
    np.testing.assert_array_equal(cam.alpha_mask[:, :16], 0.0)
    np.testing.assert_array_equal(cam.alpha_mask[:, 16:], 1.0)

    # unreliable when per-image scale is far from the scene median
    info_bad = CameraInfo(
        uid=2, R=np.eye(3), t=np.zeros(3), fx=30, fy=30, cx=16, cy=12,
        width=32, height=24,
        image_path=str(tmp_path / "im.png"), image_name="im.png",
        depth_path=str(tmp_path / "im_depth.png"),
        depth_params={"scale": 100.0, "offset": 0.0, "med_scale": 2.0},
    )
    cam_bad = load_camera(info_bad)
    assert not cam_bad.depth_reliable
