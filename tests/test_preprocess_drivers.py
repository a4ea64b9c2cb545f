"""Tests for the COLMAP database layer, the monodepth driver, and the
per-chunk refinement flow (with a stub `colmap` binary on PATH)."""
import json
import os
import stat
import sys

import numpy as np
import pytest

from tests.test_preprocess import _make_colmap_model


def _toy_model(tmp_path, n_cams=6, n_pts=25, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_cams, 3)
    R_list = []
    for _ in range(n_cams):
        Q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        R_list.append(Q)
    t_list = [-R @ c for R, c in zip(R_list, centers)]
    pts = rng.randn(n_pts, 3)
    rgb = rng.randint(0, 255, (n_pts, 3)).astype(np.uint8)
    _make_colmap_model(str(tmp_path), R_list, t_list, pts, rgb)
    return centers


# ----------------------------------------------------------------- database


def test_database_roundtrip(tmp_path):
    from hidegs_tpu.preprocess.database import (
        COLMAPDatabase,
        image_ids_to_pair_id,
        pair_id_to_image_ids,
    )

    db = COLMAPDatabase.connect(str(tmp_path / "test.db"))
    db.create_tables()
    cid = db.add_camera("PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))
    iid1 = db.add_image("a.png", cid, prior_q=np.array([1.0, 0, 0, 0]),
                        prior_t=np.zeros(3))
    iid2 = db.add_image("b.png", cid)
    db.add_keypoints(iid1, np.random.rand(10, 2).astype(np.float32))
    db.add_descriptors(iid1, np.random.randint(0, 255, (10, 128)).astype(np.uint8))
    matches = np.array([[0, 1], [2, 3]], np.uint32)
    db.add_matches(iid1, iid2, matches)
    db.add_two_view_geometry(iid1, iid2, matches)
    db.commit()

    cams = db.read_cameras()
    assert cams[cid].model == "PINHOLE" and cams[cid].width == 640
    assert np.allclose(cams[cid].params, [500.0, 500.0, 320.0, 240.0])
    imgs = db.read_images()
    assert imgs[iid1].name == "a.png" and imgs[iid2].camera_id == cid
    assert np.allclose(imgs[iid1].qvec, [1, 0, 0, 0])
    db.close()

    # pair-id packing convention (order-independent, reversible)
    pid = image_ids_to_pair_id(7, 3)
    assert pid == image_ids_to_pair_id(3, 7)
    assert pair_id_to_image_ids(pid) == (3, 7)


def test_fill_database_from_model(tmp_path):
    from hidegs_tpu.preprocess.database import COLMAPDatabase, fill_database_from_model

    _toy_model(tmp_path)
    db_path = str(tmp_path / "filled.db")
    fill_database_from_model(str(tmp_path / "sparse/0"), db_path)

    db = COLMAPDatabase.connect(db_path)
    cams = db.read_cameras()
    imgs = db.read_images()
    db.close()
    assert len(cams) == 1 and len(imgs) == 6
    # pose priors round-trip
    from hidegs_tpu.data.colmap import read_images_binary

    orig = read_images_binary(str(tmp_path / "sparse/0/images.bin"))
    for iid, im in orig.items():
        assert np.allclose(imgs[iid].qvec, im.qvec, atol=1e-12)
        assert np.allclose(imgs[iid].tvec, im.tvec, atol=1e-12)
        assert imgs[iid].name == im.name


# ---------------------------------------------------------------- monodepth


def test_generate_depth_maps_callable(tmp_path):
    from PIL import Image

    from hidegs_tpu.preprocess.monodepth import generate_depth_maps

    images = tmp_path / "images"
    images.mkdir()
    for i in range(3):
        arr = np.full((16, 20, 3), 40 * i + 10, np.uint8)
        Image.fromarray(arr).save(images / f"v{i}.jpg")

    # synthetic predictor: inverse depth = column ramp scaled by brightness
    def predictor(rgb):
        h, w, _ = rgb.shape
        return np.linspace(0.1, 1.0, w)[None, :] * (rgb.mean() + 0.5) * np.ones((h, 1))

    out = tmp_path / "depths"
    written = generate_depth_maps(str(images), str(out), predictor=predictor)
    assert len(written) == 3
    d = np.asarray(Image.open(written[0]))
    assert d.dtype == np.uint16 and d.shape == (16, 20)
    # normalization: ramp spans the full uint16 range, monotone along x
    assert d[:, 0].max() == 0 and d[:, -1].min() == 65535
    assert np.all(np.diff(d[0].astype(np.int64)) >= 0)


def test_generate_depth_maps_command_backend(tmp_path):
    from hidegs_tpu.preprocess.monodepth import generate_depth_maps

    images = tmp_path / "images"
    images.mkdir()
    marker = tmp_path / "ran.json"
    script = tmp_path / "fake_depth.py"
    script.write_text(
        "import json, sys\n"
        f"json.dump(sys.argv[1:], open({str(marker)!r}, 'w'))\n"
    )
    generate_depth_maps(
        str(images), str(tmp_path / "out"),
        command=[sys.executable, str(script), "--flag"],
    )
    argv = json.load(open(marker))
    assert argv == ["--flag", str(images), str(tmp_path / "out")]


@pytest.mark.slow
def test_generate_depth_no_predictor_errors(tmp_path):
    from hidegs_tpu.preprocess.monodepth import generate_depth_maps

    (tmp_path / "im").mkdir()
    with pytest.raises(RuntimeError, match="no monodepth predictor"):
        generate_depth_maps(
            str(tmp_path / "im"), str(tmp_path / "out"),
            model_name="nonexistent/model-that-is-not-cached",
        )


def test_depth_pipeline_consumes_generated_maps(tmp_path):
    """Generated 16-bit PNGs flow through depth_scale fitting + camera load."""
    from PIL import Image

    from hidegs_tpu.data.cameras import _load_invdepth
    from hidegs_tpu.preprocess.monodepth import generate_depth_maps

    images = tmp_path / "images"
    images.mkdir()
    Image.fromarray(np.zeros((12, 12, 3), np.uint8)).save(images / "a.png")

    rng = np.random.RandomState(1)
    true_inv = rng.rand(12, 12).astype(np.float32) * 0.8 + 0.1

    written = generate_depth_maps(
        str(images), str(tmp_path / "d"), predictor=lambda rgb: true_inv
    )
    mono = np.asarray(Image.open(written[0]), np.float32) / 65535.0
    # per-image (scale, offset) from sparse samples — what depth_scale's
    # robust fit produces on real data (here min-max undo is exactly linear)
    ys, xs = np.mgrid[2:12:3, 2:12:3]
    scale, offset = np.polyfit(
        mono[ys.ravel(), xs.ravel()], true_inv[ys.ravel(), xs.ravel()], 1
    )
    inv, reliable = _load_invdepth(
        written[0], 12, 12, {"scale": scale, "offset": offset, "med_scale": scale}
    )
    assert reliable
    assert np.allclose(inv, true_inv, atol=2e-3)


# -------------------------------------------------------------- chunk refine

STUB_COLMAP = """#!/usr/bin/env python3
import os, shutil, sys

sys.path.insert(0, {repo!r})
args = sys.argv[1:]
cmd = args[0]
opt = dict(zip(args[1::2], args[2::2]))
log = open(os.path.join({log_dir!r}, "colmap_calls.txt"), "a")
log.write(cmd + "\\n")
log.close()
if cmd == "image_undistorter":
    os.makedirs(os.path.join(opt["--output_path"], "images"), exist_ok=True)
elif cmd in ("point_triangulator", "bundle_adjuster"):
    inp, out = opt["--input_path"], opt["--output_path"]
    os.makedirs(out, exist_ok=True)
    for f in ("cameras.bin", "images.bin"):
        shutil.copy(os.path.join(inp, f), os.path.join(out, f))
    # triangulation "recovers" points
    import numpy as np
    from hidegs_tpu.data.colmap import write_points3d_binary
    rng = np.random.RandomState(0)
    write_points3d_binary(rng.randn(15, 3), rng.randint(0, 255, (15, 3)),
                          os.path.join(out, "points3D.bin"))
elif cmd in ("feature_extractor", "matches_importer"):
    pass
else:
    sys.exit("unexpected colmap command: " + cmd)
"""


def test_prepare_chunk_with_stub_colmap(tmp_path, monkeypatch):
    from hidegs_tpu.preprocess.chunk_refine import prepare_chunk

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "colmap"
    stub.write_text(STUB_COLMAP.format(repo=repo, log_dir=str(tmp_path)))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    raw = tmp_path / "chunk_raw"
    _toy_model(raw)
    (raw / "center.txt").write_text("0 0 0\n")
    (raw / "extent.txt").write_text("50 50 50\n")
    images_dir = tmp_path / "images"
    images_dir.mkdir()

    out = tmp_path / "chunk_out"
    stats = prepare_chunk(str(raw), str(out), str(images_dir))

    assert stats["n_cams"] == 6
    assert stats["n_points"] == 15
    assert os.path.exists(out / "sparse/0/images.bin")
    assert os.path.exists(out / "center.txt")
    calls = (tmp_path / "colmap_calls.txt").read_text().split()
    # full flow: undistort, extract, import, then 2x (triangulate + BA)
    assert calls == [
        "image_undistorter", "feature_extractor", "matches_importer",
        "point_triangulator", "bundle_adjuster",
        "point_triangulator", "bundle_adjuster",
    ]
    # the database was seeded with the chunk model
    from hidegs_tpu.preprocess.database import COLMAPDatabase

    db = COLMAPDatabase.connect(str(raw / "bundle_adjustment" / "database.db"))
    assert len(db.read_images()) == 6
    db.close()
    # the distance match list exists and pairs are image names
    pairs = (raw / "bundle_adjustment" / "matching_200.txt").read_text().strip()
    assert "im_000.png" in pairs


def test_prepare_chunk_skip_ba(tmp_path, monkeypatch):
    from hidegs_tpu.preprocess.chunk_refine import prepare_chunk

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "colmap"
    stub.write_text(STUB_COLMAP.format(repo=repo, log_dir=str(tmp_path)))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    raw = tmp_path / "chunk_raw"
    _toy_model(raw)
    images_dir = tmp_path / "images"
    images_dir.mkdir()
    stats = prepare_chunk(
        str(raw), str(tmp_path / "out"), str(images_dir),
        skip_bundle_adjustment=True,
    )
    assert stats["n_cams"] == 6
    calls = (tmp_path / "colmap_calls.txt").read_text().split()
    assert calls.count("bundle_adjuster") == 0
    assert calls.count("point_triangulator") == 1
    assert os.path.exists(raw / "bundle_adjustment" / "matching_50.txt")
