"""Packed storage, scaffold loading, prepend_raw_points."""
import numpy as np
import pytest

from hidegs_tpu.model.gaussians import init_from_points, prepend_raw_points
from hidegs_tpu.utils import storage


def test_packed_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arrays = {
        "xyz": rng.randn(100, 3).astype(np.float32),
        "opacity": rng.randn(100).astype(np.float32),
        "ids": rng.randint(0, 10, 100).astype(np.int32),
    }
    p = str(tmp_path / "pc.bin")
    storage.save_packed(p, arrays)
    back = storage.load_packed(p)
    for k in arrays:
        np.testing.assert_array_equal(back[k], arrays[k])


def test_save_model_dir_writes_pc_info(tmp_path):
    import jax

    st = init_from_points(
        np.random.RandomState(1).randn(20, 3).astype(np.float32),
        np.random.RandomState(2).rand(20, 3).astype(np.float32),
        capacity=32,
    )
    storage.save_model_dir(str(tmp_path), st, skybox_count=5)
    assert (tmp_path / "point_cloud.ply").exists()
    assert (tmp_path / "pc_info.txt").read_text().strip() == "5"


def test_scaffold_annulus_selection(tmp_path):
    from hidegs_tpu.utils.ply import gaussian_properties, write_ply

    rng = np.random.RandomState(3)
    n = 400
    xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    props = gaussian_properties(
        xyz, rng.randn(n, 3).astype(np.float32), rng.randn(n, 15, 3).astype(np.float32),
        rng.randn(n).astype(np.float32), rng.randn(n, 3).astype(np.float32),
        rng.randn(n, 4).astype(np.float32),
    )
    write_ply(str(tmp_path / "point_cloud.ply"), props)
    (tmp_path / "pc_info.txt").write_text("0\n")
    center = np.zeros(3)
    extent = np.array([20.0, 20.0, 20.0])
    sel = storage.load_scaffold(str(tmp_path), center, extent)
    cheb = np.maximum(np.abs(sel["xyz"][:, 0]), np.abs(sel["xyz"][:, 1]))
    assert len(sel["xyz"]) > 0
    assert (cheb > 10.0).all() and (cheb < 30.0).all()


def test_prepend_raw_points_protected():
    st = init_from_points(
        np.random.RandomState(4).randn(10, 3).astype(np.float32),
        np.random.RandomState(5).rand(10, 3).astype(np.float32),
        capacity=32,
    )
    raw = {
        "xyz": np.ones((4, 3), np.float32),
        "sh_dc": np.zeros((4, 3), np.float32),
        "sh_rest": np.zeros((4, 15, 3), np.float32),
        "scaling": np.full((4, 3), -2.0, np.float32),
        "rotation": np.tile(np.array([1, 0, 0, 0], np.float32), (4, 1)),
        "opacity": np.full((4,), 2.0, np.float32),
    }
    st2 = prepend_raw_points(st, raw)
    assert int(st2.alive.sum()) == 14
    assert int(st2.protected.sum()) == 4
    # scaffold occupies the buffer tail
    assert bool(st2.alive[-4:].all())
    np.testing.assert_allclose(np.asarray(st2.params.xyz[-4:]), 1.0)
    # overflow raises
    raw_big = {k: np.repeat(v, 10, axis=0) for k, v in raw.items()}
    with pytest.raises(ValueError):
        prepend_raw_points(st2, raw_big)
