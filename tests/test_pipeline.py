"""End-to-end large-scene pipeline: chunk → train → hierarchy → merge → post-opt."""
import os

import numpy as np
import pytest

from hidegs_tpu.data import colmap
from hidegs_tpu.data.synthetic import make_toy_gaussians
from hidegs_tpu.raster.api import RasterConfig, render


@pytest.fixture(scope="module")
def two_cluster_scene(tmp_path_factory):
    """Synthetic scene with two spatial clusters of cameras + content so the
    chunker produces two chunks."""
    from PIL import Image

    from hidegs_tpu.core.camera_math import make_camera
    from hidegs_tpu.core.sh import sh_dc_to_rgb
    from hidegs_tpu.core.transforms import rotmat_to_quat

    root = tmp_path_factory.mktemp("bigscene")
    (root / "sparse" / "0").mkdir(parents=True)
    (root / "images").mkdir()

    H = W = 40
    cfg = RasterConfig(backend="jnp", max_instances=1 << 13)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", W, H, np.array([0.9 * W, 0.9 * W, W / 2, H / 2]))}
    imgs = {}
    all_pts, all_cols = [], []
    iid = 1
    for cx, seed in [(-10.0, 0), (10.0, 1)]:
        s = make_toy_gaussians(80, seed=seed, extent=2.0)
        pts = np.asarray(s.means3d) + np.array([cx, 0.0, 0.0])
        scene_arrays = (
            pts, np.asarray(s.scales), np.asarray(s.quats),
            np.asarray(s.opacities), np.asarray(s.shs),
        )
        # 5 cameras on a small ring around this cluster, in the XY plane so
        # the XY-grid chunker separates them
        for k in range(5):
            ang = 2 * np.pi * k / 5
            pos = np.array([cx + 4.0 * np.sin(ang), 4.0 * np.cos(ang), -7.0])
            fwd = np.array([cx, 0.0, 0.0]) - pos
            fwd = fwd / np.linalg.norm(fwd)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            R = np.stack([right, down, fwd])
            t = -R @ pos
            import jax.numpy as jnp

            cam = make_camera(R, t, fx=0.9 * W, fy=0.9 * W, height=H, width=W)
            img = np.clip(
                np.asarray(render(
                    jnp.asarray(scene_arrays[0]), jnp.asarray(scene_arrays[1]),
                    jnp.asarray(scene_arrays[2]), jnp.asarray(scene_arrays[3]),
                    jnp.asarray(scene_arrays[4]), cam, config=cfg,
                )["render"]).transpose(1, 2, 0), 0, 1)
            name = f"v{iid:03d}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(root / "images" / name)
            q = np.asarray(rotmat_to_quat(jnp.asarray(R[None].astype(np.float32))))[0]
            imgs[iid] = colmap.ColmapImage(
                iid, q.astype(np.float64), t.astype(np.float64), 1, name,
                np.zeros((0, 2)), np.zeros((0,), np.int64),
            )
            iid += 1
        all_pts.append(pts[::2])
        cols = np.clip(np.asarray(sh_dc_to_rgb(s.shs[::2, 0, :])), 0, 1)
        all_cols.append(cols)

    xyz = np.concatenate(all_pts)
    rgb = (np.concatenate(all_cols) * 255).astype(np.uint8)
    colmap.write_cameras_binary(cams, str(root / "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, str(root / "sparse/0/images.bin"))
    colmap.write_points3d_binary(xyz, rgb, str(root / "sparse/0/points3D.bin"))
    return root


@pytest.mark.slow
def test_pipeline_end_to_end(two_cluster_scene, tmp_path):
    from hidegs_tpu.hier.io import read_hier
    from hidegs_tpu.pipeline import run_pipeline

    out = str(tmp_path / "out")
    merged_path = run_pipeline(
        str(two_cluster_scene), out,
        chunk_size=14.0, min_n_cams=3, iterations=25, post_opt_iterations=10,
        capacity=256, max_instances=1 << 12, add_far_cams=False, log_every=1000,
    )
    assert os.path.exists(merged_path)
    merged = read_hier(merged_path)
    assert merged.num_points > 100
    assert os.path.exists(os.path.join(out, "merged_opt.hier"))
    info = os.path.join(out, "pipeline.json")
    assert os.path.exists(info)
    import json

    meta = json.load(open(info))
    assert len(meta["chunks"]) == 2

    # the merged hierarchy renders through the streaming viewer path
    from hidegs_tpu.hier.streaming import ChunkStreamer

    st = ChunkStreamer(os.path.join(out, "chunks"))
    assert len(st.chunks) == 2


@pytest.mark.slow
def test_pipeline_chunk_fanout_matches_sequential(two_cluster_scene, tmp_path):
    """workers=2 subprocess fan-out must produce the same merged hierarchy
    as the sequential in-process run (VERDICT r3 item 6: the SLURM fan-out
    analog of preprocess/generate_chunks.py:17-35)."""
    import json
    import time

    from hidegs_tpu.hier.io import read_hier
    from hidegs_tpu.pipeline import run_pipeline

    results = {}
    for mode, workers in (("seq", 1), ("fan", 2)):
        out = str(tmp_path / mode)
        t0 = time.time()
        merged_path = run_pipeline(
            str(two_cluster_scene), out,
            chunk_size=14.0, min_n_cams=3, iterations=25,
            capacity=256, max_instances=1 << 12, add_far_cams=False,
            log_every=1000, workers=workers, eval_taus=(0.0,),
        )
        results[mode] = (read_hier(merged_path), time.time() - t0)
    h_seq, _ = results["seq"]
    h_fan, _ = results["fan"]
    assert h_seq.num_points == h_fan.num_points
    assert h_seq.num_nodes == h_fan.num_nodes
    np.testing.assert_allclose(h_seq.pos, h_fan.pos, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_seq.alpha, h_fan.alpha, rtol=1e-5, atol=1e-6)


def test_chunk_worker_cli_idempotent(two_cluster_scene, tmp_path):
    """`--chunk i j` worker mode trains exactly one chunk and is idempotent
    (an existing hierarchy short-circuits — fan-out retry/resume safety)."""
    import time

    from hidegs_tpu.data import colmap
    from hidegs_tpu.pipeline import train_one_chunk
    from hidegs_tpu.preprocess import chunking

    out = tmp_path / "out"
    sparse = os.path.join(str(two_cluster_scene), "sparse", "0")
    cams, imgs, (xyz, rgb, err, _ids) = colmap.read_model(sparse)
    chunks = chunking.compute_chunks(cams, imgs, xyz, err, chunk_size=14.0,
                                     min_n_cams=3, add_far_cams=False)
    chunks_dir = str(out / "chunks")
    chunking.write_chunks(chunks, cams, imgs, xyz, rgb, err, chunks_dir)
    ch = chunks[0]
    p1 = train_one_chunk(str(two_cluster_scene), chunks_dir, ch.i, ch.j,
                         iterations=10, capacity=256, max_instances=1 << 12)
    assert os.path.exists(p1)
    t0 = time.time()
    p2 = train_one_chunk(str(two_cluster_scene), chunks_dir, ch.i, ch.j,
                         iterations=10, capacity=256, max_instances=1 << 12)
    assert p2 == p1 and time.time() - t0 < 5.0  # short-circuited


@pytest.mark.slow
def test_pipeline_coarse_scaffold_enables_cull(two_cluster_scene, tmp_path):
    """With coarse_iterations > 0 the pipeline trains a coarse global model,
    hands each chunk its border annulus as a frozen scaffold, and ships the
    chunk-AABB cull ON (the reference pairing)."""
    import json

    from hidegs_tpu.pipeline import run_pipeline

    out = str(tmp_path / "out_scaffold")
    merged_path = run_pipeline(
        str(two_cluster_scene), out,
        chunk_size=14.0, min_n_cams=3, iterations=25, post_opt_iterations=0,
        capacity=1024, max_instances=1 << 12, add_far_cams=False,
        log_every=1000, coarse_iterations=20,
    )
    assert os.path.exists(merged_path)
    # coarse model exists and was used as the scaffold source
    coarse_ply = os.path.join(
        out, "coarse", "point_cloud", "iteration_20", "point_cloud.ply"
    )
    assert os.path.exists(coarse_ply)
    # every chunk's saved cfg shows the cull ON + the scaffold path
    chunks = json.load(open(os.path.join(out, "pipeline.json")))["chunks"]
    assert chunks
    for i, j in chunks:
        cfg_path = os.path.join(
            out, "chunks", f"chunk_{i}_{j}", "trained", "cfg_args.json"
        )
        cfg = json.load(open(cfg_path))
        assert cfg["pipeline"]["chunk_box_cull"] is True
        assert cfg["model"]["scaffold_file"].endswith("iteration_20")
