"""Hierarchy subsystem: IO roundtrip, builder invariants, LOD cut, rendering."""
import jax.numpy as jnp
import numpy as np
import pytest

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.hier import io as hio
from hidegs_tpu.hier.build import _build_hierarchy_py, _load_native, build_hierarchy
from hidegs_tpu.hier.interp import interpolate_cut, render_hierarchy
from hidegs_tpu.hier.lod import expand_to_size, node_size
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.losses import psnr


def toy_leaves(n=64, seed=0):
    s = make_toy_gaussians(n, seed=seed)
    return (
        np.asarray(s.means3d),
        np.asarray(s.quats),
        np.asarray(s.scales),
        np.asarray(s.opacities),
        np.asarray(s.shs),
    )


def check_invariants(h: hio.Hierarchy, n_leaves: int):
    nodes = h.nodes
    N = len(nodes)
    # exactly n_leaves depth-0 nodes, each with 1 leaf gaussian
    leaf_nodes = nodes[nodes[:, hio.DEPTH] == 0]
    assert len(leaf_nodes) == n_leaves
    assert (leaf_nodes[:, hio.COUNT_LEAFS] == 1).all()
    assert (leaf_nodes[:, hio.COUNT_CHILDREN] == 0).all()
    # internal nodes have 1 merged gaussian and 2 children
    internal = nodes[nodes[:, hio.DEPTH] > 0]
    assert (internal[:, hio.COUNT_MERGED] == 1).all()
    assert (internal[:, hio.COUNT_CHILDREN] == 2).all()
    # root
    assert nodes[0, hio.PARENT] == -1
    # parent pointers consistent
    for i in range(N):
        sc, cc = nodes[i, hio.START_CHILDREN], nodes[i, hio.COUNT_CHILDREN]
        for c in range(cc):
            assert nodes[sc + c, hio.PARENT] == i
    # total gaussians = leaves + merged
    assert h.num_points == n_leaves + len(internal)
    # boxes contain positions of own gaussians
    s0, cl = nodes[0, hio.START], nodes[0, hio.COUNT_LEAFS] + nodes[0, hio.COUNT_MERGED]
    assert np.isfinite(h.boxes).all()
    assert (h.boxes[0, 0, :3] - 1e-4 <= h.pos.min(0)).all()


def test_python_builder_invariants():
    pos, rot, scale, alpha, shs = toy_leaves(32)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    check_invariants(h, 32)
    # merged opacity within (0, 1]
    assert (h.alpha > 0).all() and (h.alpha <= 1.0 + 1e-6).all()


def test_native_builder_matches_python():
    if _load_native() is None:
        pytest.skip("no C++ toolchain")
    pos, rot, scale, alpha, shs = toy_leaves(48, seed=1)
    hc = build_hierarchy(pos, rot, scale, alpha, shs, use_native=True)
    hp = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    check_invariants(hc, 48)
    assert hc.num_points == hp.num_points
    assert hc.num_nodes == hp.num_nodes
    np.testing.assert_array_equal(hc.nodes, hp.nodes)
    # same tree → same gaussians (eigendecomposition sign/order may differ
    # slightly; compare positions/opacities/scale products)
    np.testing.assert_allclose(hc.pos, hp.pos, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(hc.alpha, hp.alpha, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(
        np.sort(hc.scale, axis=1), np.sort(hp.scale, axis=1), rtol=1e-2, atol=1e-3
    )


def test_hier_io_roundtrip(tmp_path):
    pos, rot, scale, alpha, shs = toy_leaves(16, seed=2)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    p = str(tmp_path / "test.hier")
    hio.write_hier(p, h)
    h2 = hio.read_hier(p)
    np.testing.assert_allclose(h2.pos, h.pos, rtol=1e-6)
    np.testing.assert_array_equal(h2.nodes, h.nodes)
    np.testing.assert_allclose(h2.boxes, h.boxes, rtol=1e-6)
    np.testing.assert_allclose(h2.shs, h.shs.astype(np.float32), rtol=1e-6)


def test_expand_to_size_fine_selects_leaves():
    pos, rot, scale, alpha, shs = toy_leaves(32, seed=3)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    cam = ring_camera(0, height=64, width=64)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    # tiny target size → every leaf selected at t=1
    cut = expand_to_size(
        jnp.asarray(h.nodes), jnp.asarray(h.boxes), 1e-9, vp, budget=128,
        num_points=h.num_points,
    )
    assert int(cut.num_selected) == 32
    assert bool((cut.ts[cut.valid] == 1.0).all())
    # coarse target → fewer selected
    cut2 = expand_to_size(
        jnp.asarray(h.nodes), jnp.asarray(h.boxes), 1e9, vp, budget=128,
        num_points=h.num_points,
    )
    assert int(cut2.num_selected) <= 2


def test_tau_pixel_conversion_monotone():
    """tau_to_target_size follows the h3dgs pixel convention ((2τ+1)/fx) and
    larger pixel-τ selects coarser cuts (r3 fix: raw τ values collapsed a 2M
    hierarchy to 12 nodes at τ=1 because the angular unit is ~1/focal)."""
    from hidegs_tpu.hier.lod import tau_to_target_size

    assert np.isclose(tau_to_target_size(0, 500.0), 1.0 / 500.0)
    assert np.isclose(tau_to_target_size(3, 500.0), 7.0 / 500.0)
    pos, rot, scale, alpha, shs = toy_leaves(32, seed=5)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    cam = ring_camera(0, height=64, width=64)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    cuts = []
    for tau_px in (0.0, 10.0, 200.0):
        cut = expand_to_size(
            jnp.asarray(h.nodes), jnp.asarray(h.boxes),
            tau_to_target_size(tau_px, float(cam.fx)), vp, budget=128,
            num_points=h.num_points,
        )
        cuts.append(int(cut.num_selected))
    assert cuts[0] >= cuts[1] >= cuts[2]
    assert cuts[0] > cuts[2]


def test_hierarchy_render_matches_leaf_render():
    n = 48
    scene = make_toy_gaussians(n, seed=4)
    h = _build_hierarchy_py(
        np.asarray(scene.means3d), np.asarray(scene.quats), np.asarray(scene.scales),
        np.asarray(scene.opacities), np.asarray(scene.shs),
    )
    cam = ring_camera(0, height=64, width=64)
    cfg = RasterConfig(backend="jnp", max_instances=1 << 13)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    cut = expand_to_size(
        jnp.asarray(h.nodes), jnp.asarray(h.boxes), 1e-9, vp, budget=128,
        num_points=h.num_points,
    )
    out_h = render_hierarchy(
        cut,
        jnp.asarray(h.pos),
        jnp.exp(jnp.asarray(h.scale)),
        jnp.asarray(h.rot),
        jnp.asarray(h.alpha),
        jnp.asarray(h.shs),
        cam,
        config=cfg,
    )
    out_l = render(*scene, cam, config=cfg)
    # at the finest cut the hierarchy render is the leaf render (same set of
    # gaussians, t=1 so no parent blending)
    p = float(psnr(out_h["render"], out_l["render"]))
    assert p > 40, p


def test_coarse_cut_still_renders():
    n = 64
    scene = make_toy_gaussians(n, seed=5)
    h = _build_hierarchy_py(
        np.asarray(scene.means3d), np.asarray(scene.quats), np.asarray(scene.scales),
        np.asarray(scene.opacities), np.asarray(scene.shs),
    )
    cam = ring_camera(0, height=64, width=64)
    cfg = RasterConfig(backend="jnp", max_instances=1 << 13)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    # mid-scale target: mixes internal + leaf nodes with 0<t≤1
    cut = expand_to_size(
        jnp.asarray(h.nodes), jnp.asarray(h.boxes), 0.02, vp, budget=256,
        num_points=h.num_points,
    )
    assert 0 < int(cut.num_selected) <= 2 * n
    out = render_hierarchy(
        cut, jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot),
        jnp.asarray(h.alpha), jnp.asarray(h.shs), cam, config=cfg,
    )
    img = np.asarray(out["render"])
    assert np.isfinite(img).all()
    assert img.max() > 0.01


def test_hier_cli_create_and_merge(tmp_path):
    """CLI parity tools: ply → .hier → merge."""
    import jax.numpy as jnp

    from hidegs_tpu.hier import cli
    from hidegs_tpu.hier.io import read_hier
    from hidegs_tpu.model.gaussians import init_from_points
    from hidegs_tpu.utils.ply import save_gaussian_ply

    scene = make_toy_gaussians(30, seed=9)
    st = init_from_points(scene.means3d, jnp.full((30, 3), 0.5), capacity=30)
    ply_path = str(tmp_path / "point_cloud.ply")
    save_gaussian_ply(ply_path, st)
    out1 = str(tmp_path / "h1.hier")
    cli.main(["create", "--ply", ply_path, "--out", out1])
    h = read_hier(out1)
    assert h.num_points >= 30

    for i in range(2):
        d = tmp_path / f"chunk_0_{i}"
        d.mkdir()
        import shutil

        shutil.copy(out1, d / "hierarchy.hier")
        np.savetxt(d / "center.txt", np.zeros((1, 3)))
        np.savetxt(d / "extent.txt", np.full((1, 3), 100.0))
    out2 = str(tmp_path / "merged.hier")
    cli.main(["merge", "--chunks", str(tmp_path), "--out", out2])
    m = read_hier(out2)
    assert m.num_nodes == 2 * h.num_nodes + 1


def test_hier_io_compressed_roundtrip(tmp_path):
    pos, rot, scale, alpha, shs = toy_leaves(16, seed=7)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    p = str(tmp_path / "c.hier")
    hio.write_hier(p, h, compressed=True)
    h2 = hio.read_hier(p)
    np.testing.assert_allclose(h2.pos, h.pos, rtol=1e-6)  # pos stays f32
    np.testing.assert_array_equal(h2.nodes, h.nodes)
    np.testing.assert_allclose(h2.alpha, h.alpha, atol=2e-3)  # f16
    np.testing.assert_allclose(h2.boxes, h.boxes, rtol=2e-3, atol=2e-3)


def test_expand_to_target_cpu():
    """CPU breadth expansion (traversal.cpp equivalent)."""
    from hidegs_tpu.hier.lod import expand_to_target

    pos, rot, scale, alpha, shs = toy_leaves(16, seed=8)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    # target deeper than the tree → all leaves
    idx = expand_to_target(h.nodes, target=-1)
    assert len(idx) == 16
    # only gaussians, all unique
    assert len(set(idx.tolist())) == 16
    # a shallow target selects fewer, coarser entries
    root_depth = int(h.nodes[0, 0])
    idx2 = expand_to_target(h.nodes, target=root_depth - 1)
    assert 0 < len(idx2) <= 16


# ---------------------------------------------------------------------------
# refinement passes (rotation aligner / appearance filter / anchors)


def _covariances(h: hio.Hierarchy):
    from hidegs_tpu.core.transforms import build_covariance_3d

    return np.asarray(
        build_covariance_3d(jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot))
    )


def test_align_rotations_preserves_covariance_and_improves_match():
    from hidegs_tpu.hier.refine import (
        _merged_index,
        _quat_to_rotmat_np,
        align_rotations,
    )

    pos, rot, scale, alpha, shs = toy_leaves(48, seed=3)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    cov_before = _covariances(h)
    ha = align_rotations(h)
    cov_after = _covariances(ha)
    # alignment only permutes axes/signs: represented covariance unchanged
    assert np.allclose(cov_before, cov_after, atol=1e-4)
    # frobenius agreement with the parent's merged rotation does not decrease
    nodes = h.nodes
    merged = _merged_index(nodes)
    pairs = [
        (g, merged[nodes[n, hio.PARENT]])
        for n in range(len(nodes))
        if nodes[n, hio.PARENT] >= 0 and merged[nodes[n, hio.PARENT]] >= 0
        for g in range(
            nodes[n, hio.START],
            nodes[n, hio.START] + nodes[n, hio.COUNT_LEAFS] + nodes[n, hio.COUNT_MERGED],
        )
    ]
    gi = np.array([p[0] for p in pairs])
    ri = np.array([p[1] for p in pairs])

    def score(hh):
        Rg = _quat_to_rotmat_np(hh.rot[gi])
        Rr = _quat_to_rotmat_np(hh.rot[ri])
        return np.einsum("kij,kij->k", Rg, Rr)

    assert (score(ha) >= score(h) - 1e-5).all()
    assert score(ha).sum() > score(h).sum()  # at least some gaussian improved


def test_appearance_filter_collapses_far_detail():
    from hidegs_tpu.hier.lod import expand_to_size
    from hidegs_tpu.hier.refine import appearance_filter

    pos, rot, scale, alpha, shs = toy_leaves(64, seed=5)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    # cameras at moderate distance: upper levels are resolvable, leaf-level
    # detail is finer than any camera can project above the limit
    cams = np.array([[0.0, 0.0, 10.0], [10.0, 0.0, 0.0]], np.float32)
    hf = appearance_filter(h, cams, limit=0.05)
    assert hf.num_nodes < h.num_nodes
    assert hf.num_points < h.num_points
    # structure stays consistent: parent pointers and child ranges agree
    nodes = hf.nodes
    for i in range(len(nodes)):
        sc, cc = nodes[i, hio.START_CHILDREN], nodes[i, hio.COUNT_CHILDREN]
        for c in range(cc):
            assert nodes[sc + c, hio.PARENT] == i
    # gaussian ranges tile [0, P)
    counts = nodes[:, hio.COUNT_LEAFS] + nodes[:, hio.COUNT_MERGED]
    covered = np.zeros(hf.num_points, bool)
    for i in range(len(nodes)):
        s, c = nodes[i, hio.START], counts[i]
        assert not covered[s : s + c].any()
        covered[s : s + c] = True
    assert covered.all()
    # the collapsed hierarchy still produces a valid LOD cut
    cut = expand_to_size(
        jnp.asarray(nodes), jnp.asarray(hf.boxes), 0.01,
        jnp.asarray(np.array([0.0, 0.0, -4.0], np.float32)), budget=256,
    )
    assert int(cut.valid.sum()) > 0


def test_appearance_filter_near_cameras_keeps_everything():
    from hidegs_tpu.hier.refine import appearance_filter

    pos, rot, scale, alpha, shs = toy_leaves(32, seed=7)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    # a camera right next to the scene resolves every node
    cams = pos[:1] + np.array([[0.0, 0.0, 0.05]], np.float32)
    hf = appearance_filter(h, cams, limit=5e-4)
    assert hf.num_points == h.num_points
    assert hf.num_nodes == h.num_nodes


@pytest.mark.slow
def test_anchors_roundtrip_and_freeze(tmp_path):
    from hidegs_tpu.hier.refine import compute_anchors

    pos, rot, scale, alpha, shs = toy_leaves(32, seed=9)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    cams = pos[:2] + np.array([[0.0, 0.0, 0.05]], np.float32)
    anchors = compute_anchors(h, cams, limit=5e-4)
    assert len(anchors) > 0
    p = str(tmp_path / "anchors.bin")
    hio.write_anchors(p, anchors)
    back = hio.read_anchors(p)
    assert np.array_equal(anchors, back)
    # frozen gaussians don't move during post-opt
    from hidegs_tpu.train.hier_trainer import post_optimize

    cam = ring_camera(0.0, height=32, width=32, radius=4.0)
    img = np.zeros((3, 32, 32), np.float32)
    ts = post_optimize(
        h, [cam], [img], iterations=3, target_size=0.01, budget=128,
        anchors=anchors, log_every=100,
    )
    moved = np.abs(np.asarray(ts.params.xyz) - h.pos).max(axis=1)
    assert (moved[anchors] == 0).all()


def test_cut_size_matches_expand_and_adaptive_renderer():
    """cut_size's count-only pass must equal expand_to_size's num_selected,
    and the adaptive renderer must fit its budget to the cut (tau-aware LOD,
    VERDICT r3 item 3)."""
    import numpy as np
    import jax.numpy as jnp

    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.hier.build import build_hierarchy
    from hidegs_tpu.hier.interp import AdaptiveHierRenderer
    from hidegs_tpu.hier.lod import cut_size, expand_to_size, tau_to_target_size

    scene = make_toy_gaussians(400, seed=5)
    h = build_hierarchy(
        np.asarray(scene.means3d), np.asarray(scene.quats),
        np.asarray(scene.scales), np.asarray(scene.opacities),
        np.asarray(scene.shs),
    )
    nodes, boxes = jnp.asarray(h.nodes), jnp.asarray(h.boxes)
    cam = ring_camera(0, n_cams=4, height=64, width=64)
    vp = jnp.asarray(np.asarray(cam.camera_center))
    sizes = []
    for tau in (0.0, 2.0, 8.0):
        target = 0.0 if tau == 0 else tau_to_target_size(tau, float(cam.fx))
        n = int(cut_size(nodes, boxes, jnp.float32(target), vp))
        cut = expand_to_size(nodes, boxes, jnp.float32(target), vp,
                             budget=2048, num_points=h.num_points)
        assert n == int(cut.num_selected), (tau, n, int(cut.num_selected))
        assert n == int(cut.valid.sum())
        sizes.append(n)
    assert sizes[0] >= sizes[1] >= sizes[2]  # coarser tau, smaller cut
    # tau=0 selects the exact leaf cut (h.num_points counts leaves + merged
    # interior gaussians; the leaf cut is exactly the input count)
    assert sizes[0] == 400

    r = AdaptiveHierRenderer(
        nodes, boxes, jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)),
        jnp.asarray(h.rot), jnp.asarray(h.alpha), jnp.asarray(h.shs),
        num_points=h.num_points, backend="jnp",
    )
    out_fine = r.render(cam, 0.0)
    b_fine = r._budget
    out_coarse = r.render(cam, 8.0)
    b_coarse = r._budget
    assert b_coarse <= b_fine  # budget never grows for a coarser tau
    assert b_fine >= sizes[0] and b_coarse >= sizes[2]
    for o in (out_fine, out_coarse):
        img = np.asarray(o["render"])
        assert np.isfinite(img).all() and img.max() > 0
    # coarse and fine frames agree roughly (smooth LOD): mean within 25%
    m_f, m_c = float(out_fine["render"].mean()), float(out_coarse["render"].mean())
    assert abs(m_f - m_c) <= 0.25 * max(m_f, 1e-6), (m_f, m_c)
    # the adaptive frame equals a fixed-budget render of the same cut
    from hidegs_tpu.hier.interp import render_hierarchy
    from hidegs_tpu.raster.api import RasterConfig

    cut = expand_to_size(nodes, boxes, 0.0, vp, budget=2048,
                         num_points=h.num_points)
    fixed = render_hierarchy(
        cut, jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)),
        jnp.asarray(h.rot), jnp.asarray(h.alpha), jnp.asarray(h.shs), cam,
        config=RasterConfig(backend="jnp", max_instances=1 << 15),
    )
    np.testing.assert_allclose(
        np.asarray(out_fine["render"]), np.asarray(fixed["render"]),
        rtol=1e-4, atol=1e-5,
    )


def test_adaptive_renderer_count_cache():
    """Frame-coherent cut-count reuse: a repeated (viewpoint, tau) frame
    skips the count pass; a big camera move or tau change recounts; a stale
    under-budget is healed by the num_selected check."""
    import jax.numpy as jnp

    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.hier.build import build_hierarchy
    from hidegs_tpu.hier.interp import AdaptiveHierRenderer

    # > 1024 leaves so the budget floor cannot mask a poisoned cached count
    scene = make_toy_gaussians(3000, seed=7)
    h = build_hierarchy(
        np.asarray(scene.means3d), np.asarray(scene.quats),
        np.asarray(scene.scales), np.asarray(scene.opacities),
        np.asarray(scene.shs),
    )
    r = AdaptiveHierRenderer(
        jnp.asarray(h.nodes), jnp.asarray(h.boxes), jnp.asarray(h.pos),
        jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot),
        jnp.asarray(h.alpha), jnp.asarray(h.shs),
        num_points=h.num_points, backend="jnp",
    )
    cam0 = ring_camera(0, n_cams=4, height=48, width=48)
    out0 = r.render(cam0, 2.0)
    assert r._count_cache is not None and r._count_cache["frames"] == 0
    n0 = r._count_cache["n_cut"]
    out1 = r.render(cam0, 2.0)  # same frame → cache hit
    assert r._count_cache["frames"] == 1
    assert r._count_cache["n_cut"] == n0
    np.testing.assert_allclose(
        np.asarray(out1["render"]), np.asarray(out0["render"]), atol=1e-6
    )
    # tau change → recount
    r.render(cam0, 8.0)
    assert r._count_cache["tau"] == 8.0 and r._count_cache["frames"] == 0
    # big move (another ring camera is >> recount_dist away) → recount
    cam1 = ring_camera(2, n_cams=4, height=48, width=48)
    r.render(cam1, 8.0)
    assert r._count_cache["frames"] == 0
    # stale cache healing: poison the cached count far below the true cut
    r._count_cache = {"tau": 0.0, "vp": np.asarray(cam0.camera_center),
                      "frames": 0, "n_cut": 8}
    r._budget = 0
    out = r.render(cam0, 0.0)
    assert int(out["overflow"]) == 0
    # the healed budget covers the true leaf cut
    assert r._count_cache["n_cut"] >= 3000
    assert r._budget >= 3000
    img = np.asarray(out["render"])
    assert np.isfinite(img).all() and img.max() > 0


def test_expand_packed_matches_numpy_oracle():
    """The r5 packed select (pack_hierarchy + expand_packed) must reproduce
    markNodesForSize/computeTsIndexed semantics exactly; checked against a
    direct numpy transcription (runtime_switching.cu:403-478) at several
    viewpoints and granularities."""
    from hidegs_tpu.hier.lod import expand_packed, pack_hierarchy

    pos, rot, scale, alpha, shs = toy_leaves(96, seed=9)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    nodes, boxes = np.asarray(h.nodes), np.asarray(h.boxes)
    N = len(nodes)
    packed = pack_hierarchy(jnp.asarray(nodes), jnp.asarray(boxes))
    BIG = 3.4e38

    def np_size(vp):
        mn, mx, g = boxes[:, 0, :3], boxes[:, 1, :3], boxes[:, 0, 3]
        closest = np.clip(vp[None], mn, mx)
        d = np.linalg.norm(closest - vp[None], axis=-1)
        inside = ((vp >= mn) & (vp <= mx)).all(-1)
        return np.where(inside, BIG, g / np.maximum(d, 1e-12))

    rng = np.random.default_rng(0)
    for trial in range(4):
        vp = rng.normal(size=3).astype(np.float32) * (2.0 + trial)
        target = float(10.0 ** rng.uniform(-6, 1))
        size = np_size(vp)
        par = nodes[:, hio.PARENT]
        has_p = par >= 0
        psz = np.where(has_p, size[np.maximum(par, 0)], BIG)
        count = np.where(
            size >= target, nodes[:, hio.COUNT_LEAFS],
            np.where(
                has_p & (psz >= target),
                nodes[:, hio.COUNT_LEAFS]
                + np.where(nodes[:, hio.DEPTH] != 0, nodes[:, hio.COUNT_MERGED], 0),
                0,
            ),
        )
        want_idx, want_par, want_ts = [], [], []
        for n in range(N):
            for k in range(count[n]):
                g = nodes[n, hio.START] + k
                pg = nodes[par[n], hio.START] if has_p[n] else g
                if (not has_p[n]) or psz[n] > 2.0 * target:
                    t = 1.0
                else:
                    sv = max(0.5 * psz[n], size[n])
                    diff = psz[n] - sv
                    td = max(0.0, target - sv)
                    t = 1.0 if diff <= 0 else max(1.0 - td / max(diff, 1e-20), 0.0)
                want_idx.append(g)
                want_par.append(pg)
                want_ts.append(t)

        cut = expand_packed(
            packed, jnp.float32(target), jnp.asarray(vp), budget=256,
            num_points=h.num_points,
        )
        got_v = np.asarray(cut.valid)
        assert int(cut.num_selected) == len(want_idx)
        np.testing.assert_array_equal(
            np.asarray(cut.render_indices)[got_v], np.array(want_idx))
        np.testing.assert_array_equal(
            np.asarray(cut.parent_indices)[got_v], np.array(want_par))
        np.testing.assert_allclose(
            np.asarray(cut.ts)[got_v], np.array(want_ts), rtol=1e-5, atol=1e-6)


def test_fused_lod_frame_matches_separate_calls():
    """fused_lod_frame (one dispatch) must equal expand_packed +
    render_hierarchy called separately."""
    import jax

    from hidegs_tpu.hier.interp import fused_lod_frame
    from hidegs_tpu.hier.lod import expand_packed, pack_hierarchy

    pos, rot, scale, alpha, shs = toy_leaves(64, seed=11)
    h = _build_hierarchy_py(pos, rot, scale, alpha, shs)
    cam = ring_camera(1, height=64, width=64)
    arrays = (
        jnp.asarray(h.pos), jnp.exp(jnp.asarray(h.scale)), jnp.asarray(h.rot),
        jnp.asarray(h.alpha), jnp.asarray(h.shs),
    )
    packed = pack_hierarchy(jnp.asarray(h.nodes), jnp.asarray(h.boxes))
    cfg = RasterConfig(backend="jnp", max_instances=1 << 12)
    target = jnp.float32(0.02)

    fused = fused_lod_frame(
        packed, target, cam, *arrays, budget=256, num_points=h.num_points,
        config=cfg,
    )
    cut = expand_packed(packed, target, cam.camera_center, budget=256,
                        num_points=h.num_points)
    sep = render_hierarchy(cut, *arrays, cam, config=cfg)
    np.testing.assert_allclose(
        np.asarray(fused["render"]), np.asarray(sep["render"]), atol=1e-5)
    assert int(fused["num_selected"]) == int(cut.num_selected)
