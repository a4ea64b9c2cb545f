"""Rasterizer correctness: oracle sanity, tile path vs oracle, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidegs_tpu.core.camera_math import make_camera
from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.raster.binning import bin_gaussians, tile_grid
from hidegs_tpu.raster.preprocess import preprocess_gaussians


def small_scene(n=300, h=64, w=80, seed=0):
    scene = make_toy_gaussians(n, seed=seed)
    cam = ring_camera(0, height=h, width=w)
    return scene, cam


def test_oracle_renders_something():
    scene, cam = small_scene()
    out = render(*scene, cam, config=RasterConfig(backend="oracle"))
    img = np.array(out["render"])
    assert img.shape == (3, 64, 80)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something was splatted
    assert (np.array(out["alpha"]) <= 1.0 + 1e-5).all()
    assert np.array(out["visibility"]).sum() > 0


def test_oracle_background_composites():
    scene, cam = small_scene(n=5)
    bg = jnp.array([1.0, 0.0, 0.0])
    out = render(*scene, cam, background=bg, config=RasterConfig(backend="oracle"))
    # pixels with no splat coverage must be exactly background
    T = np.array(out["T_final"])
    img = np.array(out["render"])
    empty = T > 0.999
    assert empty.sum() > 0
    np.testing.assert_allclose(img[0][empty], 1.0, atol=1e-4)
    np.testing.assert_allclose(img[1][empty], 0.0, atol=1e-4)


def test_binning_counts_match_rects():
    scene, cam = small_scene()
    pre = preprocess_gaussians(*scene, cam)
    ty, tx = tile_grid(cam.height, cam.width)
    # tile_cull off: this test checks the raw rect-expansion counts
    tb = bin_gaussians(pre, ty, tx, max_instances=1 << 15, tile_cull=False)
    assert int(tb.overflow) == 0
    # every valid instance's tile must be inside the grid, sorted ascending
    tids = np.array(tb.tile_id)
    valid = tids < ty * tx
    assert (np.diff(tids) >= 0).all()
    assert int(tb.tile_count.sum()) == valid.sum() == int(tb.num_instances)
    # depths within a tile ascending
    gid = np.array(tb.gauss_id)
    depth = np.array(pre.depth)
    for t in np.unique(tids[valid])[:20]:
        sel = gid[tids == t]
        d = depth[sel]
        assert (np.diff(d) >= -1e-6).all()


def test_tiled_matches_oracle():
    scene, cam = small_scene(n=400)
    out_o = render(*scene, cam, render_geo=True, config=RasterConfig(backend="oracle"))
    out_t = render(
        *scene, cam, render_geo=True, config=RasterConfig(backend="jnp", max_instances=1 << 15)
    )
    np.testing.assert_allclose(out_t["render"], out_o["render"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out_t["invdepth"], out_o["invdepth"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out_t["alpha"], out_o["alpha"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out_t["T_final"], out_o["T_final"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        out_t["rendered_normal"], out_o["rendered_normal"], atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        out_t["rendered_distance"], out_o["rendered_distance"], atol=3e-4, rtol=1e-3
    )
    # observation counters identical (integer-exact)
    np.testing.assert_array_equal(out_t["out_observe"], out_o["out_observe"])


def test_tiled_matches_oracle_with_background():
    scene, cam = small_scene(n=150, seed=3)
    bg = jnp.array([0.2, 0.4, 0.6])
    out_o = render(*scene, cam, background=bg, config=RasterConfig(backend="oracle"))
    out_t = render(*scene, cam, background=bg, config=RasterConfig(max_instances=1 << 14))
    np.testing.assert_allclose(out_t["render"], out_o["render"], atol=2e-4, rtol=1e-3)


def test_gradients_match_oracle():
    scene, cam = small_scene(n=120, h=48, w=48, seed=1)
    target = jnp.zeros((3, 48, 48))

    def loss_fn(backend):
        cfg = RasterConfig(backend=backend, max_instances=1 << 14)

        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs, cam, config=cfg)
            return jnp.mean((out["render"] - target) ** 2)

        return f

    args = tuple(scene)
    g_o = jax.grad(loss_fn("oracle"), argnums=(0, 1, 2, 3, 4))(*args)
    g_t = jax.grad(loss_fn("jnp"), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "quats", "opacity", "shs"]
    for name, a, b in zip(names, g_o, g_t):
        a, b = np.array(a), np.array(b)
        assert np.isfinite(a).all() and np.isfinite(b).all(), name
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=5e-3, err_msg=name)
    # gradients are non-trivial
    assert np.abs(np.array(g_t[0])).max() > 0


def test_gradient_finite_differences():
    # spot-check d(loss)/d(opacity) against central differences
    scene, cam = small_scene(n=40, h=32, w=32, seed=2)
    target = jnp.zeros((3, 32, 32))
    cfg = RasterConfig(backend="jnp", max_instances=1 << 12)

    def f(opac):
        out = render(scene.means3d, scene.scales, scene.quats, opac, scene.shs, cam, config=cfg)
        return jnp.mean((out["render"] - target) ** 2)

    g = np.array(jax.grad(f)(scene.opacities))
    eps = 1e-3
    rng = np.random.RandomState(0)
    idxs = rng.choice(40, size=8, replace=False)
    for i in idxs:
        op = np.array(scene.opacities)
        op_p, op_m = op.copy(), op.copy()
        op_p[i] += eps
        op_m[i] -= eps
        fd = (float(f(jnp.array(op_p))) - float(f(jnp.array(op_m)))) / (2 * eps)
        assert abs(fd - g[i]) < 5e-3 * max(1.0, abs(fd)), (i, fd, g[i])


def test_overflow_reported():
    scene, cam = small_scene(n=500)
    pre = preprocess_gaussians(*scene, cam)
    ty, tx = tile_grid(cam.height, cam.width)
    tb_full = bin_gaussians(pre, ty, tx, max_instances=1 << 15)
    tiny = 64
    tb = bin_gaussians(pre, ty, tx, max_instances=tiny)
    assert int(tb.overflow) == int(tb_full.num_instances) - tiny


def test_instance_budget_truncation_still_renders():
    scene, cam = small_scene(n=500)
    out = render(*scene, cam, config=RasterConfig(max_instances=256))
    assert np.isfinite(np.array(out["render"])).all()


def test_tile_cull_is_exact_and_reduces_instances():
    """The tile-intersection cull only drops instances whose alpha is below
    1/255 at every pixel of their tile — those contribute exactly zero, so
    outputs match to fp-reassociation noise and instance counts shrink."""
    for seed in range(3):
        scene, cam = small_scene(n=400, seed=seed)
        pre = preprocess_gaussians(*scene, cam)
        ty, tx = tile_grid(cam.height, cam.width)
        tb_off = bin_gaussians(pre, ty, tx, max_instances=1 << 15, tile_cull=False)
        tb_on = bin_gaussians(pre, ty, tx, max_instances=1 << 15, tile_cull=True)
        kept_off = int(tb_off.tile_count.sum())
        kept_on = int(tb_on.tile_count.sum())
        assert kept_on < kept_off, (kept_on, kept_off)

        out_off = render(
            *scene, cam, render_geo=True,
            config=RasterConfig(max_instances=1 << 15, tile_cull=False),
        )
        out_on = render(
            *scene, cam, render_geo=True,
            config=RasterConfig(max_instances=1 << 15, tile_cull=True),
        )
        for k in ("render", "invdepth", "alpha", "T_final", "rendered_normal",
                  "rendered_distance"):
            np.testing.assert_allclose(
                np.array(out_on[k]), np.array(out_off[k]), atol=2e-5, err_msg=k
            )
        np.testing.assert_array_equal(out_on["out_observe"], out_off["out_observe"])


def test_quantized_sort_matches_exact():
    scene, cam = small_scene(n=300)
    out_exact = render(*scene, cam, config=RasterConfig(max_instances=1 << 15))
    out_q = render(
        *scene, cam,
        config=RasterConfig(max_instances=1 << 15, depth_sort_bits=18),
    )
    # depth quantization only perturbs near-equal-depth ordering
    np.testing.assert_allclose(
        np.array(out_q["render"]), np.array(out_exact["render"]), atol=5e-3
    )


def test_plane_depth_sign_and_value():
    """A camera-facing plane gaussian at z=d must yield plane_depth ≈ +d
    (reference stores |n·p|, gaussian_renderer/__init__.py:165)."""
    import jax.numpy as jnp

    from hidegs_tpu.core.sh import NUM_SH_COEFFS, rgb_to_sh_dc

    cam = make_camera(jnp.eye(3), jnp.zeros(3), fx=60.0, fy=60.0, height=32, width=32)
    means = jnp.array([[0.0, 0.0, 5.0]])
    scales = jnp.array([[1.0, 1.0, 1e-4]])  # flat disc facing the camera
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.95])
    shs = jnp.zeros((1, NUM_SH_COEFFS, 3)).at[:, 0].set(rgb_to_sh_dc(jnp.array([[1.0, 1, 1]])))
    out = render(
        means, scales, quats, opac, shs, cam, render_geo=True,
        config=RasterConfig(max_instances=1 << 12),
    )
    center_depth = float(out["plane_depth"][16, 16])
    assert abs(center_depth - 5.0) < 0.05, center_depth
    # distance channel positive where covered
    assert float(out["rendered_distance"][16, 16]) > 0


def test_render_coarse_subset_matches_full_on_subset():
    """render_coarse(indices) equals rendering only those gaussians, and
    visibility scatters back to full length (reference render_coarse,
    gaussian_renderer/__init__.py:376-488)."""
    from hidegs_tpu.raster.api import render_coarse, scatter_subset_visibility

    scene, cam = small_scene(n=200)
    idx = jnp.arange(0, 200, 2)  # every other gaussian
    cfg = RasterConfig(max_instances=1 << 14)
    out_sub = render_coarse(*scene, cam, indices=idx, config=cfg)
    # reference: manual gather then plain render
    gathered = tuple(jnp.take(a, idx, axis=0) for a in scene)
    out_ref = render(*gathered, cam, config=cfg)
    np.testing.assert_allclose(
        np.array(out_sub["render"]), np.array(out_ref["render"]), atol=1e-6
    )
    vis_full = scatter_subset_visibility(out_sub["visibility"], idx, 200)
    assert vis_full.shape == (200,)
    # odd indices were excluded → never visible
    assert not np.array(vis_full)[1::2].any()
    assert np.array(vis_full)[::2].sum() == np.array(out_sub["visibility"]).sum()


def test_auto_depth_bits_close_to_exact():
    """depth_sort_bits=-1 picks a valid quantization for any grid size and
    only reorders near-equal depths (pixel diffs within blend tolerance)."""
    scene, cam = small_scene(n=300)
    out_exact = render(*scene, cam, config=RasterConfig(max_instances=1 << 15))
    out_auto = render(
        *scene, cam,
        config=RasterConfig(max_instances=1 << 15, depth_sort_bits=-1),
    )
    np.testing.assert_allclose(
        np.array(out_auto["render"]), np.array(out_exact["render"]), atol=2e-3
    )


def test_chunk_aabb_cull():
    """boxmin/boxmax mark out-of-box gaussians invisible (forward.cu:319-321)
    and box_exempt spares skybox/scaffold rows; the culled render equals one
    where those gaussians were opacity-zeroed by hand."""
    import jax.numpy as jnp
    import numpy as np

    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.raster.api import RasterConfig, render

    scene = make_toy_gaussians(200, seed=11)
    cam = ring_camera(0, n_cams=4, height=64, width=64)
    cfg = RasterConfig(backend="jnp", max_instances=1 << 14)
    boxmin = jnp.asarray([-0.8, -0.8, -2.0])
    boxmax = jnp.asarray([0.8, 0.8, 2.0])
    inside = np.asarray(
        jnp.all((scene.means3d >= boxmin) & (scene.means3d <= boxmax), axis=-1)
    )
    assert 0 < inside.sum() < 200, "test box must split the scene"

    out_box = render(*scene, cam, config=cfg, boxmin=boxmin, boxmax=boxmax)
    out_manual = render(
        scene.means3d, scene.scales, scene.quats,
        jnp.where(jnp.asarray(inside), scene.opacities, 0.0), scene.shs,
        cam, config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_box["render"]), np.asarray(out_manual["render"]),
        rtol=1e-5, atol=1e-6,
    )
    assert not bool(out_box["visibility"][~inside].any())

    # exempt mask spares rows regardless of the box
    exempt = jnp.ones((200,), bool)
    out_ex = render(*scene, cam, config=cfg, boxmin=boxmin, boxmax=boxmax,
                    box_exempt=exempt)
    out_free = render(*scene, cam, config=cfg)
    np.testing.assert_allclose(
        np.asarray(out_ex["render"]), np.asarray(out_free["render"]),
        rtol=1e-5, atol=1e-6,
    )


def _partially_visible_scene(n=400, seed=2):
    """Toy scene with a block of rows pushed far outside the frustum, so
    visibility compaction has real work to do."""
    scene, cam = small_scene(n=n, seed=seed)
    means, scales, quats, opac, shs = scene
    means = means.at[:: 3].add(jnp.asarray([1.0e4, 0.0, 0.0]))
    return (means, scales, quats, opac, shs), cam


def test_visible_compaction_bit_exact():
    """max_visible compaction must not change ANY output (render, planes,
    observe, counters) when the budget holds every visible row."""
    scene, cam = _partially_visible_scene(n=400, seed=2)
    base = render(*scene, cam, render_geo=True, config=RasterConfig(backend="jnp"))
    n_vis = int(base["num_visible"])
    assert 0 < n_vis < 400
    from hidegs_tpu.raster.api import round_budget

    budget = round_budget(n_vis)
    out = render(
        *scene, cam, render_geo=True,
        config=RasterConfig(backend="jnp", max_visible=budget),
    )
    assert int(out["visible_overflow"]) == 0
    assert int(out["num_visible"]) == n_vis
    for k in ("render", "invdepth", "alpha", "T_final", "plane_depth",
              "rendered_normal", "rendered_distance"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(base[k]), atol=1e-6, err_msg=k
        )
    # N-domain per-gaussian outputs keep full-model indexing
    np.testing.assert_array_equal(
        np.asarray(out["visibility"]), np.asarray(base["visibility"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["radii"]), np.asarray(base["radii"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["out_observe"]), np.asarray(base["out_observe"])
    )


def test_visible_compaction_gradients_match():
    """Gradients through the compaction gather must equal the uncompacted
    path's (the gather transpose is a unique-index scatter — exact)."""
    scene, cam = _partially_visible_scene(n=300, seed=3)
    means, scales, quats, opac, shs = scene

    def loss(means, opac, cfg):
        out = render(means, scales, quats, opac, shs, cam, config=cfg)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["invdepth"])

    base_cfg = RasterConfig(backend="jnp")
    n_vis = int(render(*scene, cam, config=base_cfg)["num_visible"])
    from hidegs_tpu.raster.api import round_budget

    comp_cfg = RasterConfig(backend="jnp", max_visible=round_budget(n_vis))
    g_base = jax.grad(loss, argnums=(0, 1))(means, opac, base_cfg)
    g_comp = jax.grad(loss, argnums=(0, 1))(means, opac, comp_cfg)
    for gb, gc in zip(g_base, g_comp):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gb), atol=1e-5)


def test_visible_compaction_overflow_counts_and_drops_tail():
    """An under-sized budget reports the shortfall and drops the HIGHEST
    visible row indices (deterministic), still rendering the kept prefix."""
    scene, cam = _partially_visible_scene(n=400, seed=2)
    base = render(*scene, cam, config=RasterConfig(backend="jnp"))
    n_vis = int(base["num_visible"])
    budget = n_vis // 2
    assert budget > 0
    out = render(
        *scene, cam, config=RasterConfig(backend="jnp", max_visible=budget)
    )
    assert int(out["visible_overflow"]) == n_vis - budget
    assert int(out["num_visible"]) == n_vis
    assert np.isfinite(np.asarray(out["render"])).all()
    # kept set = first `budget` visible rows: their observe counts match a
    # render of only those rows
    vis_rows = np.where(np.asarray(base["visibility"]))[0]
    dropped = vis_rows[budget:]
    obs = np.asarray(out["out_observe"])
    assert (obs[dropped] == 0).all()
