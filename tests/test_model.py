"""Model layer: padded state, masked Adam, densify/prune, KNN init."""
import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.model import knn
from hidegs_tpu.model.adam import init_adam, masked_adam_update, reset_moments_at
from hidegs_tpu.model.densify import (
    DensifyConfig,
    add_densification_stats,
    densify_and_prune,
)
from hidegs_tpu.model.gaussians import (
    GaussianParams,
    init_from_points,
    make_skybox,
    oneup_sh_degree,
    reset_opacity,
)
from hidegs_tpu.model.schedules import LRConfig, expon_lr, lr_tree


def make_state(n=10, capacity=32, seed=0):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.normal(key, (n, 3))
    cols = jax.random.uniform(key, (n, 3))
    return init_from_points(pts, cols, capacity)


def test_init_padding_and_alive():
    st = make_state()
    assert st.capacity == 32
    assert int(st.num_alive) == 10
    assert np.array(st.opacities)[10:].max() == 0.0  # dead slots render-culled
    assert st.shs.shape == (32, 16, 3)


def test_sh_degree_schedule():
    st = make_state()
    for _ in range(5):
        st = oneup_sh_degree(st)
    assert int(st.active_sh_degree) == 3


def test_reset_opacity_protected():
    st = make_state()
    protected = jnp.zeros(32, bool).at[0].set(True)
    st = st._replace(protected=protected)
    before = np.array(st.opacities)
    st2 = reset_opacity(st, 0.01)
    after = np.array(st2.opacities)
    assert after[0] == before[0]  # protected unchanged
    assert (after[1:10] <= 0.0101).all()


def test_masked_adam_freezes_invisible():
    st = make_state()
    opt = init_adam(st.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, st.params)
    lrs = lr_tree(0, LRConfig(), st.spatial_lr_scale)
    visible = jnp.zeros(32, bool).at[:5].set(True)
    new_p, new_opt = masked_adam_update(st.params, grads, opt, lrs, visible)
    dx = np.array(new_p.xyz - st.params.xyz)
    assert (np.abs(dx[:5]).sum(axis=1) > 0).all()
    assert (dx[5:] == 0).all()
    assert (np.array(new_opt.step)[:5] == 1).all()
    assert (np.array(new_opt.step)[5:] == 0).all()


def test_adam_matches_dense_adam_when_all_visible():
    # with all visible, per-gaussian bias correction == standard Adam
    st = make_state(n=8, capacity=8)
    opt = init_adam(st.params)
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.5, st.params)
    lr = GaussianParams(*([jnp.asarray(0.01)] * 6))
    visible = jnp.ones(8, bool)
    p, o = masked_adam_update(st.params, g, opt, lr, visible)
    # first Adam step with constant grad = -lr * sign(g) (approx, eps small)
    step = np.array(p.xyz - st.params.xyz)
    np.testing.assert_allclose(step, -0.01, rtol=1e-4)
    # second step
    p2, o2 = masked_adam_update(p, g, o, lr, visible)
    assert np.isfinite(np.array(p2.xyz)).all()


def test_reset_moments():
    st = make_state()
    opt = init_adam(st.params)
    g = jax.tree_util.tree_map(jnp.ones_like, st.params)
    lr = GaussianParams(*([jnp.asarray(0.01)] * 6))
    _, opt = masked_adam_update(st.params, g, opt, lr, jnp.ones(32, bool))
    mask = jnp.zeros(32, bool).at[3].set(True)
    opt2 = reset_moments_at(opt, mask)
    assert np.array(opt2.m.xyz)[3].sum() == 0
    assert np.array(opt2.m.xyz)[4].sum() != 0
    assert int(opt2.step[3]) == 0


def test_expon_lr_endpoints():
    assert abs(float(expon_lr(0, 1e-2, 1e-4, 100)) - 1e-2) < 1e-8
    assert abs(float(expon_lr(100, 1e-2, 1e-4, 100)) - 1e-4) < 1e-9
    mid = float(expon_lr(50, 1e-2, 1e-4, 100))
    assert 1e-4 < mid < 1e-2


def test_densify_clone_and_split():
    st = make_state(n=10, capacity=64)
    opt = init_adam(st.params)
    # force: gaussian 0 small (clone), gaussian 1 large (split)
    scaling = st.params.scaling
    scaling = scaling.at[0].set(jnp.log(1e-5))
    scaling = scaling.at[1].set(jnp.log(0.5))
    opac = st.params.opacity.at[:10].set(5.0)  # sigmoid≈1 > 0.15
    st = st._replace(params=st.params._replace(scaling=scaling, opacity=opac))
    st = st._replace(
        grad_max=jnp.zeros(64).at[0].set(1.0).at[1].set(1.0),
        max_radii2d=jnp.zeros(64).at[0].set(10.0).at[1].set(10.0),
    )
    cfg = DensifyConfig(grad_threshold=0.015, percent_dense=0.01)
    st2, opt2, info = densify_and_prune(st, opt, scene_extent=1.0, cfg=cfg, rng=jax.random.PRNGKey(0))
    assert int(info["n_clone"]) == 1
    assert int(info["n_split"]) == 1
    # 10 + 1 clone + 1 extra split child = 12 alive
    assert int(info["n_alive"]) == 12
    # split parent's scale shrank
    new_scale = np.exp(np.array(st2.params.scaling[1]))
    np.testing.assert_allclose(new_scale, 0.5 / 1.6, rtol=1e-5)
    # stats reset
    assert np.array(st2.grad_max).sum() == 0


def test_densify_prune_low_opacity():
    st = make_state(n=10, capacity=32)
    opt = init_adam(st.params)
    opac = st.params.opacity.at[2].set(-20.0)  # sigmoid ≈ 0
    st = st._replace(params=st.params._replace(opacity=opac))
    cfg = DensifyConfig()
    st2, _, info = densify_and_prune(st, opt, 1.0, cfg, jax.random.PRNGKey(1))
    assert not bool(st2.alive[2])
    assert int(info["n_pruned"]) == 1


def test_densify_respects_capacity():
    st = make_state(n=30, capacity=32)
    opt = init_adam(st.params)
    st = st._replace(
        grad_max=jnp.ones(32),
        max_radii2d=jnp.full(32, 10.0),
        params=st.params._replace(opacity=jnp.full(32, 5.0)),
    )
    cfg = DensifyConfig(grad_threshold=0.0, percent_dense=1e9)  # all clone-eligible
    st2, _, info = densify_and_prune(st, opt, 1.0, cfg, jax.random.PRNGKey(2))
    assert int(st2.alive.sum()) <= 32
    assert int(info["n_dropped"]) >= 28


def test_densify_growth_budget_top_score():
    """max_growth_frac caps additions per round, keeping the highest scores."""
    st = make_state(n=20, capacity=256)
    opt = init_adam(st.params)
    # all 20 clone-eligible, scores increasing with index
    st = st._replace(
        grad_max=jnp.zeros(256).at[:20].set(jnp.arange(1.0, 21.0)),
        max_radii2d=jnp.zeros(256).at[:20].set(10.0),
        params=st.params._replace(opacity=jnp.full((256,), 5.0)),
    )
    cfg = DensifyConfig(grad_threshold=0.0, percent_dense=1e9, max_growth_frac=0.2)
    st2, _, info = densify_and_prune(st, opt, 1.0, cfg, jax.random.PRNGKey(3))
    # 20 alive * 0.2 = 4 additions, the four highest-score gaussians
    assert int(st2.alive.sum()) == 24
    assert int(info["n_dropped"]) == 16
    # the clones are copies of gaussians 16..19 (highest scores): their xyz
    # values must appear twice in the alive set
    alive_xyz = np.array(st2.params.xyz)[np.array(st2.alive)]
    for i in range(16, 20):
        match = np.all(alive_xyz == np.array(st.params.xyz[i]), axis=1).sum()
        assert match == 2, i
    for i in range(0, 16):
        match = np.all(alive_xyz == np.array(st.params.xyz[i]), axis=1).sum()
        assert match == 1, i


def test_add_densification_stats_running_max():
    st = make_state()
    g = jnp.zeros((32, 2)).at[0].set(jnp.array([3.0, 4.0]))
    vis = jnp.zeros(32, bool).at[0].set(True)
    radii = jnp.zeros(32, jnp.int32).at[0].set(7)
    st = add_densification_stats(st, g, vis, radii)
    assert float(st.grad_max[0]) == 5.0
    assert float(st.max_radii2d[0]) == 7.0
    st = add_densification_stats(st, g * 0.1, vis, radii)
    assert float(st.grad_max[0]) == 5.0  # max, not sum


def test_knn_initial_scales():
    # regular grid: nearest-neighbor distance = spacing
    xs = jnp.linspace(0, 1, 5)
    grid = jnp.stack(jnp.meshgrid(xs, xs, xs), axis=-1).reshape(-1, 3)
    d = knn.initial_scales(grid, window=16)
    # 3 NN of interior points are at spacing 0.25
    np.testing.assert_allclose(np.median(np.array(d)), 0.25, rtol=0.05)


def test_skybox_generation():
    pts, cols = make_skybox(100, np.zeros(3), scene_radius=2.0, seed=1)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 20.0, rtol=1e-5)
    assert (pts[:, 1] <= 20.0).all()


def test_densify_prunes_nonfinite_rows():
    """Rows whose params blew up to NaN/Inf must be pruned at the next
    densify round (reference gaussian_model.py:738-739; the r3 analytic run
    carried 259931 NaN rows to the final checkpoint without this)."""
    import jax

    from hidegs_tpu.model.adam import init_adam
    from hidegs_tpu.model.densify import DensifyConfig, densify_and_prune
    from hidegs_tpu.model.gaussians import init_from_points

    state = init_from_points(
        jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
        jnp.full((8, 3), 0.5), capacity=16,
    )
    p = state.params
    state = state._replace(params=p._replace(
        xyz=p.xyz.at[3, 0].set(jnp.nan),
        scaling=p.scaling.at[5, 1].set(jnp.inf),
    ))
    opt = init_adam(state.params)
    s2, _, info = densify_and_prune(
        state, opt, 4.0, DensifyConfig(), jax.random.PRNGKey(0)
    )
    alive = np.asarray(s2.alive)
    assert not alive[3] and not alive[5]
    assert alive[[0, 1, 2, 4, 6, 7]].all()
