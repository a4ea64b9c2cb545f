"""Randomized property tests: rasterizer vs oracle across varied scenes;
densification invariants under random stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.model.adam import init_adam
from hidegs_tpu.model.densify import DensifyConfig, densify_and_prune
from hidegs_tpu.model.gaussians import init_from_points
from hidegs_tpu.raster.api import RasterConfig, render


@pytest.mark.parametrize("seed", [11, 23, 37, 51])
def test_tiled_vs_oracle_fuzz(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(30, 400))
    h = int(rng.choice([32, 48, 64]))
    w = int(rng.choice([32, 48, 80]))
    scene = make_toy_gaussians(
        n, seed=seed, extent=float(rng.uniform(1.0, 3.0)),
        scale_range=(0.01, float(rng.uniform(0.05, 0.3))),
    )
    cam = ring_camera(int(rng.randint(8)), height=h, width=w,
                      radius=float(rng.uniform(4.0, 9.0)))
    bg = jnp.asarray(rng.rand(3).astype(np.float32))
    out_o = render(*scene, cam, background=bg, config=RasterConfig(backend="oracle"))
    out_t = render(*scene, cam, background=bg, config=RasterConfig(max_instances=1 << 15))
    np.testing.assert_allclose(
        np.asarray(out_t["render"]), np.asarray(out_o["render"]), atol=5e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_t["T_final"]), np.asarray(out_o["T_final"]), atol=5e-4, rtol=2e-3
    )


@pytest.mark.parametrize("seed", [3, 17])
def test_densify_invariants_fuzz(seed):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    n, C = 40, 128
    st = init_from_points(
        jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        capacity=C,
    )
    protected = jnp.zeros(C, bool).at[:5].set(True)
    st = st._replace(
        protected=protected,
        grad_max=jnp.asarray(rng.rand(C).astype(np.float32)) * 0.1,
        grad_abs_max=jnp.asarray(rng.rand(C).astype(np.float32)) * 0.1,
        max_radii2d=jnp.asarray(rng.rand(C).astype(np.float32)) * 30,
        params=st.params._replace(
            opacity=jnp.asarray(rng.randn(C).astype(np.float32)) * 2
        ),
    )
    opt = init_adam(st.params)
    alive_before = np.asarray(st.alive).copy()
    cfg = DensifyConfig(grad_threshold=0.01, percent_dense=0.02)
    st2, opt2, info = densify_and_prune(st, opt, scene_extent=2.0, cfg=cfg, rng=key)

    alive2 = np.asarray(st2.alive)
    # protected slots never die
    assert alive2[:5].all() or not alive_before[:5].all()
    # counts consistent
    assert int(info["n_alive"]) == alive2.sum()
    assert (
        int(info["n_alive"])
        == alive_before.sum() + int(info["n_clone"]) + int(info["n_split"])
        - int(info["n_pruned"]) - int(info["n_dropped"])
    )
    # stats reset; params finite
    assert float(st2.grad_max.sum()) == 0.0
    for f in st2.params._fields:
        assert np.isfinite(np.asarray(getattr(st2.params, f))).all(), f
    # dead slots have zero rendered opacity
    assert float(np.asarray(st2.opacities)[~alive2].max(initial=0.0)) == 0.0
