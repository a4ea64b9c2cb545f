"""Out-of-core chunk streaming: residency, LRU eviction, rendering."""
import numpy as np
import pytest

from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
from hidegs_tpu.hier.build import _build_hierarchy_py
from hidegs_tpu.hier.io import write_hier
from hidegs_tpu.hier.streaming import ChunkStreamer
from hidegs_tpu.raster.api import RasterConfig


@pytest.fixture(scope="module")
def chunk_grid(tmp_path_factory):
    """2x2 grid of chunk hierarchies on disk."""
    root = tmp_path_factory.mktemp("chunks")
    for i in range(2):
        for j in range(2):
            center = np.array([i * 10.0 - 5.0, j * 10.0 - 5.0, 0.0])
            s = make_toy_gaussians(24, seed=i * 2 + j, extent=3.0)
            pos = np.asarray(s.means3d) + center
            h = _build_hierarchy_py(
                pos, np.asarray(s.quats), np.asarray(s.scales),
                np.asarray(s.opacities), np.asarray(s.shs),
            )
            d = root / f"chunk_{i}_{j}"
            d.mkdir()
            write_hier(str(d / "hierarchy.hier"), h)
            np.savetxt(d / "center.txt", center[None])
            np.savetxt(d / "extent.txt", np.array([[10.0, 10.0, 10.0]]))
    return root


def test_residency_and_lru(chunk_grid):
    st = ChunkStreamer(str(chunk_grid), max_resident=2, active_radius_chunks=1.0)
    assert len(st.chunks) == 4
    # viewpoint inside chunk (0,0)'s cell
    active = st.active_chunks(np.array([-5.0, -5.0, 0.0]))
    assert len(active) == 1
    # far-away viewpoint falls back to the nearest chunk
    far = st.active_chunks(np.array([100.0, 100.0, 0.0]))
    assert len(far) == 1
    # LRU eviction caps residency
    for idx in [0, 1, 2, 3, 0]:
        st.get(idx)
    assert len(st.resident) == 2
    assert st.loads == 5  # chunk 0 was evicted and re-loaded


def test_streamed_render(chunk_grid):
    st = ChunkStreamer(str(chunk_grid), active_radius_chunks=1.2)
    cam = ring_camera(0, height=48, width=48, radius=12.0, target=(-5.0, 0.0, -5.0))
    out = st.render_view(
        cam, target_size=1e-9,
        config=RasterConfig(backend="jnp", max_instances=1 << 13),
        budget_per_chunk=64,
    )
    img = np.asarray(out["render"])
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # streamed content actually rendered
