"""Out-of-core chunk streaming for UAV-scale scenes.

Equivalent of the reference's runtime maintenance layer
(gaussianhierarchy/runtime_maintenance.cu — `Maintenance::reorder/compress`,
used by the SIBR viewer to stream very large scenes): only the chunks near
the viewpoint are resident; as the camera moves, chunk hierarchies are loaded
from disk into an LRU cache and distant ones are evicted.

TPU design: host-side streaming + per-chunk LOD cuts. Each active chunk
selects its own cut (expand_to_size over its private node array — no global
index rebasing needed), the interpolated gaussians concatenate into one
padded buffer, and a single rasterizer call renders the frame. Static budget
per frame keeps everything jit-stable.
"""
from __future__ import annotations

import glob
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hidegs_tpu.hier.interp import interpolate_cut
from hidegs_tpu.hier.io import Hierarchy, read_hier
from hidegs_tpu.hier.lod import expand_to_size


class ChunkStreamer:
    """LRU-cached access to per-chunk hierarchies on disk."""

    def __init__(
        self,
        chunks_dir: str,
        hier_name: str = "hierarchy.hier",
        max_resident: int = 9,
        active_radius_chunks: float = 1.5,
    ):
        self.hier_name = hier_name
        self.max_resident = max_resident
        self.active_radius_chunks = active_radius_chunks
        self.chunks: List[Tuple[str, np.ndarray, np.ndarray]] = []  # (dir, center, extent)
        for d in sorted(glob.glob(os.path.join(chunks_dir, "chunk_*"))):
            if not os.path.exists(os.path.join(d, hier_name)):
                continue
            center = np.loadtxt(os.path.join(d, "center.txt")).reshape(-1)[:3]
            extent = np.loadtxt(os.path.join(d, "extent.txt")).reshape(-1)[:3]
            self.chunks.append((d, center, extent))
        if not self.chunks:
            raise FileNotFoundError(f"no chunk hierarchies under {chunks_dir}")
        self._cache: "OrderedDict[int, Hierarchy]" = OrderedDict()
        self.loads = 0  # observability: disk loads performed

    def active_chunks(self, viewpoint: np.ndarray) -> List[int]:
        """Chunks whose cell (scaled by active_radius_chunks) contains the
        XY-projected viewpoint — the distance-based residency rule of the
        streaming viewer."""
        vp = np.asarray(viewpoint)[:2]
        out = []
        for i, (_, center, extent) in enumerate(self.chunks):
            half = 0.5 * self.active_radius_chunks * extent[:2]
            if np.all(np.abs(vp - center[:2]) <= half):
                out.append(i)
        if not out:  # nothing nearby (viewpoint outside the grid): nearest chunk
            d = [np.linalg.norm(vp - c[:2]) for _, c, _ in self.chunks]
            out = [int(np.argmin(d))]
        return out

    def get(self, idx: int) -> Hierarchy:
        if idx in self._cache:
            self._cache.move_to_end(idx)
            return self._cache[idx]
        h = read_hier(os.path.join(self.chunks[idx][0], self.hier_name))
        self._cache[idx] = h
        self.loads += 1
        while len(self._cache) > self.max_resident:
            self._cache.popitem(last=False)  # evict least-recently-used
        return h

    @property
    def resident(self) -> List[int]:
        return list(self._cache.keys())

    def gather_cut(
        self,
        cam,
        target_size: float,
        budget_per_chunk: int = 1 << 15,
    ):
        """Per-chunk LOD cuts for `cam`, interpolated and concatenated.

        Returns (means3d, scales, quats, opacities, shs) ready for render();
        inactive/pad entries carry opacity 0.
        """
        vp_np = np.asarray(cam.camera_center)
        vp = jnp.asarray(vp_np)
        parts = []
        for ci in self.active_chunks(vp_np):
            h = self.get(ci)
            cut = expand_to_size(
                jnp.asarray(h.nodes),
                jnp.asarray(h.boxes),
                target_size,
                vp,
                budget=budget_per_chunk,
                num_points=h.num_points,
            )
            ig = interpolate_cut(
                cut,
                jnp.asarray(h.pos),
                jnp.exp(jnp.asarray(h.scale)),
                jnp.asarray(h.rot),
                jnp.asarray(h.alpha),
                jnp.asarray(h.shs),
            )
            parts.append(ig)
        return tuple(jnp.concatenate([getattr(p, f) for p in parts]) for f in parts[0]._fields)

    def render_view(self, cam, target_size: float, config=None, budget_per_chunk: int = 1 << 15):
        from hidegs_tpu.raster.api import RasterConfig, render

        arrays = self.gather_cut(cam, target_size, budget_per_chunk)
        return render(*arrays, cam, config=config or RasterConfig())
