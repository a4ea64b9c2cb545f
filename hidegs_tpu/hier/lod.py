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


class PackedHier(NamedTuple):
    """Per-node static data laid out so the per-frame cut select is
    GATHER-FREE over the node axis.

    The r4/r5 LOD profiles put the τ-independent ~180 ms select cost in two
    places: (a) per-frame single-column gathers from the N-node tables
    (`size[parent]`, `starts[node_of]`, `nodes[node_of, START]`, … — a
    narrow row gather uses 2-3 of 128 lanes on this chip, the same pathology
    `raster/preprocess.compact_visible` measured at ~7 ms/gather/1M rows)
    and (b) a non-unique scatter-max that XLA lowers row-serially. Packing
    the parent's box INTO each node's row turns the whole markNodesForSize
    count pass (runtime_switching.cu:410-424) into elementwise math, and
    one 20-wide bitcast table turns the eight post-expansion gathers into a
    single row gather.

    Built once per hierarchy (`pack_hierarchy`); every `expand_packed` /
    `cut_size_packed` call reuses it.
    """

    counts: jnp.ndarray  # (N, 3) int32: [count_leafs, count_merged_eff, 0]
    obox: jnp.ndarray  # (N, 7) f32: own box mn(3) mx(3) granularity
    pbox: jnp.ndarray  # (N, 7) f32: PARENT's box (self where root)
    par_has: jnp.ndarray  # (N,) bool
    table: jnp.ndarray  # (N, 20) int32 bitcast row for post-expansion:
    #   0 start | 1 par_has | 2 parent_start | 3 parent_kids |
    #   4:11 own box bits | 11:18 parent box bits | 18,19 pad


@jax.jit
def pack_hierarchy(nodes: jnp.ndarray, boxes: jnp.ndarray) -> PackedHier:
    N = nodes.shape[0]
    parent = nodes[:, PARENT]
    has_parent = parent >= 0
    parent_cl = jnp.maximum(parent, 0)
    flat = jnp.concatenate(
        [boxes[:, 0, :3], boxes[:, 1, :3], boxes[:, 0, 3:4]], axis=-1
    )  # (N, 7) mn mx granularity
    pbox = flat[parent_cl]  # the ONE build-time parent gather
    merged_eff = jnp.where(nodes[:, DEPTH] != 0, nodes[:, COUNT_MERGED], 0)
    counts = jnp.stack(
        [nodes[:, COUNT_LEAFS], merged_eff, jnp.zeros((N,), nodes.dtype)],
        axis=-1,
    ).astype(jnp.int32)
    pstart = nodes[parent_cl, START]
    pkids = jnp.where(has_parent, nodes[parent_cl, COUNT_CHILDREN], 1)
    table = jnp.concatenate(
        [
            nodes[:, START : START + 1].astype(jnp.int32),
            has_parent.astype(jnp.int32)[:, None],
            pstart.astype(jnp.int32)[:, None],
            pkids.astype(jnp.int32)[:, None],
            jax.lax.bitcast_convert_type(flat, jnp.int32),
            jax.lax.bitcast_convert_type(pbox, jnp.int32),
            jnp.zeros((N, 2), jnp.int32),
        ],
        axis=-1,
    )
    return PackedHier(counts=counts, obox=flat, pbox=pbox,
                      par_has=has_parent, table=table)


def _box_size(box7: jnp.ndarray, viewpoint: jnp.ndarray) -> jnp.ndarray:
    """(.., 7) [mn mx granularity] rows → projected granularity, elementwise
    (computeSizeGPU, runtime_switching.cu:135-143)."""
    mn, mx, gran = box7[..., 0:3], box7[..., 3:6], box7[..., 6]
    closest = jnp.clip(viewpoint, mn, mx)
    dist = jnp.linalg.norm(closest - viewpoint, axis=-1)
    inside = jnp.all((viewpoint >= mn) & (viewpoint <= mx), axis=-1)
    return jnp.where(inside, BIG, gran / jnp.maximum(dist, 1e-12))


def _packed_counts(ph: PackedHier, target_size, viewpoint):
    """markNodesForSize counts — fully elementwise (no node-axis gathers)."""
    size = _box_size(ph.obox, viewpoint[None, :])
    parent_size = jnp.where(ph.par_has, _box_size(ph.pbox, viewpoint[None, :]), BIG)
    count = jnp.where(
        size >= target_size,
        ph.counts[:, 0],
        jnp.where(
            ph.par_has & (parent_size >= target_size),
            ph.counts[:, 0] + ph.counts[:, 1],
            0,
        ),
    ).astype(jnp.int32)
    return count


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
def cut_size_packed(ph: PackedHier, target_size, viewpoint) -> jnp.ndarray:
    return jnp.sum(_packed_counts(ph, target_size, viewpoint))


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
def expand_packed(
    ph: PackedHier,
    target_size,
    viewpoint: jnp.ndarray,  # (3,)
    budget: int,
    num_points: int = 0,
) -> HierCut:
    """Select the LOD cut (markNodesForSize) and compute interpolation weights
    (computeTsIndexed) in one pass, expanded into a static `budget` buffer.

    Per-frame node-axis work is ONE elementwise count pass + one cumsum +
    two unique-index scatter-SETs; per-slot work is one 20-wide row gather
    (see PackedHier). The r4 select did the same semantics with eight
    narrow gathers and a non-unique scatter-max at ~180 ms/frame on 2M
    nodes; this layout is the reference's markNodesForSize cost model (one
    cheap kernel pass, runtime_switching.cu:402-431) realized for XLA."""
    N = ph.table.shape[0]
    count = _packed_counts(ph, target_size, viewpoint)

    ends = jnp.cumsum(count)
    starts = ends - count
    total = ends[-1]

    # Slot ownership: scatter each selected node's id AND start at its
    # start slot, then cummax down the slot axis. Destinations are
    # all-unique (starts strictly increase over count>0 nodes; count==0
    # nodes land on distinct out-of-bounds slots, mode="drop") so XLA emits
    # the scatter fully parallel instead of the row-serial general path —
    # the compact_visible idiom (raster/preprocess.py).
    rows = jnp.arange(N, dtype=jnp.int32)
    dest = jnp.where(count > 0, starts, budget + rows)
    slots = jnp.arange(budget, dtype=jnp.int32)
    owner = jnp.zeros((budget,), jnp.int32).at[dest].set(
        rows, mode="drop", unique_indices=True
    )
    start_of = jnp.zeros((budget,), jnp.int32).at[dest].set(
        starts, mode="drop", unique_indices=True
    )
    node_of = jax.lax.cummax(owner)
    local = slots - jax.lax.cummax(start_of)
    # every slot < total sits inside its owner's contiguous range, so the
    # range test is implied; slots ≥ total are padding
    valid = slots < total

    row = ph.table[node_of]  # the ONE per-slot gather
    start = row[:, 0]
    par_has = row[:, 1] > 0
    par_start = row[:, 2]
    kids = jnp.where(par_has, row[:, 3], 1)
    obox = jax.lax.bitcast_convert_type(row[:, 4:11], jnp.float32)
    pbox = jax.lax.bitcast_convert_type(row[:, 11:18], jnp.float32)

    gauss = start + local
    par_gauss = jnp.where(par_has, par_start, gauss)

    # computeTsIndexed (runtime_switching.cu:433-478)
    nsize = _box_size(obox, viewpoint[None, :])
    psize = jnp.where(par_has, _box_size(pbox, viewpoint[None, :]), BIG)
    start_v = jnp.maximum(0.5 * psize, nsize)
    diff = psize - start_v
    tdiff = jnp.maximum(0.0, target_size - start_v)
    t_smooth = jnp.where(diff <= 0, 1.0, jnp.maximum(1.0 - tdiff / jnp.maximum(diff, 1e-20), 0.0))
    ts = jnp.where(~par_has | (psize > 2.0 * target_size), 1.0, t_smooth)

    P_sentinel = num_points if num_points else jnp.max(ph.table[:, 0]) + 1
    return HierCut(
        render_indices=jnp.where(valid, gauss, P_sentinel).astype(jnp.int32),
        parent_indices=jnp.where(valid, par_gauss, P_sentinel).astype(jnp.int32),
        node_of=jnp.where(valid, node_of, N).astype(jnp.int32),
        ts=jnp.where(valid, ts, 1.0),
        kids=jnp.where(valid, kids, 1).astype(jnp.int32),
        valid=valid,
        num_selected=total.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("budget", "num_points"))
def expand_to_size(
    nodes: jnp.ndarray,  # (N, 7) int32
    boxes: jnp.ndarray,  # (N, 2, 4) f32
    target_size,
    viewpoint: jnp.ndarray,  # (3,)
    budget: int,
    num_points: int = 0,
) -> HierCut:
    """Convenience wrapper: pack + expand in one jit. Hot callers that issue
    many cuts per hierarchy (AdaptiveHierRenderer, evaluate_lod) should
    `pack_hierarchy` once and call `expand_packed`."""
    return expand_packed(
        pack_hierarchy(nodes, boxes), target_size, viewpoint,
        budget=budget, num_points=num_points,
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
