"""Densification (clone / split / prune) on capacity-padded buffers.

Re-design of the reference's dynamic-tensor densification
(scene/gaussian_model.py:656-761) for static shapes under jit:

  * clone rule:  ‖∇2d‖_max · max_radii2D · opacity^(1/5) ≥ τ  AND opacity>0.15
                 AND max_scale ≤ percent_dense·extent   (clone as-is)
  * split rule:  same score but max_scale > percent_dense·extent; parent is
                 replaced by child #0 in place, child #1 takes a dead slot;
                 children sample N(0, scale) rotated about the parent and get
                 scale/(0.8·N) with N=2.
  * prune rule:  opacity < min_opacity (protected/skybox exempt).

Slot allocation is a deterministic rank-and-scatter: selected gaussians are
ranked by cumsum position and matched to dead slots; selections beyond the
free-slot supply are dropped (the static-capacity analog of max_all_points,
arguments/__init__.py:121). Out-of-bounds scatter indices are dropped by XLA,
which implements the "didn't fit" path with no branching.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidegs_tpu.core.transforms import quat_to_rotmat
from hidegs_tpu.model.adam import AdamState, reset_moments_at
from hidegs_tpu.model.gaussians import GaussianParams, GaussianState


class DensifyConfig(NamedTuple):
    grad_threshold: float = 0.015  # densify_grad_threshold (arguments/__init__.py:108)
    abs_grad_threshold: float = 0.0008
    min_opacity: float = 0.005
    percent_dense: float = 1e-4  # fraction of scene extent (arguments/__init__.py:104)
    clone_min_opacity: float = 0.15
    split_n: int = 2
    split_scale_div: float = 0.8  # children scale / (0.8 * N)
    # Optional per-round growth budget: at most this fraction of the current
    # alive count is added per round, HIGHEST-SCORE candidates first (0 = the
    # reference's unbounded behavior). The absolute-threshold rule transfers
    # poorly across scenes/resolutions — the score distribution is heavy-
    # tailed and a threshold that selects 2% on one scene selects 50% on
    # another, which snowballs (every split resets moments and perturbs
    # geometry, raising the loss and hence next round's scores). A relative
    # budget gives geometric, optimizer-paced growth on any scene.
    max_growth_frac: float = 0.0


def add_densification_stats(
    state: GaussianState,
    screen_grad: jnp.ndarray,
    visible: jnp.ndarray,
    radii: jnp.ndarray,
) -> GaussianState:
    """Update running-max gradient stats (add_densification_stats,
    gaussian_model.py:763-765) and max 2D radii.

    screen_grad: (C, 2) d(loss)/d(mean2d) in pixel units.
    """
    gnorm = jnp.linalg.norm(screen_grad[:, :2], axis=-1)
    gabs = jnp.sum(jnp.abs(screen_grad[:, :2]), axis=-1)
    # grad_abs_max mirrors the reference's xyz_gradient_accum_abs, whose
    # consumer (the abs-threshold split variant) is commented out in the
    # reference (gaussian_model.py:683-695); kept for parity + future use.
    return state._replace(
        grad_max=jnp.where(visible, jnp.maximum(state.grad_max, gnorm), state.grad_max),
        grad_abs_max=jnp.where(
            visible, jnp.maximum(state.grad_abs_max, gabs), state.grad_abs_max
        ),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


def _scatter_params(params: GaussianParams, src: jnp.ndarray, dest: jnp.ndarray) -> GaussianParams:
    """params[dest] = params[src] per leaf; OOB dest entries are dropped."""

    def leaf(p):
        return p.at[dest].set(p[src], mode="drop")

    return GaussianParams(*(leaf(getattr(params, f)) for f in GaussianParams._fields))


def densify_and_prune(
    state: GaussianState,
    opt: AdamState,
    scene_extent,
    cfg: DensifyConfig,
    rng: jax.Array,
):
    """One densification round. Returns (new_state, new_opt, info dict)."""
    p = state.params
    C = state.capacity
    opac = state.opacities  # already alive-masked
    max_scale = jnp.max(jnp.exp(p.scaling), axis=-1)

    score = state.grad_max * state.max_radii2d * jnp.power(jnp.maximum(opac, 1e-8), 0.2)
    eligible = (
        state.alive
        & ~state.protected
        & (score >= cfg.grad_threshold)
        & (opac > cfg.clone_min_opacity)
    )
    clone_mask = eligible & (max_scale <= cfg.percent_dense * scene_extent)
    split_mask = eligible & (max_scale > cfg.percent_dense * scene_extent)

    # --- dead-slot allocation ------------------------------------------
    # stable argsort of alive puts dead slots first, in index order.
    dead_idx = jnp.argsort(state.alive.astype(jnp.int32), stable=True)
    n_dead = C - state.alive.sum()

    n_clone = clone_mask.sum()
    n_split = split_mask.sum()

    # Each candidate (clone copy / split child #1) consumes one dead slot.
    # When candidates outnumber free slots, keep the HIGHEST-SCORE ones —
    # the static-capacity analog of max_all_points (arguments/__init__.py:121)
    # spends the remaining budget where the densification signal is largest
    # instead of by array order.
    sel_mask = clone_mask | split_mask
    sel_key = jnp.where(sel_mask, score, -jnp.inf)
    order = jnp.argsort(-sel_key)  # candidates by descending score
    cand_rank = jnp.zeros((C,), jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))
    budget = n_dead
    if cfg.max_growth_frac > 0:
        budget = jnp.minimum(
            budget, (cfg.max_growth_frac * state.alive.sum()).astype(jnp.int32)
        )
    slot = jnp.where(
        sel_mask & (cand_rank < budget), dead_idx[jnp.clip(cand_rank, 0, C - 1)], C
    )
    all_idx = jnp.arange(C)
    clone_slot = jnp.where(clone_mask, slot, C)
    split_slot = jnp.where(split_mask, slot, C)
    # splits whose second child found no slot degrade to in-place shrink only.
    # Under a growth budget, over-budget splits should NOT shrink in place
    # either — they keep their parent untouched.
    if cfg.max_growth_frac > 0:
        split_mask = split_mask & (cand_rank < budget)

    # --- clones: verbatim copy -----------------------------------------
    new_params = _scatter_params(p, all_idx, clone_slot)

    # --- splits: sample children ---------------------------------------
    k1, k2 = jax.random.split(rng)
    scales = jnp.exp(p.scaling)
    R = quat_to_rotmat(p.rotation)
    eps0 = jax.random.normal(k1, (C, 3)) * scales
    eps1 = jax.random.normal(k2, (C, 3)) * scales
    child0_xyz = p.xyz + jnp.einsum("nij,nj->ni", R, eps0)
    child1_xyz = p.xyz + jnp.einsum("nij,nj->ni", R, eps1)
    child_scaling = p.scaling - jnp.log(cfg.split_scale_div * cfg.split_n)

    # child #1 → dead slot
    child1 = GaussianParams(
        xyz=child1_xyz,
        sh_dc=p.sh_dc,
        sh_rest=p.sh_rest,
        scaling=child_scaling,
        rotation=p.rotation,
        opacity=p.opacity,
    )
    new_params = GaussianParams(
        *(
            getattr(new_params, f).at[split_slot].set(getattr(child1, f), mode="drop")
            for f in GaussianParams._fields
        )
    )
    # child #0 → parent slot, in place
    sm = split_mask
    new_params = GaussianParams(
        xyz=jnp.where(sm[:, None], child0_xyz, new_params.xyz),
        sh_dc=new_params.sh_dc,
        sh_rest=new_params.sh_rest,
        scaling=jnp.where(sm[:, None], child_scaling, new_params.scaling),
        rotation=new_params.rotation,
        opacity=new_params.opacity,
    )

    # --- alive mask & prune --------------------------------------------
    alive = state.alive
    alive = alive.at[clone_slot].set(True, mode="drop")
    alive = alive.at[split_slot].set(True, mode="drop")
    new_opac_act = jax.nn.sigmoid(new_params.opacity)
    # non-finite scrub (reference gaussian_model.py:738-739): a row whose
    # params blew up renders as permanently-culled garbage — without this
    # the r3 analytic 30k run carried 259931/259939 NaN rows to the end
    # (training loss stayed finite because the raster culls them) and the
    # saved checkpoint was unusable
    finite = (
        jnp.isfinite(new_params.xyz).all(-1)
        & jnp.isfinite(new_params.scaling).all(-1)
        & jnp.isfinite(new_params.rotation).all(-1)
        & jnp.isfinite(new_params.opacity)
        & jnp.isfinite(new_params.sh_dc).all(-1)
        & jnp.isfinite(new_params.sh_rest).all((-1, -2))
    )
    prune = alive & (
        (~state.protected & (new_opac_act < cfg.min_opacity)) | ~finite
    )
    alive = alive & ~prune

    # --- bookkeeping ----------------------------------------------------
    touched = jnp.zeros((C,), bool)
    touched = touched.at[clone_slot].set(True, mode="drop")
    touched = touched.at[split_slot].set(True, mode="drop")
    touched = touched | sm | prune  # split parents and pruned slots reset too
    new_opt = reset_moments_at(opt, touched)

    protected = state.protected  # new slots inherit False
    # reset stats by zeroing the existing buffers (NOT fresh jnp.zeros: three
    # identical constants would be CSE'd into one aliased buffer, breaking
    # donation of the state into the next train_step — see utils/buffers.py)
    new_state = state._replace(
        params=new_params,
        alive=alive,
        grad_max=state.grad_max * 0.0,
        grad_abs_max=state.grad_abs_max * 0.0,
        max_radii2d=state.max_radii2d * 0.0,
        protected=protected,
    )
    # score quantiles among alive gaussians — for threshold calibration
    # (scores of dead slots replaced by NaN and ignored)
    score_alive = jnp.where(state.alive, score, jnp.nan)
    q = jnp.nanpercentile(score_alive, jnp.array([50.0, 90.0, 99.0]))
    qg = jnp.nanpercentile(
        jnp.where(state.alive, state.grad_max, jnp.nan), jnp.array([50.0, 99.0])
    )
    qr = jnp.nanpercentile(
        jnp.where(state.alive, state.max_radii2d, jnp.nan), jnp.array([50.0, 99.0])
    )
    info = {
        "n_clone": n_clone,
        "n_split": n_split,
        "n_pruned": prune.sum(),
        "n_alive": alive.sum(),
        "n_dropped": jnp.maximum(n_clone + n_split - budget, 0),
        "score_p50": q[0],
        "score_p90": q[1],
        "score_p99": q[2],
        "grad_p50": qg[0],
        "grad_p99": qg[1],
        "radii_p50": qr[0],
        "radii_p99": qr[1],
    }
    return new_state, new_opt, info


@jax.jit
def scrub_nonfinite(state: GaussianState):
    """Kill alive rows whose params went non-finite. The same scrub
    densify_and_prune applies (reference gaussian_model.py:738-739), exposed
    standalone so the trainer can keep running it AFTER the densification
    window closes: the r4 analytic 30k run diverged 139 rows between iters
    15k and 30k — past densify_until — and nothing scrubbed them until the
    checkpoint save tripped. Returns (state, n_killed)."""
    p = state.params
    finite = (
        jnp.isfinite(p.xyz).all(-1)
        & jnp.isfinite(p.scaling).all(-1)
        & jnp.isfinite(p.rotation).all(-1)
        & jnp.isfinite(p.opacity)
        & jnp.isfinite(p.sh_dc).all(-1)
        & jnp.isfinite(p.sh_rest).all((-1, -2))
    )
    killed = state.alive & ~finite
    return state._replace(alive=state.alive & finite), killed.sum()
