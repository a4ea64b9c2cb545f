"""View-parallel (data-parallel) multi-chip training step.

Design (SURVEY §2.4 "TPU-native equivalent"): training cameras are sharded
across chips — each device renders/differentiates its own view of the same
replicated Gaussian state; the mean over the view axis makes XLA insert the
gradient all-reduce over ICI (GSPMD), overlapped with the backward pass. The
masked sparse-Adam semantics generalize to "visible in ANY of the step's
views".
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hidegs_tpu.model.adam import masked_adam_update
from hidegs_tpu.model.schedules import expon_lr, lr_tree
from hidegs_tpu.train.loop import TrainConfig, TrainState, ViewBatch, compute_losses


def make_dp_train_step(
    cfg: TrainConfig,
    mesh: Mesh,
    use_exposure: bool = False,
    grad_reduce_dtype: Optional[jnp.dtype] = None,
    replicate_preprocessed: bool = False,
):
    """Build a jitted view-parallel step. `batch` is a ViewBatch whose leaves
    carry a leading view axis V (= mesh 'data' size). Returns
    (step(ts, batch) → (ts, metrics), place(ts, batch) → sharded copies).

    `grad_reduce_dtype` (e.g. jnp.bfloat16) compresses the per-view gradient
    all-reduce wire format (SURVEY §7.3 #7: up to 6M×59 floats per step —
    halving it matters on DCN across slices). Implemented as an explicit
    shard_map over the 'data' axis: local per-view grads are cast down,
    psum'd in the compressed dtype, and promoted back to f32 for Adam.
    None keeps the default implicit-GSPMD f32 reduction."""

    repl = NamedSharding(mesh, P())
    shard_view = NamedSharding(mesh, P("data"))

    if replicate_preprocessed:
        # Gaussian-sharded runs: preprocessing stays model-parallel, then the
        # compacted screen-space rows are replicated in ONE C-sized
        # all-gather before instance expansion — without this, GSPMD resolves
        # the expansion gather from a model-sharded operand as zero-fill +
        # an all-reduce over the (V·max_instances, 12) instance stream, which
        # scales with the instance budget instead of the capacity
        # (docs/SHARDING.md).
        import dataclasses as _dc

        def _repl_pre(pre):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, repl), pre
            )

        cfg = _dc.replace(cfg, raster=_dc.replace(cfg.raster, pre_constraint=_repl_pre))

    @partial(jax.jit, donate_argnums=(0,))
    def step(ts: TrainState, batch: ViewBatch) -> Tuple[TrainState, dict]:
        V = batch.image.shape[0]
        C = ts.gaussians.capacity
        rng, sub = jax.random.split(ts.rng)
        view_rngs = jax.random.split(sub, V)
        offsets = jnp.zeros((V, C, 2), jnp.float32)

        def loss_mean(params, exposure, offs, local_batch, local_rngs):
            def one(off, b, r):
                g = ts.gaussians._replace(params=params)
                return compute_losses(g, exposure, b, ts.step, r, cfg, off, use_exposure)

            totals, auxs = jax.vmap(one)(offs, local_batch, local_rngs)
            # sum/V (not a local mean): each shard contributes its share of
            # the global mean so the cross-device grad psum needs no rescale
            return jnp.sum(totals) / V, auxs

        if grad_reduce_dtype is None:
            (loss, auxs), grads = jax.value_and_grad(
                loss_mean, argnums=(0, 1, 2), has_aux=True
            )(ts.gaussians.params, ts.exposure, offsets, batch, view_rngs)
            param_grads, expo_grads, screen_grads = grads
        else:

            def local_grads(gaussians, step_no, exposure, offs, local_batch, local_rngs):
                # everything the loss closure touches is an explicit arg:
                # arrays captured by closure can't cross the shard_map
                # (Manual-mesh) boundary with their committed shardings
                def loss_local(params, expo, off_l):
                    def one(off, b, r):
                        g = gaussians._replace(params=params)
                        return compute_losses(
                            g, expo, b, step_no, r, cfg, off, use_exposure
                        )

                    totals, auxs = jax.vmap(one)(off_l, local_batch, local_rngs)
                    return jnp.sum(totals) / V, auxs

                (loss_l, auxs_l), grads_l = jax.value_and_grad(
                    loss_local, argnums=(0, 1, 2), has_aux=True
                )(gaussians.params, exposure, offs)
                p_g, e_g, s_g = grads_l
                down = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(grad_reduce_dtype), t
                )
                up = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), t
                )
                # compressed-wire all-reduce of the replicated-param grads;
                # screen grads stay per-view (local), no reduction needed
                p_g = up(jax.lax.psum(down(p_g), "data"))
                e_g = up(jax.lax.psum(down(e_g), "data"))
                loss_g = jax.lax.psum(loss_l, "data")
                return loss_g, auxs_l, p_g, e_g, s_g

            loss, auxs, param_grads, expo_grads, screen_grads = shard_map(
                local_grads,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
                out_specs=(P(), P("data"), P(), P(), P("data")),
                check_vma=False,
            )(ts.gaussians, ts.step, ts.exposure, offsets, batch, view_rngs)

        visible_any = jnp.any(auxs["visibility"], axis=0)
        lrs = lr_tree(ts.step, cfg.lr, ts.gaussians.spatial_lr_scale)
        new_params, new_opt = masked_adam_update(
            ts.gaussians.params, param_grads, ts.opt, lrs, visible_any
        )
        g_state = ts.gaussians._replace(params=new_params)

        # Per-view screenspace gradients: the mean loss contributes 1/V per
        # view, so scale back to single-view magnitude before the running-max
        # densification stat (matches the sequential loop's semantics); then
        # to the reference's (0.5·W, 0.5·H) NDC-gradient units like
        # train/loop.py (backward.cu:604,754).
        grad_scale = jnp.array(
            [0.5 * batch.cam.width, 0.5 * batch.cam.height], jnp.float32
        )
        sg = screen_grads * V * grad_scale  # (V, C, 2)
        gnorm = jnp.linalg.norm(sg[..., :2], axis=-1)  # (V, C)
        gabs = jnp.sum(jnp.abs(sg[..., :2]), axis=-1)
        vis = auxs["visibility"]  # (V, C)
        g_state = g_state._replace(
            grad_max=jnp.maximum(g_state.grad_max, jnp.max(jnp.where(vis, gnorm, 0.0), axis=0)),
            grad_abs_max=jnp.maximum(
                g_state.grad_abs_max, jnp.max(jnp.where(vis, gabs, 0.0), axis=0)
            ),
            max_radii2d=jnp.maximum(
                g_state.max_radii2d,
                jnp.max(jnp.where(vis, auxs["radii"].astype(jnp.float32), 0.0), axis=0),
            ),
        )

        if use_exposure:
            b1, b2, eps = 0.9, 0.999, 1e-8
            t = jnp.maximum(ts.step + 1, 1).astype(jnp.float32)
            m = b1 * ts.exposure_m + (1 - b1) * expo_grads
            v = b2 * ts.exposure_v + (1 - b2) * expo_grads**2
            lr_e = expon_lr(
                ts.step, cfg.lr.exposure_lr_init, cfg.lr.exposure_lr_final, cfg.iterations
            )
            new_expo = ts.exposure - lr_e * (m / (1 - b1**t)) / (jnp.sqrt(v / (1 - b2**t)) + eps)
        else:
            m, v, new_expo = ts.exposure_m, ts.exposure_v, ts.exposure

        new_ts = TrainState(
            gaussians=g_state,
            opt=new_opt,
            exposure=new_expo,
            exposure_m=m,
            exposure_v=v,
            step=ts.step + 1,
            rng=rng,
        )
        metrics = {
            k: jnp.mean(val) for k, val in auxs.items() if val.ndim <= 1 and k != "visibility"
        }
        metrics["loss"] = loss
        return new_ts, metrics

    def place(ts: TrainState, batch: ViewBatch, shard_gaussians: bool = False):
        """Device-place state and batch.

        Default: params replicated, batch view-sharded (pure DP). With
        `shard_gaussians`, gaussian-capacity-dim leaves shard over the
        'model' axis instead (SURVEY §2.4 row 2): per-gaussian preprocessing
        runs model-parallel and GSPMD inserts the all-gather of the visible
        screen-space data before binning/blending.
        """
        if shard_gaussians:
            C = ts.gaussians.capacity
            shard_g = NamedSharding(mesh, P("model"))

            def place_leaf(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == C:
                    return jax.device_put(x, shard_g)
                return jax.device_put(x, repl)

            ts = jax.tree_util.tree_map(place_leaf, ts)
        else:
            ts = jax.device_put(ts, repl)
        batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard_view), batch)
        return ts, batch

    return step, place


def stack_view_batches(batches) -> ViewBatch:
    """Stack a list of per-view ViewBatches along a new leading axis.
    All views must share image shape (same-resolution policy)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
