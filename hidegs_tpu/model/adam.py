"""Visibility-masked sparse Adam.

TPU-native equivalent of the reference's `OurAdam.step(relevant)`
(scene/OurAdam.py:106-175): the CUDA version gathers moments at the visible
indices, updates, and scatters back; on TPU a dense *masked* update is the
same math at full speed (no gather/scatter needed) — moments and params of
non-visible gaussians stay exactly frozen, including the bias-correction
step count, which we therefore track **per gaussian**.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hidegs_tpu.model.gaussians import GaussianParams


class AdamState(NamedTuple):
    m: GaussianParams  # first moments, same pytree as params
    v: GaussianParams  # second moments
    step: jnp.ndarray  # (C,) int32 per-gaussian step count (sparse semantics)


def init_adam(params: GaussianParams) -> AdamState:
    from hidegs_tpu.utils.buffers import fresh_zeros_like

    # fresh_zeros_like: m and v MUST NOT alias (states are donated to the
    # jitted train step; see utils/buffers.py).
    C = params.xyz.shape[0]
    return AdamState(
        m=jax.tree_util.tree_map(fresh_zeros_like, params),
        v=jax.tree_util.tree_map(fresh_zeros_like, params),
        step=fresh_zeros_like(jnp.zeros((C,), jnp.int32)),
    )


def _bcast(mask_or_vec, like):
    """Broadcast a (C,) vector over trailing dims of `like`."""
    extra = like.ndim - 1
    return mask_or_vec.reshape(mask_or_vec.shape + (1,) * extra)


def masked_adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    opt: AdamState,
    lr: GaussianParams,
    visible: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One sparse-Adam step over the `visible` mask.

    `lr` is a pytree of scalar learning rates (one per parameter leaf —
    mirrors the reference's six param groups, gaussian_model.py:290-309).
    Returns (new_params, new_opt). eps matches OurAdam's 1e-15 default.
    """
    step = opt.step + visible.astype(jnp.int32)
    t = jnp.maximum(step, 1).astype(jnp.float32)
    c1 = 1.0 - b1 ** t  # (C,) per-gaussian bias correction
    c2 = 1.0 - b2 ** t

    def leaf(p, g, m, v, lr_leaf):
        msk = _bcast(visible, p).astype(p.dtype)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * (g * g)
        m_new = jnp.where(msk > 0, m_new, m)
        v_new = jnp.where(msk > 0, v_new, v)
        m_hat = m_new / _bcast(c1, p)
        v_hat = v_new / _bcast(c2, p)
        upd = lr_leaf * m_hat / (jnp.sqrt(v_hat) + eps)
        p_new = jnp.where(msk > 0, p - upd, p)
        return p_new, m_new, v_new

    triples = {
        name: leaf(
            getattr(params, name),
            getattr(grads, name),
            getattr(opt.m, name),
            getattr(opt.v, name),
            getattr(lr, name),
        )
        for name in GaussianParams._fields
    }
    new_params = GaussianParams(**{k: t[0] for k, t in triples.items()})
    new_m = GaussianParams(**{k: t[1] for k, t in triples.items()})
    new_v = GaussianParams(**{k: t[2] for k, t in triples.items()})
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def reset_opacity_moments(opt: AdamState) -> AdamState:
    """Zero the opacity group's Adam moments — the reference's reset_opacity
    replaces the optimizer tensor with zeroed exp_avg/exp_avg_sq for that
    param group (gaussian_model.py:542-560 via replace_tensor_to_optimizer).
    Without this, stale second moments keep the post-reset opacity step tiny
    and recovery from the clamp takes hundreds of iterations (the eval
    craters observed at reset steps in docs/convergence_r1_fixed.json)."""
    return opt._replace(
        m=opt.m._replace(opacity=jnp.zeros_like(opt.m.opacity)),
        v=opt.v._replace(opacity=jnp.zeros_like(opt.v.opacity)),
    )


def reset_moments_at(opt: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero Adam state where mask is True — the padded-buffer equivalent of
    the reference's optimizer tensor surgery on densify/prune
    (gaussian_model.py:560-631)."""

    def zero(leaf):
        return jnp.where(_bcast(mask, leaf), 0.0, leaf)

    return AdamState(
        m=jax.tree_util.tree_map(zero, opt.m),
        v=jax.tree_util.tree_map(zero, opt.v),
        step=jnp.where(mask, 0, opt.step),
    )
