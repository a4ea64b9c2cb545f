"""Per-image appearance models.

Two mechanisms, mirroring the reference:
  * full 3x4 exposure matrices per image (gaussian_model.py:284-287,
    render:181-184) — implemented in train/loop.py (TrainState.exposure);
  * `AppModel`: per-image (a, b) gain/offset pair with its own Adam
    (scene/app_model.py:9-32) — PGSR-style alternative, kept for parity.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hidegs_tpu.utils.buffers import fresh_zeros


class AppModel(NamedTuple):
    a: jnp.ndarray  # (num_images,) multiplicative (stored as exp(a))
    b: jnp.ndarray  # (num_images,) additive
    m_a: jnp.ndarray
    v_a: jnp.ndarray
    m_b: jnp.ndarray
    v_b: jnp.ndarray
    step: jnp.ndarray


def init_app_model(num_images: int) -> AppModel:
    return AppModel(
        a=fresh_zeros((num_images,)),
        b=fresh_zeros((num_images,)),
        m_a=fresh_zeros((num_images,)),
        v_a=fresh_zeros((num_images,)),
        m_b=fresh_zeros((num_images,)),
        v_b=fresh_zeros((num_images,)),
        step=jnp.zeros((), jnp.int32),
    )


def apply_appearance(app: AppModel, image: jnp.ndarray, idx) -> jnp.ndarray:
    """image (3,H,W) → exp(a)·image + b for image `idx`."""
    return jnp.exp(app.a[idx]) * image + app.b[idx]


def appearance_update(
    app: AppModel, grad_a, grad_b, idx, lr: float = 1e-3,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> AppModel:
    """Sparse Adam step on one image's (a, b) (app_model.py:20-27)."""
    step = app.step + 1
    t = step.astype(jnp.float32)

    def upd(p, g, m, v):
        m2 = m.at[idx].set(b1 * m[idx] + (1 - b1) * g)
        v2 = v.at[idx].set(b2 * v[idx] + (1 - b2) * g * g)
        mh = m2[idx] / (1 - b1**t)
        vh = v2[idx] / (1 - b2**t)
        p2 = p.at[idx].add(-lr * mh / (jnp.sqrt(vh) + eps))
        return p2, m2, v2

    a2, ma2, va2 = upd(app.a, grad_a, app.m_a, app.v_a)
    b2_, mb2, vb2 = upd(app.b, grad_b, app.m_b, app.v_b)
    return AppModel(a=a2, b=b2_, m_a=ma2, v_a=va2, m_b=mb2, v_b=vb2, step=step)
