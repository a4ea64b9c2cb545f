"""Learning-rate schedules and per-leaf LR trees.

`expon_lr` is the reference's log-linear interpolation schedule with optional
delay (utils/general_utils.py:31-66 get_expon_lr_func); the LR tree mirrors
the six optimizer param groups (gaussian_model.py:290-309 training_setup,
arguments/__init__.py:92-104).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from hidegs_tpu.model.gaussians import GaussianParams


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-lerp from lr_init to lr_final over max_steps; smooth sine-ramped
    delay factor for the first lr_delay_steps. Works on traced step."""
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    out = delay_rate * log_lerp
    return jnp.where(jnp.asarray(lr_init) <= 0.0, 0.0, out)


@dataclass(frozen=True)
class LRConfig:
    """Defaults from OptimizationParams (arguments/__init__.py:92-104)."""

    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    feature_rest_div: float = 20.0
    opacity_lr: float = 5e-2
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    exposure_lr_init: float = 1e-3
    exposure_lr_final: float = 1e-4


def lr_tree(step, cfg: LRConfig, spatial_lr_scale) -> GaussianParams:
    """Per-leaf scalar LRs at `step` (traced-safe)."""
    pos_lr = (
        expon_lr(
            step,
            cfg.position_lr_init,
            cfg.position_lr_final,
            cfg.position_lr_max_steps,
            lr_delay_mult=cfg.position_lr_delay_mult,
            lr_delay_steps=0,
        )
        * spatial_lr_scale
    )
    return GaussianParams(
        xyz=pos_lr,
        sh_dc=jnp.asarray(cfg.feature_lr),
        sh_rest=jnp.asarray(cfg.feature_lr / cfg.feature_rest_div),
        scaling=jnp.asarray(cfg.scaling_lr),
        rotation=jnp.asarray(cfg.rotation_lr),
        opacity=jnp.asarray(cfg.opacity_lr),
    )
