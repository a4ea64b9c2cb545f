"""Checkpoint / resume.

The reference captures full training state (params, densification
accumulators, optimizer state, spatial_lr_scale — gaussian_model.py:77-115)
and saves ply/pt artifacts per iteration under point_cloud/iteration_N
(scene/__init__.py:151-170, utils/system_utils.py:25-27 resume scan).

Here: the full TrainState pytree is serialized as an .npz (portable, no
framework lock-in) plus a reference-format .ply for interchange; resume scans
`iteration_*` dirs exactly like the reference.
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx) if hasattr(p, "idx") else str(p.name) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def check_alive_finite(gaussians, max_bad_frac: float = 0.01):
    """Count alive rows with non-finite params; raise if the fraction says
    the run diverged rather than a few stray rows blowing up.

    The r3 30k quality run saved a checkpoint with 259,931/259,939 NaN rows
    and nothing noticed until evaluation — the raster culls non-finite rows,
    so training loss stayed finite throughout. A handful of bad rows (the r4
    run had 139/262k appear after the densify window) is normal optimizer
    noise and is scrubbed by the caller; beyond `max_bad_frac` the model is
    actually corrupt and saving it would be lying. Returns (n_alive, bad
    row mask)."""
    alive = np.asarray(gaussians.alive)
    n_alive = int(alive.sum())
    bad = np.zeros_like(alive)
    for name in ("xyz", "scaling", "rotation", "opacity", "sh_dc", "sh_rest"):
        arr = np.asarray(getattr(gaussians.params, name))
        finite = np.isfinite(arr).reshape(arr.shape[0], -1).all(axis=1)
        bad |= alive & ~finite
    n_bad = int(bad.sum())
    if n_bad > max_bad_frac * max(n_alive, 1):
        raise FloatingPointError(
            f"checkpoint corrupt: {n_bad}/{n_alive} alive rows hold non-finite "
            "params (training diverged; see docs/quality_r3.json diagnosis)"
        )
    return n_alive, bad


def save_train_state(ts, directory: str, iteration: int, extras: Optional[dict] = None):
    """Write checkpoint dir: state.npz + point_cloud.ply + meta.json.

    Stray non-finite alive rows (≤1%) are scrubbed (marked dead) with a
    warning and recorded in meta.json; beyond that the save REFUSES
    (FloatingPointError) — the model diverged."""
    n_alive, bad = check_alive_finite(ts.gaussians)
    n_scrubbed = int(bad.sum())
    if n_scrubbed:
        print(
            f"  checkpoint: scrubbing {n_scrubbed}/{n_alive} non-finite alive "
            "rows before save",
            flush=True,
        )
        import jax.numpy as jnp

        ts = ts._replace(
            gaussians=ts.gaussians._replace(
                alive=ts.gaussians.alive & jnp.asarray(~bad)
            )
        )
    extras = dict(extras or {})
    extras.setdefault("n_scrubbed_at_save", n_scrubbed)
    d = os.path.join(directory, f"iteration_{iteration}")
    os.makedirs(d, exist_ok=True)
    arrays, _ = _flatten_with_paths(ts)
    np.savez_compressed(os.path.join(d, "state.npz"), **arrays)
    from hidegs_tpu.utils.ply import save_gaussian_ply

    save_gaussian_ply(os.path.join(d, "point_cloud.ply"), ts.gaussians)
    meta = {"iteration": iteration, "n_alive": int(ts.gaussians.alive.sum())}
    if extras:
        meta.update(extras)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    # exposure.json interchange (scene/__init__.py:164-170)
    expo = np.asarray(ts.exposure)
    with open(os.path.join(d, "exposure.json"), "w") as f:
        json.dump({str(i): expo[i].tolist() for i in range(len(expo))}, f)
    return d


def find_latest_iteration(directory: str) -> Optional[int]:
    """Scan `iteration_*` subdirs (searchForMaxIteration, utils/system_utils.py:25-27)."""
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        m = re.fullmatch(r"iteration_(\d+)", name)
        if m:
            it = int(m.group(1))
            best = it if best is None else max(best, it)
    return best


def load_train_state(template_ts, directory: str, iteration: int = -1):
    """Restore a TrainState saved by `save_train_state`. `template_ts` provides
    the pytree structure (shapes must match — same capacity/config)."""
    if iteration == -1:
        iteration = find_latest_iteration(directory)
        if iteration is None:
            raise FileNotFoundError(f"no iteration_* checkpoints in {directory}")
    d = os.path.join(directory, f"iteration_{iteration}")
    data = np.load(os.path.join(d, "state.npz"))
    arrays, treedef = _flatten_with_paths(template_ts)
    leaves = []
    for key in arrays:
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        saved = data[key]
        if saved.shape != arrays[key].shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {saved.shape} vs template {arrays[key].shape}"
            )
        leaves.append(jnp.asarray(saved))
    return jax.tree_util.tree_unflatten(treedef, leaves), iteration
