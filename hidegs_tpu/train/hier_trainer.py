"""Hierarchy post-optimization: fine-tune a built hierarchy end-to-end.

The reference trains leaves, builds the hierarchy offline, then post-optimizes
the hierarchy with LOD-cut renders and the sparse optimizer (h3dgs flow; the
pieces live in create_from_hier gaussian_model.py:358-431 — opacity
activation switches to |x| — plus render_post and OurAdam.step(relevant)).

Here: hierarchy gaussians become a GaussianParams pytree (log-scale, |x|
opacity), each step draws a camera, selects its LOD cut (non-differentiable),
renders through the differentiable interpolation path, and applies the masked
sparse Adam to every gaussian the cut touched (selected nodes AND their
parents — the TPU analog of the CUDA parent-gradient path, which autodiff
already routes through the interpolation lerp).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.core.transforms import normalize
from hidegs_tpu.hier.interp import interpolate_cut
from hidegs_tpu.hier.io import Hierarchy
from hidegs_tpu.hier.lod import HierCut, expand_to_size
from hidegs_tpu.model.adam import AdamState, init_adam, masked_adam_update
from hidegs_tpu.model.gaussians import GaussianParams
from hidegs_tpu.model.schedules import LRConfig, lr_tree
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.losses import dssim_l1


class HierTrainState(NamedTuple):
    # NOTE: skybox_count deliberately NOT a field — as a pytree leaf it would
    # be traced under jit but must stay static (it sizes concatenations).
    params: GaussianParams
    opt: AdamState
    nodes: jnp.ndarray  # (N, 7) static topology
    boxes: jnp.ndarray  # (N, 2, 4)
    step: jnp.ndarray
    rng: jax.Array
    # per-image exposure compensation (create_from_hier loads pretrained
    # exposures alongside the .hier, gaussian_model.py:358-431); identity
    # when none were provided
    exposure: jnp.ndarray = None  # (E, 3, 4)
    exposure_m: jnp.ndarray = None
    exposure_v: jnp.ndarray = None


def state_from_hierarchy(
    h: Hierarchy, seed: int = 0, num_images: int = 1,
    exposures: Optional[np.ndarray] = None,
) -> HierTrainState:
    """`exposures` ((E, 3, 4), e.g. from load_exposures) seeds the per-image
    compensation the reference ingests with a pretrained hierarchy; identity
    otherwise."""
    params = GaussianParams(
        xyz=jnp.asarray(h.pos),
        sh_dc=jnp.asarray(h.shs[:, 0, :]),
        sh_rest=jnp.asarray(h.shs[:, 1:, :]),
        scaling=jnp.asarray(h.scale),  # already log
        rotation=jnp.asarray(h.rot),
        opacity=jnp.asarray(h.alpha),  # |x| activation, stored activated
    )
    if exposures is not None:
        expo = jnp.asarray(np.asarray(exposures, np.float32))
        num_images = expo.shape[0]
    else:
        eye34 = jnp.zeros((3, 4)).at[:, :3].set(jnp.eye(3))
        expo = jnp.tile(eye34[None], (max(num_images, 1), 1, 1))
    return HierTrainState(
        params=params,
        opt=init_adam(params),
        nodes=jnp.asarray(h.nodes),
        boxes=jnp.asarray(h.boxes),
        step=jnp.int32(0),
        rng=jax.random.PRNGKey(seed),
        exposure=expo,
        exposure_m=jnp.zeros_like(expo),
        exposure_v=jnp.zeros_like(expo),
    )


def load_exposures(path: str, image_names=None) -> Optional[np.ndarray]:
    """Read an exposure.json (saved by train/checkpoint.py or the reference's
    scene/__init__.py:164-170) into an (E, 3, 4) array. Keys may be image
    names or integer indices; `image_names` orders name-keyed files."""
    import json
    import os

    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    if not d:
        return None
    if image_names is not None and any(k in d for k in image_names):
        eye = np.zeros((3, 4), np.float32)
        eye[:, :3] = np.eye(3)
        return np.stack([
            np.asarray(d.get(name, eye), np.float32) for name in image_names
        ])
    if not all(k.isdigit() for k in d):
        # name-keyed file but no image_names to order it: JSON insertion
        # order matched against cameras by index would silently mispair
        # exposures with images (ADVICE r4 low)
        raise ValueError(
            f"{path} is keyed by image names; pass image_names= to order it"
        )
    keys = sorted(d.keys(), key=int)
    return np.stack([np.asarray(d[k], np.float32) for k in keys])


def hierarchy_to_arrays(params: GaussianParams):
    """Activated rendering arrays from hierarchy params (|x| opacity)."""
    return (
        params.xyz,
        jnp.exp(params.scaling),
        normalize(params.rotation),
        jnp.abs(params.opacity),
        jnp.concatenate([params.sh_dc[:, None, :], params.sh_rest], axis=1),
    )


def select_cut(ts: HierTrainState, cam, target_size: float, budget: int) -> HierCut:
    vp = jnp.asarray(np.asarray(cam.camera_center))
    return expand_to_size(
        ts.nodes, ts.boxes, target_size, vp, budget=budget,
        num_points=int(ts.params.xyz.shape[0]),
    )


@partial(
    jax.jit,
    static_argnames=(
        "raster_cfg", "lambda_dssim", "skybox_count", "use_exposure",
        "optimize_exposure",
    ),
    donate_argnums=(0,),
)
def hier_train_step(
    ts: HierTrainState,
    cut: HierCut,
    cam,
    gt_image: jnp.ndarray,
    lr_cfg_tree: GaussianParams,
    raster_cfg: RasterConfig,
    lambda_dssim: float = 0.2,
    skybox_count: int = 0,
    frozen: jnp.ndarray | None = None,
    image_idx: jnp.ndarray | int = 0,
    use_exposure: bool = False,
    optimize_exposure: bool = False,
):
    """One post-opt step on a fixed LOD cut. `frozen` (P,) bool excludes
    gaussians from the sparse update — used for anchors.bin gaussians, which
    render at full detail from every training view and must keep their
    chunk-trained appearance (anchors loaded at gaussian_model.py:366-374).

    `use_exposure` applies ts.exposure[image_idx] to the render (the
    pretrained-exposure ingestion of create_from_hier,
    gaussian_model.py:358-431); `optimize_exposure` additionally trains it
    with a small dense Adam like the main loop's exposure optimizer."""
    rng, _ = jax.random.split(ts.rng)
    P = ts.params.xyz.shape[0]
    idx = jnp.asarray(image_idx, jnp.int32)

    def loss_fn(params, exposure):
        xyz, scales, quats, opac, shs = hierarchy_to_arrays(params)
        ig = interpolate_cut(cut, xyz, scales, quats, opac, shs, skybox_count)
        out = render(
            ig.means3d, ig.scales, ig.quats, ig.opacities, ig.shs, cam,
            config=raster_cfg,
        )
        img = out["render"]
        if use_exposure:
            from hidegs_tpu.train.loop import apply_exposure

            img = apply_exposure(img, exposure[idx])
        img = jnp.clip(img, 0.0, 1.0)
        return dssim_l1(img, gt_image, lambda_dssim)

    loss, (grads, expo_grads) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        ts.params, ts.exposure
    )

    # visible = gaussians referenced by the cut (children) or as parents
    visible = jnp.zeros((P,), bool)
    visible = visible.at[cut.render_indices].set(cut.valid, mode="drop")
    visible = visible.at[cut.parent_indices].set(cut.valid, mode="drop")
    if skybox_count:
        visible = visible.at[P - skybox_count :].set(True)
    if frozen is not None:
        visible = visible & ~frozen

    new_params, new_opt = masked_adam_update(ts.params, grads, ts.opt, lr_cfg_tree, visible)
    if use_exposure and optimize_exposure:
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = jnp.maximum(ts.step + 1, 1).astype(jnp.float32)
        m = b1 * ts.exposure_m + (1 - b1) * expo_grads
        v = b2 * ts.exposure_v + (1 - b2) * expo_grads**2
        new_expo = ts.exposure - 1e-3 * (m / (1 - b1**t)) / (
            jnp.sqrt(v / (1 - b2**t)) + eps
        )
    else:
        m, v, new_expo = ts.exposure_m, ts.exposure_v, ts.exposure
    return (
        ts._replace(
            params=new_params, opt=new_opt, step=ts.step + 1, rng=rng,
            exposure=new_expo, exposure_m=m, exposure_v=v,
        ),
        {"loss": loss, "n_visible": visible.sum()},
    )


def post_optimize(
    h: Hierarchy,
    cameras,
    images,
    iterations: int = 2000,
    target_size: float = 0.01,
    budget: Optional[int] = None,
    raster_cfg: Optional[RasterConfig] = None,
    lr_cfg: Optional[LRConfig] = None,
    skybox_count: int = 0,
    log_every: int = 100,
    anchors=None,
    exposures: Optional[np.ndarray] = None,
    optimize_exposure: bool = False,
) -> HierTrainState:
    """Host loop: post-optimize `h` against (cameras[i], images[i]) pairs.
    `anchors` (int32 indices from io.read_anchors) are frozen throughout.
    `exposures` ((len(cameras), 3, 4)) seeds per-image compensation (the
    create_from_hier pretrained-exposure ingestion); `optimize_exposure`
    trains it (fresh identity when no seed was given)."""
    import random as _random

    ts = state_from_hierarchy(
        h, num_images=len(cameras), exposures=exposures
    )
    use_expo = exposures is not None or optimize_exposure
    frozen = None
    if anchors is not None and len(anchors):
        frozen = jnp.zeros((h.num_points,), bool).at[jnp.asarray(anchors)].set(True)
    budget = budget or 1 << int(np.ceil(np.log2(max(h.num_points, 1024))))
    raster_cfg = raster_cfg or RasterConfig(backend="jnp", max_instances=1 << 18)
    lr_cfg = lr_cfg or LRConfig()
    rnd = _random.Random(0)
    for it in range(1, iterations + 1):
        i = rnd.randrange(len(cameras))
        cut = select_cut(ts, cameras[i], target_size, budget)
        lrs = lr_tree(ts.step, lr_cfg, jnp.float32(1.0))
        ts, m = hier_train_step(
            ts, cut, cameras[i], jnp.asarray(images[i]), lrs, raster_cfg,
            skybox_count=skybox_count, frozen=frozen,
            image_idx=i, use_exposure=use_expo,
            optimize_exposure=optimize_exposure,
        )
        if it % log_every == 0:
            print(f"[hier {it}/{iterations}] loss={float(m['loss']):.4f} "
                  f"visible={int(m['n_visible'])}", flush=True)
    return ts


def hierarchy_from_state(ts: HierTrainState, h_template: Hierarchy) -> Hierarchy:
    """Write optimized params back into a Hierarchy (for save_hier)."""
    return Hierarchy(
        pos=np.asarray(ts.params.xyz),
        rot=np.asarray(normalize(ts.params.rotation)),
        scale=np.asarray(ts.params.scaling),
        alpha=np.asarray(jnp.abs(ts.params.opacity)),
        shs=np.asarray(
            jnp.concatenate([ts.params.sh_dc[:, None, :], ts.params.sh_rest], axis=1)
        ),
        nodes=h_template.nodes,
        boxes=h_template.boxes,
    )
