"""Evaluation entry point — `python -m hidegs_tpu.evaluate`.

Parity with eval.py (reference eval.py:275-427): loads a trained model at an
iteration, renders train/test cameras, saves gt/render pngs, reports masked
PSNR / SSIM / LPIPS per set. LPIPS uses a converted VGG weight file when one
exists ("calibrated-vgg"); otherwise a deterministic seeded-random VGG
fallback ("random-vgg", see train/lpips.py) so the metric is always finite.
The kind used is recorded as `lpips_kind` in results.json and the printout.
"""
from __future__ import annotations

import argparse
import json
import os
import jax.numpy as jnp
import numpy as np

from hidegs_tpu.config import ModelConfig, add_group, extract_group, get_combined_args
from hidegs_tpu.raster.api import RasterConfig, render
from hidegs_tpu.train.checkpoint import find_latest_iteration
from hidegs_tpu.train.losses import psnr, ssim


def load_gaussian_state_from_ply(path: str):
    """Checkpoint ply → arrays ready to render (activated)."""
    from hidegs_tpu.utils.ply import load_gaussian_arrays

    d = load_gaussian_arrays(path)
    shs = np.concatenate([d["sh_dc"][:, None, :], d["sh_rest"]], axis=1)
    return (
        jnp.asarray(d["xyz"]),
        jnp.exp(jnp.asarray(d["scaling"])),
        jnp.asarray(d["rotation"]),
        jnp.asarray(1.0 / (1.0 + np.exp(-d["opacity"]))),
        jnp.asarray(shs),
    )


def default_lpips_weights() -> str:
    """Converted-LPIPS weight discovery: $HIDEGS_LPIPS_WEIGHTS, then the
    conventional cache path. Produce the file once with
    `python -m hidegs_tpu.train.lpips --out ~/.cache/hidegs/lpips_vgg.npz`
    in an environment with the `lpips` pip package (train/lpips.py)."""
    env = os.environ.get("HIDEGS_LPIPS_WEIGHTS", "")
    if env and os.path.exists(env):
        return env
    cache = os.path.expanduser("~/.cache/hidegs/lpips_vgg.npz")
    return cache if os.path.exists(cache) else ""


def save_png(path: str, img_chw: np.ndarray):
    from PIL import Image

    arr = (np.clip(img_chw.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def evaluate_set(name, dataset, arrays, cfg: RasterConfig, out_dir, lpips_fn=None, save_images=True):
    results = []
    if save_images:
        os.makedirs(os.path.join(out_dir, name, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, name, "gt"), exist_ok=True)
    for i in range(len(dataset)):
        cam = dataset[i]
        out = render(*arrays, cam.cam_params(), config=cfg)
        img = jnp.clip(out["render"], 0.0, 1.0)
        gt = jnp.asarray(cam.image)
        mask = jnp.asarray(cam.alpha_mask) if cam.alpha_mask is not None else None
        if mask is not None:
            # reference multiplies the alpha mask into both images before all
            # metrics (eval.py:291-336)
            img = img * mask[None]
            gt = gt * mask[None]
        p = float(psnr(img, gt, mask))
        s = float(ssim(img, gt))
        l = float(lpips_fn(img, gt)) if lpips_fn else float("nan")
        results.append({"name": cam.info.image_name, "psnr": p, "ssim": s, "lpips": l})
        if save_images:
            save_png(os.path.join(out_dir, name, "renders", f"{i:05d}.png"), np.asarray(img))
            save_png(os.path.join(out_dir, name, "gt", f"{i:05d}.png"), np.asarray(gt))
    if results:
        mean = {
            k: float(np.mean([r[k] for r in results])) for k in ("psnr", "ssim", "lpips")
        }
    else:
        mean = {}
    return {"per_view": results, "mean": mean}


def main(argv=None):
    parser = argparse.ArgumentParser("hidegs_tpu eval")
    add_group(parser, ModelConfig())
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--no_images", action="store_true")
    parser.add_argument("--lpips_weights", type=str, default="")
    args = parser.parse_args(argv)
    cli_model = extract_group(args, ModelConfig)
    model_cfg, pipe_cfg, _ = get_combined_args(cli_model.model_path, cli_model)

    from hidegs_tpu.data.scene import load_scene

    scene = load_scene(
        model_cfg.source_path,
        images=model_cfg.images,
        eval_split=model_cfg.eval,
        resolution=model_cfg.resolution,
    )
    it = args.iteration
    ckpt_root = os.path.join(model_cfg.model_path, "point_cloud")
    if it == -1:
        it = find_latest_iteration(ckpt_root)
    ply = os.path.join(ckpt_root, f"iteration_{it}", "point_cloud.ply")
    arrays = load_gaussian_state_from_ply(ply)
    cfg = RasterConfig(backend=pipe_cfg.raster_backend, tile=pipe_cfg.tile,
                       max_instances=pipe_cfg.max_instances)

    from hidegs_tpu.train.lpips import default_lpips_fn

    weights = args.lpips_weights or default_lpips_weights()
    lpips_fn, lpips_kind = default_lpips_fn(weights)

    out_dir = os.path.join(model_cfg.model_path, f"eval_{it}")
    report = {"lpips_kind": lpips_kind}
    if not args.skip_train:
        report["train"] = evaluate_set(
            "train", scene.train_cameras, arrays, cfg, out_dir, lpips_fn, not args.no_images
        )
    if not args.skip_test and len(scene.test_cameras):
        report["test"] = evaluate_set(
            "test", scene.test_cameras, arrays, cfg, out_dir, lpips_fn, not args.no_images
        )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("lpips_kind", lpips_kind)
    for k, v in report.items():
        if isinstance(v, dict):
            print(k, v["mean"])
    return report


if __name__ == "__main__":
    main()
