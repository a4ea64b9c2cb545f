"""LPIPS perceptual metric (VGG16 variant) in pure JAX.

Architecture parity with the reference's lpipsPyTorch
(lpipsPyTorch/modules/lpips.py:8-36, networks.py): VGG16 conv features at the
5 standard taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), per-channel
unit-normalization, 1x1 linear heads, spatial mean, sum over taps.

This environment has no torchvision and no network egress, so pretrained
weights cannot be materialized here (verified: no .pth/.safetensors/.h5
weight file >1MB exists anywhere in the image). `convert_torch_weights`
turns the standard `lpips` pip package's VGG checkpoint into the .npz this
module loads and takes priority whenever such a file is present.

Without a weight file, `default_lpips_fn` falls back to a **deterministic
seeded-random VGG16** ("random-vgg" LPIPS). Random-feature perceptual
distance is a documented baseline in the original LPIPS paper (Zhang et al.
2018, Table 5: untrained nets still correlate far above pixel metrics); it
is monotone-useful for comparing checkpoints of the *same* run but its
absolute values are NOT comparable to calibrated LPIPS numbers — every
caller labels which kind was used (`lpips_kind` in eval reports).
"""
from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, num_convs) per block
VGG16_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# ImageNet normalization used by LPIPS "scaling layer"
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """NCHW conv3x3 SAME + bias. w: (out, in, 3, 3)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # metric stability: TPU default conv precision is bf16
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def vgg16_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) in [-?]; returns the 5 tap activations."""
    taps = []
    i = 0
    for bi, (ch, n_convs) in enumerate(VGG16_BLOCKS):
        for ci in range(n_convs):
            x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"])
            x = jax.nn.relu(x)
            i += 1
        taps.append(x)
        if bi < len(VGG16_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return taps


def lpips_distance(params: Dict[str, jnp.ndarray], img1: jnp.ndarray, img2: jnp.ndarray):
    """img: (3, H, W) in [0, 1] → scalar LPIPS."""

    def prep(img):
        x = img * 2.0 - 1.0  # [0,1] → [-1,1] (lpips convention)
        x = (x - jnp.asarray(SHIFT)[:, None, None]) / jnp.asarray(SCALE)[:, None, None]
        return x[None]

    f1 = vgg16_features(params, prep(img1))
    f2 = vgg16_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        diff = (a - b) ** 2
        w = params[f"lin{i}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(diff * w, axis=1))
    return total


def load_lpips(npz_path: str) -> Callable:
    """Load converted weights → jitted lpips(img1, img2) callable."""
    data = np.load(npz_path)
    params = {k: jnp.asarray(data[k]) for k in data.files}
    return jax.jit(lambda a, b: lpips_distance(params, a, b))


def default_lpips_fn(npz_path: str = "") -> tuple:
    """Best-available LPIPS callable → (jitted fn, kind-label).

    kind = "calibrated-vgg" when a converted weight file is given/exists,
    else "random-vgg" (seeded, deterministic across runs — see module
    docstring for what that does and does not mean).
    """
    if npz_path:
        return load_lpips(npz_path), "calibrated-vgg"
    params = random_lpips_params(jax.random.PRNGKey(0))
    return jax.jit(lambda a, b: lpips_distance(params, a, b)), "random-vgg"


def random_lpips_params(key=None) -> Dict[str, jnp.ndarray]:
    """Deterministic random-weight instance (seeded fallback; module docstring)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    params = {}
    in_ch = 3
    i = 0
    for ch, n_convs in VGG16_BLOCKS:
        for _ in range(n_convs):
            key, k1 = jax.random.split(key)
            params[f"conv{i}_w"] = jax.random.normal(k1, (ch, in_ch, 3, 3)) * (
                1.0 / np.sqrt(in_ch * 9)
            )
            params[f"conv{i}_b"] = jnp.zeros((ch,))
            in_ch = ch
            i += 1
    for j, (ch, _) in enumerate(VGG16_BLOCKS):
        params[f"lin{j}_w"] = jnp.ones((1, ch, 1, 1)) / ch
    return params


def params_from_torch_modules(conv_modules, lin_weights=None) -> Dict[str, np.ndarray]:
    """Map torch Conv2d modules (in VGG16 feature order) + optional LPIPS
    1x1 linear-head weights to this module's parameter dict.

    `conv_modules`: the 13 VGG16 Conv2d layers in forward order.
    `lin_weights`: 5 arrays of shape (1, C, 1, 1) (the lpips package's
    `net.lins[j].model[-1].weight`); uniform 1/C heads when omitted.
    """
    n_convs = sum(n for _, n in VGG16_BLOCKS)
    assert len(conv_modules) == n_convs, f"expected {n_convs} convs"
    params: Dict[str, np.ndarray] = {}
    for i, m in enumerate(conv_modules):
        params[f"conv{i}_w"] = np.asarray(m.weight.detach().cpu().numpy(), np.float32)
        params[f"conv{i}_b"] = np.asarray(m.bias.detach().cpu().numpy(), np.float32)
    for j, (ch, _) in enumerate(VGG16_BLOCKS):
        if lin_weights is not None:
            w = np.asarray(lin_weights[j], np.float32).reshape(1, ch, 1, 1)
        else:
            w = np.full((1, ch, 1, 1), 1.0 / ch, np.float32)
        params[f"lin{j}_w"] = w
    return params


def convert_torch_weights(out_npz: str, source: str = "lpips"):
    """Convert pretrained torch weights to the .npz `load_lpips` reads.

    Run in an environment with the needed packages/caches (this container has
    neither torchvision nor network egress):
      * source="lpips": the `lpips` pip package's calibrated VGG LPIPS
        (conv trunk + linear heads) — exact reference parity
        (lpipsPyTorch/modules/lpips.py:8-36).
      * source="torchvision": torchvision's ImageNet VGG16 trunk with
        uniform heads (uncalibrated fallback).
    """
    import torch

    if source == "lpips":
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        convs = [m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)]
        lins = [lin.model[-1].weight.detach().cpu().numpy() for lin in net.lins]
        params = params_from_torch_modules(convs, lins)
    elif source == "torchvision":
        from torchvision.models import VGG16_Weights, vgg16

        feats = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features
        convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
        params = params_from_torch_modules(convs)
    else:
        raise ValueError(f"unknown source {source!r}")
    np.savez(out_npz, **params)
    return params


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=convert_torch_weights.__doc__)
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--source", default="lpips", choices=["lpips", "torchvision"])
    a = p.parse_args(argv)
    params = convert_torch_weights(a.out, a.source)
    print(f"wrote {len(params)} arrays to {a.out}")


if __name__ == "__main__":
    main()
