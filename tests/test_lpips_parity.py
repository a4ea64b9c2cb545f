"""Architecture parity of the JAX VGG16-LPIPS against an independent torch
implementation (random weights — validates conv/pool/normalize/head wiring,
the part that matters for dropping in converted pretrained weights)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_vgg16_features():
    """Standard VGG16 'D' feature stack (conv+relu, maxpool between blocks)."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


def _torch_lpips(feats, lin_ws, img1, img2, shift, scale):
    """Reference-style LPIPS forward in torch (lpipsPyTorch modules/lpips.py)."""
    taps_idx = {3, 8, 15, 22, 29}  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

    def features(img):
        x = torch.from_numpy(img[None]).float() * 2.0 - 1.0
        x = (x - shift[:, None, None]) / scale[:, None, None]
        taps = []
        for i, layer in enumerate(feats):
            x = layer(x)
            if i in taps_idx:
                taps.append(x)
        return taps

    total = 0.0
    for (a, b), w in zip(zip(features(img1), features(img2)), lin_ws):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        total = total + (((a - b) ** 2) * w).sum(dim=1).mean()
    return float(total)


def test_lpips_matches_torch_reference():
    import jax.numpy as jnp

    from hidegs_tpu.train.lpips import (
        SCALE,
        SHIFT,
        VGG16_BLOCKS,
        lpips_distance,
        params_from_torch_modules,
    )

    torch.manual_seed(0)
    feats = _torch_vgg16_features()
    # keep activations in a sane range with random weights
    with torch.no_grad():
        for m in feats:
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.3 / m.weight.std()
                m.bias.zero_()
    convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
    rng = np.random.RandomState(1)
    lin_ws = [rng.rand(1, ch, 1, 1).astype(np.float32) for ch, _ in VGG16_BLOCKS]

    params = params_from_torch_modules(convs, lin_ws)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    img1 = rng.rand(3, 64, 64).astype(np.float32)
    img2 = np.clip(img1 + rng.randn(3, 64, 64).astype(np.float32) * 0.1, 0, 1)

    d_torch = _torch_lpips(
        feats, [torch.from_numpy(w) for w in lin_ws], img1, img2,
        torch.tensor(SHIFT), torch.tensor(SCALE),
    )
    d_jax = float(lpips_distance(params, jnp.asarray(img1), jnp.asarray(img2)))
    assert d_torch > 1e-5  # non-degenerate
    assert abs(d_jax - d_torch) / d_torch < 1e-3

    d_same = float(lpips_distance(params, jnp.asarray(img1), jnp.asarray(img1)))
    assert d_same < 1e-8


def test_converted_npz_roundtrip(tmp_path):
    import jax.numpy as jnp

    from hidegs_tpu.train.lpips import (
        VGG16_BLOCKS,
        load_lpips,
        params_from_torch_modules,
    )

    torch.manual_seed(2)
    feats = _torch_vgg16_features()
    convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
    params = params_from_torch_modules(convs)  # uniform heads
    out = tmp_path / "lpips_vgg.npz"
    np.savez(out, **params)

    fn = load_lpips(str(out))
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
    b = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
    assert float(fn(a, b)) > 0
    assert float(fn(a, a)) < 1e-8
