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


def _numpy_conv3x3_same(x, w, b):
    """Handwritten NCHW conv3x3 SAME in pure numpy: x (C,H,W), w (O,C,3,3)."""
    C, H, W = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    out = np.zeros((w.shape[0], H, W), np.float64)
    for dy in range(3):
        for dx in range(3):
            # (O,C) @ (C, H*W) accumulated per kernel tap
            patch = xp[:, dy:dy + H, dx:dx + W].reshape(C, -1)
            out += (w[:, :, dy, dx].astype(np.float64) @ patch).reshape(-1, H, W)
    return out + b[:, None, None]


def _numpy_lpips(params, img1, img2, shift, scale):
    """Full handwritten LPIPS evaluation (float64 numpy) — an oracle that is
    independent of both the JAX and the torch implementations."""
    from hidegs_tpu.train.lpips import VGG16_BLOCKS

    def features(img):
        x = img.astype(np.float64) * 2.0 - 1.0
        x = (x - shift[:, None, None]) / scale[:, None, None]
        taps, i = [], 0
        for bi, (ch, n_convs) in enumerate(VGG16_BLOCKS):
            for _ in range(n_convs):
                x = np.maximum(_numpy_conv3x3_same(x, params[f"conv{i}_w"], params[f"conv{i}_b"]), 0.0)
                i += 1
            taps.append(x)
            if bi < len(VGG16_BLOCKS) - 1:
                C, H, W = x.shape
                x = x[:, : H - H % 2, : W - W % 2]
                x = x.reshape(C, H // 2, 2, W // 2, 2).max(axis=(2, 4))
        return taps

    total = 0.0
    for (a, b), j in zip(zip(features(img1), features(img2)), range(5)):
        a = a / np.maximum(np.linalg.norm(a, axis=0, keepdims=True), 1e-10)
        b = b / np.maximum(np.linalg.norm(b, axis=0, keepdims=True), 1e-10)
        w = params[f"lin{j}_w"].reshape(-1)[:, None, None]
        total += ((a - b) ** 2 * w).sum(axis=0).mean()
    return float(total)


def test_lpips_matches_handwritten_numpy_oracle():
    """Numeric parity of the full metric against a handwritten float64 numpy
    evaluation on small inputs (VERDICT r1 item 3)."""
    import jax.numpy as jnp

    from hidegs_tpu.train.lpips import SCALE, SHIFT, lpips_distance, random_lpips_params

    params = random_lpips_params()
    np_params = {k: np.asarray(v) for k, v in params.items()}
    rng = np.random.RandomState(7)
    img1 = rng.rand(3, 16, 16).astype(np.float32)
    img2 = np.clip(img1 + 0.15 * rng.randn(3, 16, 16).astype(np.float32), 0, 1)

    d_np = _numpy_lpips(np_params, img1, img2, SHIFT.astype(np.float64), SCALE.astype(np.float64))
    d_jax = float(lpips_distance(params, jnp.asarray(img1), jnp.asarray(img2)))
    assert d_np > 1e-6
    assert abs(d_jax - d_np) / d_np < 5e-3


def _fake_lpips_package(monkeypatch, seed=11):
    """Install a stub `lpips` pip package into sys.modules whose LPIPS(net=
    'vgg') object exposes the exact attribute paths convert_torch_weights
    traverses (net.net Conv2d modules + net.lins[j].model[-1].weight)."""
    import sys
    import types

    import torch.nn as nn

    from hidegs_tpu.train.lpips import VGG16_BLOCKS

    torch.manual_seed(seed)
    feats = _torch_vgg16_features()
    # keep activations in a sane range with random weights (unit-normalizing
    # vanishing activations would amplify float noise)
    with torch.no_grad():
        for m in feats:
            if isinstance(m, nn.Conv2d):
                m.weight *= 0.3 / m.weight.std()
                m.bias.zero_()

    class _Lin(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.model = nn.Sequential(nn.Dropout(), nn.Conv2d(ch, 1, 1, bias=False))

    class _FakeLPIPS(nn.Module):
        def __init__(self, net="vgg"):
            super().__init__()
            assert net == "vgg"
            self.net = feats
            self.lins = nn.ModuleList([_Lin(ch) for ch, _ in VGG16_BLOCKS])

    torch.manual_seed(seed + 1)
    singleton = _FakeLPIPS()

    mod = types.ModuleType("lpips")
    # every LPIPS() instantiation must return the SAME weights (the real
    # package loads fixed pretrained tensors)
    mod.LPIPS = lambda net="vgg": singleton
    monkeypatch.setitem(sys.modules, "lpips", mod)
    return feats


def test_convert_torch_weights_end_to_end(tmp_path, monkeypatch):
    """convert_torch_weights('lpips') against a synthetic torch checkpoint:
    the converted .npz, loaded through load_lpips, must reproduce the torch
    reference computation with the same weights (VERDICT r1 item 3). The
    documented offline command is
    `python -m hidegs_tpu.train.lpips --out lpips_vgg.npz --source lpips`."""
    import jax.numpy as jnp

    from hidegs_tpu.train.lpips import SCALE, SHIFT, convert_torch_weights, load_lpips

    feats = _fake_lpips_package(monkeypatch)
    out = tmp_path / "lpips_vgg.npz"
    params = convert_torch_weights(str(out), source="lpips")
    assert out.exists() and len(params) == 13 * 2 + 5

    fn = load_lpips(str(out))
    rng = np.random.RandomState(5)
    img1 = rng.rand(3, 48, 48).astype(np.float32)
    img2 = np.clip(img1 + 0.2 * rng.randn(3, 48, 48).astype(np.float32), 0, 1)

    import lpips as fake

    net = fake.LPIPS(net="vgg")
    lin_ws = [lin.model[-1].weight.detach() for lin in net.lins]
    d_torch = _torch_lpips(
        feats, [w.reshape(1, -1, 1, 1) for w in lin_ws], img1, img2,
        torch.tensor(SHIFT), torch.tensor(SCALE),
    )
    d_jax = float(fn(jnp.asarray(img1), jnp.asarray(img2)))
    assert abs(d_jax - d_torch) <= 1e-3 * max(abs(d_torch), 1e-3)


def test_evaluate_set_reports_real_lpips(tmp_path):
    """evaluate.py's metric loop produces a finite LPIPS once weights exist."""
    import jax.numpy as jnp

    from hidegs_tpu.evaluate import evaluate_set
    from hidegs_tpu.train.lpips import random_lpips_params

    params = random_lpips_params()
    npz = tmp_path / "w.npz"
    np.savez(npz, **{k: np.asarray(v) for k, v in params.items()})
    from hidegs_tpu.train.lpips import load_lpips

    lpips_fn = load_lpips(str(npz))

    from hidegs_tpu.data.synthetic import make_toy_gaussians, ring_camera
    from hidegs_tpu.raster.api import RasterConfig

    scene = make_toy_gaussians(200, seed=0)

    class _Info:
        image_name = "v0"

    class _Cam:
        info = _Info()
        alpha_mask = None

        def __init__(self):
            self._cam = ring_camera(0, height=32, width=32)
            self.image = np.full((3, 32, 32), 0.25, np.float32)

        def cam_params(self):
            return self._cam

    class _DS(list):
        pass

    ds = _DS([_Cam()])
    cfg = RasterConfig(backend="jnp", max_instances=1 << 14)
    rep = evaluate_set("test", ds, tuple(scene), cfg, str(tmp_path), lpips_fn, save_images=False)
    l = rep["mean"]["lpips"]
    assert np.isfinite(l) and l >= 0
