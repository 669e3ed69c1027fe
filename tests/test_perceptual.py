"""Perceptual metrics: the JAX LPIPS pipeline vs an independent torch
oracle (synthetic weights — real VGG weights need egress), and GMSD
properties."""

import numpy as np
import pytest

import jax.numpy as jnp


def _synthetic_weights(tmp_path, seed=0):
    """Full VGG16-shaped weight set with He-scaled random values: exercises
    every conv/pool/tap/lin of the real architecture."""
    from hlod_gaussians_tpu.ops.lpips import VGG16_CFG, TAPS

    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    for item in VGG16_CFG:
        if item == "M":
            continue
        name, cout = item
        std = np.sqrt(2.0 / (cin * 9))
        out[f"{name}_w"] = rng.normal(
            0, std, (cout, cin, 3, 3)).astype(np.float32)
        out[f"{name}_b"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
        cin = cout
    tap_ch = {"conv1_2": 64, "conv2_2": 128, "conv3_3": 256,
              "conv4_3": 512, "conv5_3": 512}
    for i, t in enumerate(TAPS):
        out[f"lin{i}_w"] = rng.uniform(
            0, 0.1, (1, tap_ch[t], 1, 1)).astype(np.float32)
    p = str(tmp_path / "lpips_synth.npz")
    np.savez(p, **out)
    return p, out


def _torch_lpips_oracle(weights, x, y):
    """Independent transcription of the reference lpipsPyTorch semantics
    (modules/lpips.py + networks.py + utils.py): z-score the [0,1] input
    with the fixed constants, VGG16 conv/relu/maxpool chain, unit-normalize
    at the 5 taps, squared diff, 1x1 lin conv, spatial mean, sum."""
    import torch
    import torch.nn.functional as F

    from hlod_gaussians_tpu.ops.lpips import VGG16_CFG, TAPS

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        t = (torch.from_numpy(np.asarray(img))[None] - mean) / std
        out = []
        for item in VGG16_CFG:
            if item == "M":
                t = F.max_pool2d(t, 2, 2)
                continue
            name, _ = item
            t = F.relu(F.conv2d(t, torch.from_numpy(weights[f"{name}_w"]),
                                torch.from_numpy(weights[f"{name}_b"]),
                                padding=1))
            if name in TAPS:
                n = torch.sqrt((t ** 2).sum(dim=1, keepdim=True))
                out.append(t / (n + 1e-10))
        return out

    total = 0.0
    for i, (a, b) in enumerate(zip(feats(x), feats(y))):
        d = (a - b) ** 2
        w = torch.from_numpy(weights[f"lin{i}_w"])
        r = F.conv2d(d, w)
        total += float(r.mean())
    return total


def test_lpips_matches_torch_oracle(tmp_path):
    from hlod_gaussians_tpu.ops.lpips import make_lpips

    path, weights = _synthetic_weights(tmp_path)
    fn = make_lpips(path)
    assert fn is not None

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)

    ours = float(fn(jnp.asarray(x), jnp.asarray(y)))
    oracle = _torch_lpips_oracle(weights, x, y)
    assert ours == pytest.approx(oracle, rel=2e-3), (ours, oracle)
    # identity -> exactly zero distance
    assert float(fn(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(
        0.0, abs=1e-8)


def test_lpips_none_without_weights():
    from hlod_gaussians_tpu.ops.lpips import make_lpips

    assert make_lpips(None) is None
    assert make_lpips("/nonexistent/weights.npz") is None


def test_gmsd_properties():
    from hlod_gaussians_tpu.ops.perceptual import gmsd

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (3, 48, 64)).astype(np.float32)
    assert float(gmsd(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(
        0.0, abs=1e-5)
    # monotone under growing distortion
    vals = []
    for s in (0.02, 0.08, 0.3):
        y = np.clip(x + rng.normal(0, s, x.shape).astype(np.float32), 0, 1)
        vals.append(float(gmsd(jnp.asarray(x), jnp.asarray(y))))
    assert vals[0] < vals[1] < vals[2], vals
    # symmetric
    y = np.clip(x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    a = float(gmsd(jnp.asarray(x), jnp.asarray(y)))
    b = float(gmsd(jnp.asarray(y), jnp.asarray(x)))
    assert a == pytest.approx(b, rel=1e-6)
