"""LPIPS perceptual distance (VGG backbone) in JAX.

Counterpart of the reference's lpipsPyTorch/ (183 LoC wrapper around a
downloaded VGG): the conv feature pyramid + unit-normalize + linear-head
distance, expressed as jit-friendly JAX convs. Pretrained weights cannot be
downloaded in an egress-free environment (the reference has the same
constraint — its wrapper fetches them at runtime), so construction is gated
on a local `.npz` weight file:

    lpips_fn = make_lpips("/path/to/lpips_vgg.npz")   # or None

Expected npz keys: `convN_M_w` [out,in,kh,kw] / `convN_M_b` for the VGG16
conv stack, and `lin{0..4}_w` [1,C,1,1] for the LPIPS linear heads.
`export_weights_npz` converts a torchvision VGG16 + LPIPS checkpoint when
torch is available on some other machine.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (name, out_channels); 'M' = maxpool; slices end after
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (the 5 LPIPS taps)
VGG16_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b.reshape(1, -1, 1, 1)


def _vgg_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray
                  ) -> List[jnp.ndarray]:
    feats = []
    for item in VGG16_CFG:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        else:
            name, _ = item
            x = jax.nn.relu(_conv(x, params[f"{name}_w"], params[f"{name}_b"]))
            if name in TAPS:
                feats.append(x)
    return feats


def _normalize(feat, eps=1e-10):
    n = jnp.sqrt(jnp.sum(feat ** 2, axis=1, keepdims=True))
    return feat / (n + eps)


def make_lpips(weights_path: Optional[str] = None
               ) -> Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]]:
    """Build the LPIPS distance fn, or None when weights are unavailable.

    Inputs to the returned fn: two [3,H,W] images in [0,1]."""
    if weights_path is None or not os.path.exists(weights_path):
        return None
    z = np.load(weights_path)
    params = {k: jnp.asarray(z[k]) for k in z.files}

    @jax.jit
    def lpips(img1, img2):
        def prep(img):
            # PARITY QUIRK: the reference wrapper z-scores the [0,1] image
            # DIRECTLY with the [-1,1]-era constants — render_hierarchy.py
            # :113 feeds clamped [0,1] renders and modules/networks.py:50-54
            # applies (x - mean)/std with no *2-1 mapping. Match it exactly.
            x = img[None]
            return (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
        f1 = _vgg_features(params, prep(img1))
        f2 = _vgg_features(params, prep(img2))
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (_normalize(a) - _normalize(b)) ** 2
            w = params.get(f"lin{i}_w")
            if w is not None:
                # 1x1 conv, no bias, no clamp (modules/networks.py:23-30)
                d = jnp.sum(d * w.reshape(1, -1, 1, 1), axis=1, keepdims=True)
            else:
                d = jnp.mean(d, axis=1, keepdims=True)
            total = total + jnp.mean(d)
        return total

    return lpips


def export_weights_npz(out_path: str) -> None:
    """Convert torchvision VGG16 + lpips linear heads to the npz layout
    (run on a machine with torch+torchvision+lpips installed)."""
    import torch  # noqa: F401
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out: Dict[str, np.ndarray] = {}
    conv_names = [i for i in VGG16_CFG if i != "M"]
    ci = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            name = conv_names[ci][0]
            out[f"{name}_w"] = layer.weight.detach().numpy()
            out[f"{name}_b"] = layer.bias.detach().numpy()
            ci += 1
    try:
        import lpips as lpips_pkg
        net = lpips_pkg.LPIPS(net="vgg")
        for i, lin in enumerate(net.lins):
            out[f"lin{i}_w"] = lin.model[1].weight.detach().numpy()
    except ImportError:
        pass
    np.savez(out_path, **out)
