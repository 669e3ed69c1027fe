"""Weights-free perceptual metric: GMSD.

The reference eval protocol reports LPIPS (render_hierarchy.py:108-120),
whose VGG weights must be downloaded — impossible in an egress-free
deployment (ops/lpips.py stays gated on a local npz). This module provides
the standing-in perceptual column: **Gradient Magnitude Similarity
Deviation** (Xue, Zhang, Mou, Bovik 2013) — closed-form, no learned
weights, and among the best-correlated classic metrics with human opinion
scores. Reported as `gmsd` (LOWER is better, 0 = identical); it is NOT
labeled lpips anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Prewitt kernels (the GMSD paper's choice), applied at half resolution
_HX = jnp.asarray([[1.0, 0.0, -1.0]] * 3) / 3.0
_HY = _HX.T
# T = 170 on [0,255] gradient magnitudes -> 170/255^2 on [0,1] images
_C = 170.0 / (255.0 ** 2)


def _luminance(img: jnp.ndarray) -> jnp.ndarray:
    """[3,H,W] in [0,1] -> [H,W] luma (Rec.601, as the paper's L channel)."""
    r, g, b = img[0], img[1], img[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _avgpool2(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape
    x = x[: h - h % 2, : w - w % 2]
    return (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2]
            + x[1::2, 1::2]) * 0.25


def _conv2(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x[None, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


@jax.jit
def gmsd(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Gradient Magnitude Similarity Deviation of two [3,H,W] images in
    [0,1]. Returns a scalar; 0 for identical images, larger = worse."""
    y1 = _avgpool2(_luminance(img1))
    y2 = _avgpool2(_luminance(img2))
    gm1 = jnp.sqrt(_conv2(y1, _HX) ** 2 + _conv2(y1, _HY) ** 2 + 1e-12)
    gm2 = jnp.sqrt(_conv2(y2, _HX) ** 2 + _conv2(y2, _HY) ** 2 + 1e-12)
    gms = (2.0 * gm1 * gm2 + _C) / (gm1 ** 2 + gm2 ** 2 + _C)
    return jnp.std(gms)
