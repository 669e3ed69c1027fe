"""Spherical-harmonics evaluation, degrees 0..3.

Same basis and constants as the reference (utils/sh_utils.py:26-117 and
cuda_rasterizer/forward.cu:25-76): real SH with the 3DGS sign conventions,
a +0.5 offset, and clamping of negative colors to zero.

All functions are batched over the leading axis and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

# number of SH coefficients for degree d
NUM_COEFFS = {0: 1, 1: 4, 2: 9, 3: 16}


def rgb_to_sh(rgb):
    """DC color -> SH coefficient (reference utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    """SH DC coefficient -> color (reference utils/sh_utils.py SH2RGB)."""
    return sh * C0 + 0.5


def sh_basis(deg: int, dirs):
    """Real SH basis values b_k at unit directions: [..., K].

    Same polynomials/signs as the reference (forward.cu:25-76)."""
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    b = [jnp.full_like(x, C0)]
    if deg > 0:
        b += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            b += [C2[0] * x * y, C2[1] * y * z,
                  C2[2] * (2.0 * zz - xx - yy),
                  C2[3] * x * z, C2[4] * (xx - yy)]
            if deg > 2:
                b += [C3[0] * y * (3.0 * xx - yy), C3[1] * x * y * z,
                      C3[2] * y * (4.0 * zz - xx - yy),
                      C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                      C3[4] * x * (4.0 * zz - xx - yy),
                      C3[5] * z * (xx - yy),
                      C3[6] * x * (xx - 3.0 * yy)]
    return jnp.stack(b, axis=-1)


def eval_sh(deg: int, sh, dirs):
    """Evaluate SH at unit directions.

    Args:
      deg: static degree 0..3.
      sh: [..., K, 3] coefficients with K >= NUM_COEFFS[deg].
      dirs: [..., 3] unit directions.

    Returns [..., 3] raw colors (no +0.5 offset, no clamp) — matching the
    reference's eval_sh; use `sh_color` for the rasterizer semantics.

    The basis-times-coefficients contraction is one einsum: XLA lowers it
    at memory bandwidth, while the naive sum of [..., 3]-shaped terms runs
    at 3/128 lane efficiency on TPU (~100x slower at 100k Gaussians).
    """
    k = NUM_COEFFS[deg]
    b = sh_basis(deg, dirs)
    return jnp.einsum("...k,...kc->...c", b, sh[..., :k, :])


def sh_color(deg: int, sh, means, campos):
    """SH -> clamped RGB as the rasterizer computes it.

    Mirrors computeColorFromSH (reference forward.cu:25-76): view direction
    from the camera to the (possibly LOD-interpolated) mean, +0.5 offset,
    clamp at zero. The clamp is part of the differentiable graph, so
    autodiff reproduces the reference's `clamped` masking in backward.cu.

    Layout: for 1-D batches (the rasterizer's [N] case) the whole chain
    runs on [N]-shaped COLUMNS — trailing-dim-3 math uses 3/128 TPU lanes
    and measured ~5 ms at 1M rows even at degree 0 — with a single [N,3]
    stack at the end. Higher-rank batches keep the generic einsum path.
    """
    if means.ndim != 2:
        dirs = means - campos
        norm = jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20)
        dirs = dirs / norm
        return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)

    if deg == 0:
        # direction-independent: no normalize at all
        return jnp.maximum(C0 * sh[:, 0, :] + 0.5, 0.0)

    dx = means[:, 0] - campos[0]
    dy = means[:, 1] - campos[1]
    dz = means[:, 2] - campos[2]
    # eps inside the sqrt keeps the gradient finite when means == campos
    # (dead capacity-padding rows sit at the origin).
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
    x, y, z = dx * inv, dy * inv, dz * inv

    b = [jnp.full_like(x, C0), -C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        b += [C2[0] * x * y, C2[1] * y * z, C2[2] * (2.0 * zz - xx - yy),
              C2[3] * x * z, C2[4] * (xx - yy)]
        if deg > 2:
            b += [C3[0] * y * (3.0 * xx - yy), C3[1] * x * y * z,
                  C3[2] * y * (4.0 * zz - xx - yy),
                  C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                  C3[4] * x * (4.0 * zz - xx - yy),
                  C3[5] * z * (xx - yy),
                  C3[6] * x * (xx - 3.0 * yy)]
    k = NUM_COEFFS[deg]
    # one [N, K] x [N, K, 3] contraction would put 3 on the lanes; instead
    # contract per channel over [N]-columns and stack once
    bk = jnp.stack(b, axis=0)                    # [K, N]
    out = []
    for c in range(3):
        shc = jnp.transpose(sh[:, :k, c])        # [K, N] strided slice
        out.append(jnp.sum(bk * shc, axis=0))
    return jnp.maximum(jnp.stack(out, axis=-1) + 0.5, 0.0)
