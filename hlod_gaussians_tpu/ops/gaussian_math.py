"""Closed-form per-Gaussian math: 3D covariance, EWA projection, conics.

TPU-first reformulation of the reference preprocess kernel
(cuda_rasterizer/forward.cu:140-445): everything here is batched dense
arithmetic over the Gaussian axis — no per-thread control flow — so XLA maps
it onto the VPU and fuses it with neighbors. Culling becomes masks instead of
early returns.

Layout note: all internal math is STRUCTURE-OF-ARRAYS — plain [N] columns —
because [N, 3] / [N, 3, 3] arrays place the tiny trailing dims on the
TPU's 128-wide lane axis (3/128 lane occupancy; measured ~50x slower for
this pipeline). Public APIs keep the [N, k] shapes; the stacks/slices at
the boundary are single relayout ops.

Conventions (matching the reference exactly):
  * view matrix is world-to-camera, stored ROW-major as applied to row
    vectors: p_view = p @ V[:3, :3] + V[3, :3]   (torch convention
    `world_view_transform.T @ p`, see utils/graphics_utils.py:getWorld2View2)
  * full projection = view @ proj, also applied to row vectors.
  * quaternions are (w, x, y, z), scales are linear (already exp-activated).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hlod_gaussians_tpu.ops import quaternion


def _cols(a, k):
    """[..., k] -> tuple of k [...] columns (boundary relayout)."""
    return tuple(a[..., i] for i in range(k))


def _cov3d_cols(sx, sy, sz, qw, qx, qy, qz):
    """SoA 3D covariance: returns the 6 packed columns (xx,xy,xz,yy,yz,zz).

    Sigma = R diag(s^2) R^T with R built exactly as the reference's
    build_rotation (utils/general_utils.py:78-98); quaternions are
    normalized defensively (forward.cu:190 assumes unit quats).
    """
    inv = 1.0 / jnp.sqrt(
        jnp.maximum(qw * qw + qx * qx + qy * qy + qz * qz, 1e-24))
    r, x, y, z = qw * inv, qx * inv, qy * inv, qz * inv
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    a = sx * sx
    b = sy * sy
    c = sz * sz
    # sigma_ij = sum_k s_k^2 R_ik R_jk
    xx = a * r00 * r00 + b * r01 * r01 + c * r02 * r02
    xy = a * r00 * r10 + b * r01 * r11 + c * r02 * r12
    xz = a * r00 * r20 + b * r01 * r21 + c * r02 * r22
    yy = a * r10 * r10 + b * r11 * r11 + c * r12 * r12
    yz = a * r10 * r20 + b * r11 * r21 + c * r12 * r22
    zz = a * r20 * r20 + b * r21 * r21 + c * r22 * r22
    return xx, xy, xz, yy, yz, zz


def compute_cov3d(scale, quat, scale_modifier=1.0):
    """scale [...,3], quat [...,4] -> symmetric cov packed [...,6].

    Packing order (xx, xy, xz, yy, yz, zz) — matches forward.cu:181-215.
    """
    sx, sy, sz = _cols(scale * scale_modifier, 3)
    qw, qx, qy, qz = _cols(quat, 4)
    return jnp.stack(_cov3d_cols(sx, sy, sz, qw, qx, qy, qz), axis=-1)


def unpack_cov3d(cov6):
    """[...,6] packed -> [...,3,3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def _affine_cols(mx, my, mz, mat, j):
    """Column j of the row-vector transform p @ mat[:3] + mat[3]."""
    return mx * mat[0, j] + my * mat[1, j] + mz * mat[2, j] + mat[3, j]


def transform_points(points, mat4):
    """Row-vector 4x4 transform with homogeneous divide.

    Returns (projected xyz, w). points [...,3], mat4 [4,4].
    """
    mx, my, mz = _cols(points, 3)
    h0 = _affine_cols(mx, my, mz, mat4, 0)
    h1 = _affine_cols(mx, my, mz, mat4, 1)
    h2 = _affine_cols(mx, my, mz, mat4, 2)
    w = _affine_cols(mx, my, mz, mat4, 3)
    # sign-safe guard: |w| ~ 0 rows are culled later, but must stay finite so
    # their NaNs can't poison backward accumulators shared across rows.
    w_safe = jnp.where(jnp.abs(w) < 1e-7, 1e-7, w)
    inv_w = 1.0 / w_safe
    return jnp.stack([h0 * inv_w, h1 * inv_w, h2 * inv_w], axis=-1), w


def transform_points_3x4(points, mat4):
    """Apply only the affine part (world -> view). Returns [...,3]."""
    mx, my, mz = _cols(points, 3)
    return jnp.stack([
        mx * mat4[0, 0] + my * mat4[1, 0] + mz * mat4[2, 0] + mat4[3, 0],
        mx * mat4[0, 1] + my * mat4[1, 1] + mz * mat4[2, 1] + mat4[3, 1],
        mx * mat4[0, 2] + my * mat4[1, 2] + mz * mat4[2, 2] + mat4[3, 2],
    ], axis=-1)


def _cov2d_cols(t0, t1, t2, cov6_cols, viewmatrix,
                focal_x, focal_y, tan_fovx, tan_fovy):
    """SoA EWA 2D covariance (reference computeCov2D, forward.cu:141-176).

    t0..t2: view-space position columns. Returns (cxx, cxy, cyy) WITHOUT
    the +dilation term.
    """
    tz = jnp.where(jnp.abs(t2) < 1e-6, 1e-6, t2)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t0 / tz, -limx, limx) * tz
    ty = jnp.clip(t1 / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # view-space covariance Vv = W^T V W (row-vector convention), expanded
    # per packed column; W = viewmatrix[:3,:3] entries are scalars.
    vxx, vxy, vxz, vyy, vyz, vzz = cov6_cols
    V = ((vxx, vxy, vxz), (vxy, vyy, vyz), (vxz, vyz, vzz))
    W = viewmatrix

    def vw(i, b):  # (V @ W)[i, b]
        return V[i][0] * W[0, b] + V[i][1] * W[1, b] + V[i][2] * W[2, b]

    vw00, vw01, vw02 = vw(0, 0), vw(0, 1), vw(0, 2)
    vw10, vw11, vw12 = vw(1, 0), vw(1, 1), vw(1, 2)
    vw20, vw21, vw22 = vw(2, 0), vw(2, 1), vw(2, 2)

    def wtvw(a, b0, b1, b2):  # (W^T (VW))[a, :] dot column
        return W[0, a] * b0 + W[1, a] * b1 + W[2, a] * b2

    a = wtvw(0, vw00, vw10, vw20)   # Vv[0,0]
    b = wtvw(1, vw00, vw10, vw20)   # Vv[0,1] (== Vv[1,0])
    c = wtvw(2, vw00, vw10, vw20)   # Vv[0,2]
    d = wtvw(1, vw01, vw11, vw21)   # Vv[1,1]
    e = wtvw(2, vw01, vw11, vw21)   # Vv[1,2]
    f = wtvw(2, vw02, vw12, vw22)   # Vv[2,2]

    cxx = j00 * j00 * a + 2 * j00 * j02 * c + j02 * j02 * f
    cxy = j00 * j11 * b + j00 * j12 * c + j02 * j11 * e + j02 * j12 * f
    cyy = j11 * j11 * d + 2 * j11 * j12 * e + j12 * j12 * f
    return cxx, cxy, cyy


def compute_cov2d(mean, cov6, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA 2D covariance; mean [...,3] world-space, cov6 [...,6].

    Returns [...,3] packed (cxx, cxy, cyy), WITHOUT the +dilation term.
    """
    mx, my, mz = _cols(mean, 3)
    t0 = _affine_cols(mx, my, mz, viewmatrix, 0)
    t1 = _affine_cols(mx, my, mz, viewmatrix, 1)
    t2 = _affine_cols(mx, my, mz, viewmatrix, 2)
    cxx, cxy, cyy = _cov2d_cols(t0, t1, t2, _cols(cov6, 6), viewmatrix,
                                focal_x, focal_y, tan_fovx, tan_fovy)
    return jnp.stack([cxx, cxy, cyy], axis=-1)


class Projection(NamedTuple):
    """Per-Gaussian screen-space quantities (all padded/masked)."""

    xy: jnp.ndarray          # [N,2] pixel-space mean
    depth: jnp.ndarray       # [N] view-space z
    conic: jnp.ndarray       # [N,3] inverse 2D covariance (cxx, cxy, cyy)
    opacity: jnp.ndarray     # [N] effective opacity (incl. AA scaling if on)
    radius: jnp.ndarray      # [N] int32 pixel radius (0 = culled)
    valid: jnp.ndarray       # [N] bool — survives all culls
    ext: jnp.ndarray         # [N,2] tight half-extents of the alpha>=alpha_min
                             #       iso-ellipse's AABB (<= radius per axis)
    reff2: jnp.ndarray       # [N] squared radius of its circumscribed circle


def ndc2pix(v, size):
    """NDC [-1,1] -> pixel centers; reference auxiliary.h ndc2Pix."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means, cov6, opacities, viewmatrix, projmatrix,
    width: int, height: int, focal_x, focal_y, tan_fovx, tan_fovy,
    *, dilation: float = 0.3, antialiasing: bool = False, near: float = 0.2,
    valid_in=None, big_limit: float = float("inf"), max_scale=None,
    alpha_min: float = 1.0 / 255.0,
):
    """Project all Gaussians to screen space (reference preprocessCUDA).

    All culling (near plane, zero-area, big-limit) is expressed in the
    returned `valid` mask; invalid rows carry harmless placeholder values.

    Beyond the reference's 3*sqrt(lambda_max) circle (forward.cu:385-390),
    this also emits TIGHT per-axis extents of the region where the blend
    could apply an entry: alpha = op*exp(-q/2) >= alpha_min requires
    q <= 2L with L = log(op/alpha_min), whose iso-ellipse has AABB
    half-extents sqrt(2L*Sigma_xx), sqrt(2L*Sigma_yy) and circumscribed
    radius sqrt(2L*lambda_max). Both are clamped to the reference's 3-sigma
    bound, so binning on them covers every pixel the CUDA kernel would
    actually blend (entries it drops are exactly the alpha<alpha_min skips,
    forward.cu:546-556) while touching far fewer tiles.
    """
    mx, my, mz = _cols(means, 3)
    h0 = _affine_cols(mx, my, mz, projmatrix, 0)
    h1 = _affine_cols(mx, my, mz, projmatrix, 1)
    w = _affine_cols(mx, my, mz, projmatrix, 3)
    w_safe = jnp.where(jnp.abs(w) < 1e-7, 1e-7, w)
    inv_w = 1.0 / w_safe

    t0 = _affine_cols(mx, my, mz, viewmatrix, 0)
    t1 = _affine_cols(mx, my, mz, viewmatrix, 1)
    t2 = _affine_cols(mx, my, mz, viewmatrix, 2)
    depth = t2

    cov_xx, cov_xy, cov_yy = _cov2d_cols(
        t0, t1, t2, _cols(cov6, 6), viewmatrix,
        focal_x, focal_y, tan_fovx, tan_fovy)
    det_orig = cov_xx * cov_yy - cov_xy ** 2
    cxx = cov_xx + dilation
    cyy = cov_yy + dilation
    cxy = cov_xy
    det = cxx * cyy - cxy * cxy

    valid = depth > near
    if valid_in is not None:
        valid = valid & valid_in
    valid = valid & (det > 0.0)
    if max_scale is not None and big_limit != float("inf"):
        valid = valid & (max_scale <= big_limit)

    det_inv = 1.0 / jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    opacity = opacities
    if antialiasing:
        # alt-rasterizer AA: scale opacity by sqrt(det_orig / det_dilated)
        # (alt-rasterizer/cuda_rasterizer/forward.cu:226-272), clamped for
        # numerical stability like the reference (max(0.000025, ratio)).
        h_conv = jnp.sqrt(jnp.maximum(2.5e-5, det_orig * det_inv))
        opacity = opacity * h_conv

    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # tight alpha-aware extents (see docstring); 2L clamped to [0, 9] so the
    # tight region is always inside the reference's 3-sigma circle
    # NOT clamped to 9 (3-sigma): for opacity near 1 the alpha>=alpha_min
    # region reaches q = 2*ln(255) ~ 11.08, and the reference's generous
    # circle RECT does cover (and blend) such pixels. Binning intersects
    # these extents with the reference rect (ops/binning.py) so coverage is
    # exactly {reference rect} ∩ {alpha could reach alpha_min}.
    two_l = jnp.clip(2.0 * jnp.log(jnp.maximum(opacity, 1e-12) / alpha_min),
                     0.0, 20.0)
    # +1e-3 px margin guards against float rounding flipping an exactly
    # boundary pixel between the coverage test and the kernel's alpha test
    ext_x = jnp.sqrt(two_l * jnp.maximum(cxx, 0.0)) + 1e-3
    ext_y = jnp.sqrt(two_l * jnp.maximum(cyy, 0.0)) + 1e-3
    reff2 = (jnp.sqrt(two_l * lam) + 1e-3) ** 2
    # gaussians whose peak alpha is below the blend threshold never land
    valid = valid & (two_l > 0.0)

    px = ndc2pix(h0 * inv_w, width)
    py = ndc2pix(h1 * inv_w, height)

    # zero-area cull happens in tile binning (rect area == 0); here just
    # propagate radius=0 for invalid rows.
    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    valid = valid & (radius > 0)

    # Sanitize culled rows. They never contribute to the image, but their
    # values are still gathered by binning padding entries and would turn the
    # tile-shared transmittance chain NaN in backward (0 * NaN = NaN).
    xy = jnp.stack([jnp.where(valid, px, 0.0),
                    jnp.where(valid, py, 0.0)], axis=-1)
    v1 = valid[..., None]
    conic = jnp.where(v1, conic, jnp.asarray([1.0, 0.0, 1.0], conic.dtype))
    depth = jnp.where(valid, depth, 1.0)
    opacity = jnp.where(valid, opacity, 0.0)
    ext = jnp.stack([jnp.where(valid, ext_x, 0.0),
                     jnp.where(valid, ext_y, 0.0)], axis=-1)
    reff2 = jnp.where(valid, reff2, 0.0)
    return Projection(xy=xy, depth=depth, conic=conic, opacity=opacity,
                      radius=radius, valid=valid, ext=ext, reff2=reff2)
