"""Closed-form per-Gaussian math: 3D covariance, EWA projection, conics.

TPU-first reformulation of the reference preprocess kernel
(cuda_rasterizer/forward.cu:140-445): everything here is batched dense
arithmetic over the Gaussian axis — no per-thread control flow — so XLA maps
it onto the VPU and fuses it with neighbors. Culling becomes masks instead of
early returns.

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


def compute_cov3d(scale, quat, scale_modifier=1.0):
    """scale [...,3], quat [...,4] -> symmetric cov packed [...,6].

    Packing order (xx, xy, xz, yy, yz, zz) — matches forward.cu:181-215.
    Note the reference does NOT normalize the quaternion here (forward.cu:190);
    callers keep quaternions normalized through the optimizer instead. We
    normalize defensively: identical result for unit quats.
    """
    q = quaternion.normalize(quat)
    R = quaternion.to_matrix(q)  # [...,3,3]
    s = scale * scale_modifier
    # M = S R in the reference's column-major glm — equivalent to scaling the
    # rows of R; Sigma = M^T M = R^T S^2 R in their layout which in row-vector
    # convention is Sigma = R diag(s^2) R^T.
    RS = R * (s[..., None, :])              # R @ diag(s)
    sigma = RS @ jnp.swapaxes(RS, -1, -2)   # R S S^T R^T
    return jnp.stack([
        sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
        sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2],
    ], axis=-1)


def unpack_cov3d(cov6):
    """[...,6] packed -> [...,3,3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def transform_points(points, mat4):
    """Row-vector 4x4 transform with homogeneous divide.

    Returns (projected xyz, w). points [...,3], mat4 [4,4].
    """
    hom = points @ mat4[:3, :] + mat4[3, :]
    w = hom[..., 3:4]
    # sign-safe guard: |w| ~ 0 rows are culled later, but must stay finite so
    # their NaNs can't poison backward accumulators shared across rows.
    w_safe = jnp.where(jnp.abs(w) < 1e-7, 1e-7, w)
    return hom[..., :3] / w_safe, w[..., 0]


def transform_points_3x4(points, mat4):
    """Apply only the affine part (world -> view). Returns [...,3]."""
    return points @ mat4[:3, :3] + mat4[3, :3]


def compute_cov2d(mean, cov6, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA 2D covariance (reference computeCov2D, forward.cu:141-176).

    mean [...,3] world-space (already LOD-interpolated), cov6 [...,6].
    Returns [...,3] packed (cxx, cxy, cyy), WITHOUT the +dilation term.
    """
    t = transform_points_3x4(mean, viewmatrix)
    # near-zero-depth rows are culled downstream; keep the math finite here
    # (0/0 would create NaNs that leak through zero cotangents in backward).
    tz = t[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J: Jacobian of the perspective projection at (tx, ty, tz) — rows are
    # d(px,py)/d(view xyz). Only the top-left 2x3 block matters.
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    W = viewmatrix[:3, :3]  # world->view linear part (row-vector convention)
    V = unpack_cov3d(cov6)
    # cov2d = J (W^T V W) J^T in row-vector convention: view-space covariance
    # is W^T V W because p_view = p W.
    VW = V @ W                                  # [...,3,3]
    Vview = jnp.swapaxes(W, -1, -2) @ VW        # W^T V W
    # apply J on both sides; J = [[j00,0,j02],[0,j11,j12]]
    a = Vview[..., 0, 0]
    b = Vview[..., 0, 1]
    c = Vview[..., 0, 2]
    d = Vview[..., 1, 1]
    e = Vview[..., 1, 2]
    f = Vview[..., 2, 2]
    cxx = j00 * j00 * a + 2 * j00 * j02 * c + j02 * j02 * f
    cxy = j00 * j11 * b + j00 * j12 * c + j02 * j11 * e + j02 * j12 * f
    cyy = j11 * j11 * d + 2 * j11 * j12 * e + j12 * j12 * f
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
    p_proj, w = transform_points(means, projmatrix)
    p_view = transform_points_3x4(means, viewmatrix)
    depth = p_view[..., 2]

    cov = compute_cov2d(means, cov6, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy)
    det_orig = cov[..., 0] * cov[..., 2] - cov[..., 1] ** 2
    cxx = cov[..., 0] + dilation
    cyy = cov[..., 2] + dilation
    cxy = cov[..., 1]
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

    xy = jnp.stack([ndc2pix(p_proj[..., 0], width), ndc2pix(p_proj[..., 1], height)], axis=-1)

    # zero-area cull happens in tile binning (rect area == 0); here just
    # propagate radius=0 for invalid rows.
    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    valid = valid & (radius > 0)

    # Sanitize culled rows. They never contribute to the image, but their
    # values are still gathered by binning padding entries and would turn the
    # tile-shared transmittance chain NaN in backward (0 * NaN = NaN).
    v1 = valid[..., None]
    xy = jnp.where(v1, xy, 0.0)
    conic = jnp.where(v1, conic, jnp.asarray([1.0, 0.0, 1.0], conic.dtype))
    depth = jnp.where(valid, depth, 1.0)
    opacity = jnp.where(valid, opacity, 0.0)
    ext = jnp.stack([jnp.where(valid, ext_x, 0.0),
                     jnp.where(valid, ext_y, 0.0)], axis=-1)
    reff2 = jnp.where(valid, reff2, 0.0)
    return Projection(xy=xy, depth=depth, conic=conic, opacity=opacity,
                      radius=radius, valid=valid, ext=ext, reff2=reff2)
