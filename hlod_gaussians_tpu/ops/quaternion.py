"""Quaternion utilities (w, x, y, z convention, matching the reference).

The reference stores rotations as (r, x, y, z) = (w, x, y, z) quaternions and
builds rotation matrices in cuda_rasterizer/forward.cu:181-215 /
utils/general_utils.py:78-98. All functions here are batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q, eps=1e-12):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(eps)


def to_matrix(q):
    """Quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    R maps body coordinates to world coordinates (same convention as the
    reference's build_rotation in utils/general_utils.py:78-98).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_matrix(m):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w,x,y,z).

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the numerically best one with `where`, so it
    vmaps/jits cleanly (used by the hierarchy ClusterMerger equivalent,
    reference ClusterMerger.cpp:117-140).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*component^2 (all non-negative)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # candidate built from w
    sw = safe_sqrt(qw2) * 0.5
    cand_w = jnp.stack([sw, (m21 - m12) / (4 * sw), (m02 - m20) / (4 * sw), (m10 - m01) / (4 * sw)], axis=-1)
    sx = safe_sqrt(qx2) * 0.5
    cand_x = jnp.stack([(m21 - m12) / (4 * sx), sx, (m01 + m10) / (4 * sx), (m02 + m20) / (4 * sx)], axis=-1)
    sy = safe_sqrt(qy2) * 0.5
    cand_y = jnp.stack([(m02 - m20) / (4 * sy), (m01 + m10) / (4 * sy), sy, (m12 + m21) / (4 * sy)], axis=-1)
    sz = safe_sqrt(qz2) * 0.5
    cand_z = jnp.stack([(m10 - m01) / (4 * sz), (m02 + m20) / (4 * sz), (m12 + m21) / (4 * sz), sz], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0
    return jnp.where(q[..., 0:1] < 0, -q, q)


def multiply(a, b):
    """Hamilton product of two (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)
