"""Merge-hierarchy construction as a batched XLA pipeline.

TPU-native re-design of the reference's C++ hierarchy creator
(`GaussianHierarchyCreator`: PointbasedKdTreeGenerator.cpp:16-68 kd-tree,
ClusterMerger.cpp:23-169 covariance-preserving merge,
rotation_aligner.cpp:23-108 quaternion alignment). The recursive
pointer-chasing build becomes **level-synchronous array passes**:

* kd-median split — instead of recursive `nth_element`, each level does ONE
  lexicographic sort of (segment, coordinate-along-longest-axis) keys and
  splits every active segment at its median simultaneously. Segments live in
  implicit binary-heap numbering (children of h are 2h+1 / 2h+2), so the
  whole tree is a fixed-capacity array of 2^(L+1)-1 heap slots.
* cluster merge — bottom-up, one batched pass per level: weights
  w = opacity * (s0*s1 + s0*s2 + s1*s2), merged mean/SH = weighted average,
  merged covariance = sum_i a_i (Sigma_i + d_i d_i^T), batched
  `jnp.linalg.eigh` -> scales = sqrt(lambda), rotation from eigenvectors
  (handedness-fixed). Exactly ClusterMerger.cpp:50-146.
* rotation alignment — top-down, one batched pass per level: each node picks
  among the 24 proper signed axis permutations of its rotation the one with
  the highest Frobenius inner product against its (already aligned) parent,
  permuting its scale accordingly (rotation_aligner.cpp:23-89).

Heap-slot padding keeps every shape static, so the entire build jits into
one XLA program; `compact_hierarchy` then densifies the occupied slots into
the node-table layout of the model (host-side numpy — pure indexing).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)
from hlod_gaussians_tpu.ops import gaussian_math, quaternion


def heap_depth(idx):
    """Exact floor(log2(idx+1)) for int32 heap indices. f32 log2
    misclassifies indices just below level boundaries above 2^24 (f32
    cannot represent those integers exactly — e.g. 33554430 rounded into
    depth 25 instead of 24); counting the level thresholds is exact for
    any idx < 2^31 - 1."""
    idx1 = idx + 1
    depth = jnp.zeros(idx.shape, jnp.int32)
    for k in range(1, 31):
        depth = depth + (idx1 >= (1 << k)).astype(jnp.int32)
    return depth


def ellipse_surface(scale):
    """scale [...,3] -> s0*s1 + s0*s2 + s1*s2 (ClusterMerger.cpp:16-21)."""
    return (scale[..., 0] * scale[..., 1] + scale[..., 0] * scale[..., 2]
            + scale[..., 1] * scale[..., 2])


def sym_eigh3(a):
    """Analytic eigendecomposition of symmetric [...,3,3] matrices.

    Closed-form trigonometric eigenvalues (Smith's method) + null-space
    eigenvectors via row cross products — ascending order, like
    `jnp.linalg.eigh`, but ~two orders of magnitude faster on TPU where the
    iterative eigh kernel dominates large batched builds. Covariances here
    are PSD with a small diagonal floor, so the closed form is stable.
    """
    q = (a[..., 0, 0] + a[..., 1, 1] + a[..., 2, 2]) / 3.0
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    d0 = a[..., 0, 0] - q
    d1 = a[..., 1, 1] - q
    d2 = a[..., 2, 2] - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * (a01 ** 2 + a02 ** 2 + a12 ** 2)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    inv_p = 1.0 / p
    b00, b11, b22 = d0 * inv_p, d1 * inv_p, d2 * inv_p
    b01, b02, b12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    evals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)          # ascending

    # eigenvector for each eigenvalue: largest cross product of two rows of
    # (A - lambda I); orthonormalize v1 against v0, v2 = v0 x v1
    def null_vec(lam):
        m = a - lam[..., None, None] * jnp.eye(3)
        c01 = jnp.cross(m[..., 0, :], m[..., 1, :])
        c02 = jnp.cross(m[..., 0, :], m[..., 2, :])
        c12 = jnp.cross(m[..., 1, :], m[..., 2, :])
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                         jnp.where(n02 >= n12, c02, c12))
        nrm = jnp.sqrt(jnp.sum(best * best, axis=-1, keepdims=True))
        # degenerate (repeated eigenvalue): fall back to a fixed axis; the
        # Gram-Schmidt below restores a valid orthonormal frame
        safe = jnp.where(nrm > 1e-20, best / jnp.maximum(nrm, 1e-20),
                         jnp.asarray([1.0, 0.0, 0.0]))
        return safe

    v0 = null_vec(evals[..., 0])
    v1 = null_vec(evals[..., 1])
    v1 = v1 - jnp.sum(v0 * v1, axis=-1, keepdims=True) * v0
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1, keepdims=True))
    fallback = jnp.cross(v0, jnp.where(
        jnp.abs(v0[..., 0:1]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0])))
    fallback = fallback / jnp.sqrt(
        jnp.sum(fallback * fallback, axis=-1, keepdims=True))
    v1 = jnp.where(n1 > 1e-10, v1 / jnp.maximum(n1, 1e-20), fallback)
    v2 = jnp.cross(v0, v1)
    evecs = jnp.stack([v0, v1, v2], axis=-1)                 # columns
    return evals, evecs


class PaddedHierarchy(NamedTuple):
    """Heap-padded hierarchy: arrays sized H = 2^(L+1)-1; `occupied` masks
    real nodes. Leaves carry the input Gaussians, interior slots the merged
    ones."""

    pos: jnp.ndarray        # [H,3]
    scale: jnp.ndarray      # [H,3] linear
    quat: jnp.ndarray       # [H,4] (w,x,y,z) normalized
    opacity: jnp.ndarray    # [H]
    sh: jnp.ndarray         # [H,K,3]
    box_lo: jnp.ndarray     # [H,3] AABB min
    box_hi: jnp.ndarray     # [H,3] AABB max
    max_side: jnp.ndarray   # [H] longest AABB side (projected-size metric)
    occupied: jnp.ndarray   # [H] bool
    interior: jnp.ndarray   # [H] bool (occupied and has 2 children)
    leaf_point: jnp.ndarray  # [H] int32 original point index for leaves, -1 else
    depth: jnp.ndarray      # [H] int32 depth from root

    @property
    def heap_capacity(self) -> int:
        return self.pos.shape[0]


def _num_levels(n: int) -> int:
    return max(1, math.ceil(math.log2(n))) if n > 1 else 1


def assign_kd_segments(means, scales, n_levels: int, real=None):
    """Level-synchronous kd-median split (PointbasedKdTreeGenerator.cpp:16-68).

    Returns (leaf_seg [n] heap id per point, occupied [H] bool).
    Split rule matches the reference: pivot = num/2 - 1, left gets
    [0, num/2), axis = longest side of the segment AABB of (mean +- 3*max_scale).

    ``real`` (optional [n] bool) marks live rows when the input is padded
    to a shape bucket (build_hierarchy pads leaf counts to powers of two so
    per-chunk pipelines compile the build ONCE instead of once per distinct
    leaf count — each cold build compile is ~150 s through the remote
    compile service). Padded rows never influence counts, segment AABBs,
    median ranks, or occupancy: they sort past every real key (+inf), ride
    along whichever child their host segment produces, and are dropped from
    all scatters. Tree structure over the real rows is IDENTICAL to the
    unpadded build (oracle-anchored by tests/test_oracle_parity.py).
    """
    n = means.shape[0]
    h_cap = 2 ** (n_levels + 1) - 1
    if real is None:
        real = jnp.ones((n,), bool)
    big = jnp.float32(3.0e38)
    r = 3.0 * jnp.max(scales, axis=-1, keepdims=True)  # scalar radius per pt
    lo_pt = jnp.where(real[:, None], means - r, big)
    hi_pt = jnp.where(real[:, None], means + r, -big)

    seg = jnp.zeros((n,), jnp.int32)
    occupied = jnp.zeros((h_cap,), bool).at[0].set(True)

    for _level in range(n_levels):
        counts = jax.ops.segment_sum(real.astype(jnp.int32), seg,
                                     num_segments=h_cap)
        active = counts[seg] >= 2

        lo = jnp.stack([jax.ops.segment_min(lo_pt[:, a], seg, num_segments=h_cap)
                        for a in range(3)], axis=-1)
        hi = jnp.stack([jax.ops.segment_max(hi_pt[:, a], seg, num_segments=h_cap)
                        for a in range(3)], axis=-1)
        axis = jnp.argmax(hi - lo, axis=-1).astype(jnp.int32)  # [H]
        key = jnp.take_along_axis(means, axis[seg][:, None], axis=-1)[:, 0]
        key = jnp.where(real, key, big)      # pads rank past every real row

        # rank of each point within its segment by (seg, key)
        sorted_seg, _, perm = jax.lax.sort(
            (seg, key, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
        starts = jnp.searchsorted(sorted_seg, jnp.arange(h_cap, dtype=jnp.int32),
                                  side="left")
        rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_seg]
        rank = jnp.zeros((n,), jnp.int32).at[perm].set(rank_sorted)

        left_size = counts[seg] // 2
        is_right = (rank >= left_size).astype(jnp.int32)
        new_seg = jnp.where(active, 2 * seg + 1 + is_right, seg)
        occupied = occupied.at[jnp.where(real, new_seg, h_cap)].set(
            True, mode="drop")
        seg = new_seg

    return seg, occupied


def _merge_level(ph_arrays, lo_i: int, hi_i: int, interior,
                 clamp_opacity: bool = True):
    """Merge children [2*lo_i+1, 2*hi_i+1) into parents [lo_i, hi_i).

    All static slices. Returns updated arrays for the parent range only.
    ClusterMerger.cpp:50-146 semantics.
    """
    pos, scale, quat, opacity, sh, box_lo, box_hi, max_side = ph_arrays
    c_lo, c_hi = 2 * lo_i + 1, 2 * hi_i + 1
    m = hi_i - lo_i

    def ch(x, off):
        # children of parent lo_i+p are at 2(lo_i+p)+1(+off): stride-2 slice
        return x[c_lo + off: c_hi + off: 2]

    p0, p1 = ch(pos, 0), ch(pos, 1)
    s0, s1 = ch(scale, 0), ch(scale, 1)
    q0, q1 = ch(quat, 0), ch(quat, 1)
    o0, o1 = ch(opacity, 0), ch(opacity, 1)
    sh0, sh1 = ch(sh, 0), ch(sh, 1)

    w0 = o0 * ellipse_surface(s0)
    w1 = o1 * ellipse_surface(s1)
    wsum = w0 + w1
    wsafe = jnp.where(wsum > 0, wsum, 1.0)
    a0 = (w0 / wsafe)[:, None]
    a1 = (w1 / wsafe)[:, None]

    mpos = a0 * p0 + a1 * p1
    msh = a0[..., None] * sh0 + a1[..., None] * sh1

    cov0 = gaussian_math.unpack_cov3d(gaussian_math.compute_cov3d(s0, q0))
    cov1 = gaussian_math.unpack_cov3d(gaussian_math.compute_cov3d(s1, q1))
    d0 = (p0 - mpos)[..., :, None]
    d1 = (p1 - mpos)[..., :, None]
    mcov = (a0[..., None] * (cov0 + d0 @ jnp.swapaxes(d0, -1, -2))
            + a1[..., None] * (cov1 + d1 @ jnp.swapaxes(d1, -1, -2)))
    # numerical floor, mirroring the reference's retry loop
    # (ClusterMerger.cpp:101-116) without data-dependent control flow
    mcov = mcov + jnp.eye(3) * 1e-12

    evals, evecs = sym_eigh3(mcov)
    mscale = jnp.sqrt(jnp.abs(evals))
    # handedness fix (ClusterMerger.cpp:118-126)
    cross = jnp.cross(evecs[..., :, 0], evecs[..., :, 1])
    det_neg = jnp.sum(cross * evecs[..., :, 2], axis=-1) < 0
    evecs = evecs.at[..., :, 2].multiply(jnp.where(det_neg, -1.0, 1.0)[..., None])
    mquat = quaternion.from_matrix(evecs)
    # opacity = wsum / surface can exceed 1 in the REFERENCE (its retry
    # loop ClusterMerger.cpp:101-116 only handles zero eigenvalues; merged
    # opacity ClusterMerger.cpp:139 is written unclamped — the committed
    # oracle fixture has 20/1023 interior nodes above 1). Production mode
    # (clamp_opacity=True, our deviation) inflates the scale by
    # sqrt(wsum/surface) — ellipse_surface is quadratic in scale, so the
    # opacity lands exactly at 1 in closed form while preserving the
    # opacity*surface weight. clamp_opacity=False reproduces the reference
    # exactly (used by the oracle parity tests).
    surf = jnp.maximum(ellipse_surface(mscale), 1e-20)
    if clamp_opacity:
        inflate = jnp.sqrt(jnp.maximum(wsum / surf, 1.0))
        mscale = mscale * inflate[..., None]
    mop = wsum / jnp.maximum(ellipse_surface(mscale), 1e-20)

    # AABB union + longest side (ClusterMerger.cpp:148-169)
    blo = jnp.minimum(ch(box_lo, 0), ch(box_lo, 1))
    bhi = jnp.maximum(ch(box_hi, 0), ch(box_hi, 1))
    mside = jnp.max(bhi - blo, axis=-1)

    msk = interior[lo_i:hi_i]
    def sel(new, old):
        b = msk.reshape((m,) + (1,) * (new.ndim - 1))
        return jnp.where(b, new, old)

    return (
        sel(mpos, pos[lo_i:hi_i]), sel(mscale, scale[lo_i:hi_i]),
        sel(mquat, quat[lo_i:hi_i]), sel(mop, opacity[lo_i:hi_i]),
        sel(msh, sh[lo_i:hi_i]), sel(blo, box_lo[lo_i:hi_i]),
        sel(bhi, box_hi[lo_i:hi_i]), sel(mside, max_side[lo_i:hi_i]),
    )


def _merge_level_avg(ph_arrays, lo_i: int, hi_i: int, interior):
    """Simple-average merge (reference AvgMerger.cpp:14-44, the alternate
    merger): parent = mean of children for position/opacity/rotation/SH,
    SUM of scales (the reference accumulates scale without dividing)."""
    pos, scale, quat, opacity, sh, box_lo, box_hi, max_side = ph_arrays
    c_lo, c_hi = 2 * lo_i + 1, 2 * hi_i + 1
    m = hi_i - lo_i

    def ch(x, off):
        return x[c_lo + off: c_hi + off: 2]

    mpos = 0.5 * (ch(pos, 0) + ch(pos, 1))
    mscale = ch(scale, 0) + ch(scale, 1)
    q = 0.5 * (ch(quat, 0) + ch(quat, 1))
    mquat = q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    mop = 0.5 * (ch(opacity, 0) + ch(opacity, 1))
    msh = 0.5 * (ch(sh, 0) + ch(sh, 1))

    blo = jnp.minimum(ch(box_lo, 0), ch(box_lo, 1))
    bhi = jnp.maximum(ch(box_hi, 0), ch(box_hi, 1))
    mside = jnp.max(bhi - blo, axis=-1)

    msk = interior[lo_i:hi_i]

    def sel(new, old):
        b = msk.reshape((m,) + (1,) * (new.ndim - 1))
        return jnp.where(b, new, old)

    return (
        sel(mpos, pos[lo_i:hi_i]), sel(mscale, scale[lo_i:hi_i]),
        sel(mquat, quat[lo_i:hi_i]), sel(mop, opacity[lo_i:hi_i]),
        sel(msh, sh[lo_i:hi_i]), sel(blo, box_lo[lo_i:hi_i]),
        sel(bhi, box_hi[lo_i:hi_i]), sel(mside, max_side[lo_i:hi_i]),
    )


# 24 proper signed axis permutations for rotation alignment
def _proper_perms():
    perms, signs = [], []
    for p in ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)):
        for s in range(8):
            sg = np.array([1 - 2 * ((s >> w) & 1) for w in range(3)], np.float32)
            # permutation parity x sign parity must be even (det > 0)
            eye = np.eye(3, dtype=np.float32)[:, list(p)] * sg[None, :]
            if np.linalg.det(eye) > 0:
                perms.append(p)
                signs.append(sg)
    return np.asarray(perms, np.int32), np.asarray(signs, np.float32)


_PERMS, _SIGNS = _proper_perms()


def align_rotations_to(parent_quat, child_quat, child_scale):
    """Pick the proper signed axis permutation of each child rotation that
    best matches the parent (max Frobenius inner product), permuting scale
    accordingly (rotation_aligner.cpp:23-89). Batched over leading axis."""
    rp = quaternion.to_matrix(quaternion.normalize(parent_quat))
    rc = quaternion.to_matrix(quaternion.normalize(child_quat))

    perms = jnp.asarray(_PERMS)      # [24,3]
    signs = jnp.asarray(_SIGNS)      # [24,3]

    # candidate matrices: cols permuted + sign-flipped  [...,24,3,3]
    cand = rc[..., :, perms]                  # [..., 3(row), 24, 3(col)]
    cand = jnp.moveaxis(cand, -3, -2)         # [..., 24, 3(row), 3(col)]
    cand = cand * signs[:, None, :]
    score = jnp.sum(cand * rp[..., None, :, :], axis=(-1, -2))   # [...,24]
    best = jnp.argmax(score, axis=-1)

    bperm = perms[best]                                           # [...,3]
    bsigns = signs[best]
    r_best = jnp.take_along_axis(
        rc, jnp.broadcast_to(bperm[..., None, :], rc.shape), axis=-1
    ) * bsigns[..., None, :]
    new_quat = quaternion.from_matrix(r_best)
    new_scale = jnp.take_along_axis(child_scale, bperm, axis=-1)
    return new_quat, new_scale


@functools.partial(jax.jit,
                   static_argnames=("n_levels", "merger", "clamp_opacity"))
def build_hierarchy_padded(means, scales, quats, opacities, shs, real=None,
                           *, n_levels: int,
                           merger: str = "cluster",
                           clamp_opacity: bool = True) -> PaddedHierarchy:
    """Full hierarchy build (kd split + merge + align) on heap-padded arrays.

    ``real`` (optional [n] bool) marks live input rows when the leaf arrays
    are padded to a shape bucket — see assign_kd_segments."""
    n = means.shape[0]
    h_cap = 2 ** (n_levels + 1) - 1

    leaf_seg, occupied = assign_kd_segments(means, scales, n_levels,
                                            real=real)
    # padded rows scatter to h_cap (out of bounds, dropped)
    safe_seg = leaf_seg if real is None else \
        jnp.where(real, leaf_seg, h_cap)
    # a node is interior iff its left child slot is occupied (children come in
    # pairs); guard the last level whose child indices fall outside the heap
    left_child = 2 * jnp.arange(h_cap) + 1
    interior = occupied & (left_child < h_cap) & occupied[jnp.clip(left_child, 0, h_cap - 1)]

    k = shs.shape[1]
    pos = jnp.zeros((h_cap, 3)).at[safe_seg].set(means, mode="drop")
    scale = jnp.ones((h_cap, 3)).at[safe_seg].set(scales, mode="drop")
    quat = jnp.zeros((h_cap, 4)).at[:, 0].set(1.0) \
        .at[safe_seg].set(quats, mode="drop")
    opacity = jnp.zeros((h_cap,)).at[safe_seg].set(opacities, mode="drop")
    sh = jnp.zeros((h_cap, k, 3)).at[safe_seg].set(shs, mode="drop")
    r = 3.0 * jnp.max(scales, axis=-1, keepdims=True)
    box_lo = jnp.zeros((h_cap, 3)).at[safe_seg].set(means - r, mode="drop")
    box_hi = jnp.zeros((h_cap, 3)).at[safe_seg].set(means + r, mode="drop")
    max_side = jnp.zeros((h_cap,)).at[safe_seg].set(
        jnp.max((means + r) - (means - r), axis=-1), mode="drop")
    leaf_point = jnp.full((h_cap,), -1, jnp.int32).at[safe_seg].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")

    # bottom-up merge, level by level (static slice per level)
    arrays = [pos, scale, quat, opacity, sh, box_lo, box_hi, max_side]
    merge_fn = {
        "cluster": functools.partial(_merge_level,
                                     clamp_opacity=clamp_opacity),
        "avg": _merge_level_avg,
    }[merger]
    for level in range(n_levels - 1, -1, -1):
        lo_i, hi_i = 2 ** level - 1, 2 ** (level + 1) - 1
        merged = merge_fn(tuple(arrays), lo_i, hi_i, interior)
        arrays = [a.at[lo_i:hi_i].set(mnew) for a, mnew in zip(arrays, merged)]
    pos, scale, quat, opacity, sh, box_lo, box_hi, max_side = arrays

    # top-down rotation alignment, level by level
    for level in range(1, n_levels + 1):
        lo_i = 2 ** level - 1
        hi_i = min(2 ** (level + 1) - 1, h_cap)
        if lo_i >= h_cap:
            break
        par = (jnp.arange(lo_i, hi_i) - 1) // 2
        nq, ns = align_rotations_to(quat[par], quat[lo_i:hi_i], scale[lo_i:hi_i])
        has_parent = occupied[lo_i:hi_i]
        quat = quat.at[lo_i:hi_i].set(jnp.where(has_parent[:, None], nq,
                                                quat[lo_i:hi_i]))
        scale = scale.at[lo_i:hi_i].set(jnp.where(has_parent[:, None], ns,
                                                  scale[lo_i:hi_i]))

    depth = heap_depth(jnp.arange(h_cap, dtype=jnp.int32))
    return PaddedHierarchy(
        pos=pos, scale=scale, quat=quat, opacity=opacity, sh=sh,
        box_lo=box_lo, box_hi=box_hi, max_side=max_side,
        occupied=occupied, interior=interior, leaf_point=leaf_point,
        depth=depth)


class Hierarchy(NamedTuple):
    """Dense hierarchy: M = 2n-1 nodes, node idx == gaussian idx.

    Node table columns as in the model (reference scene/gaussian_model.py:31-36).
    """

    pos: np.ndarray
    scale: np.ndarray
    quat: np.ndarray
    opacity: np.ndarray
    sh: np.ndarray
    nodes: np.ndarray       # [M,6] int32
    box_lo: np.ndarray
    box_hi: np.ndarray
    max_side: np.ndarray
    leaf_point: np.ndarray  # [M] original point index (-1 for interior)


def compact_hierarchy(ph: PaddedHierarchy) -> Hierarchy:
    """Densify occupied heap slots -> node table (host-side indexing only)."""
    occ = np.asarray(ph.occupied)
    h_cap = occ.shape[0]
    new_idx = np.cumsum(occ) - 1            # heap id -> dense id
    heap_ids = np.nonzero(occ)[0]
    m = heap_ids.shape[0]

    interior = np.asarray(ph.interior)[heap_ids]
    parent_heap = (heap_ids - 1) // 2
    parent = np.where(heap_ids == 0, -1, new_idx[parent_heap]).astype(np.int32)
    lc = 2 * heap_ids + 1
    rc = 2 * heap_ids + 2
    first_child = np.where(interior, new_idx[np.minimum(lc, h_cap - 1)], -1)
    # next sibling: left child -> right sibling, right child -> 0 (end)
    is_left = heap_ids % 2 == 1
    sibling_heap = np.where(is_left, heap_ids + 1, heap_ids)
    next_sib = np.where(heap_ids == 0, 0,
                        np.where(is_left, new_idx[np.minimum(sibling_heap, h_cap - 1)], 0))

    nodes = np.stack([
        np.asarray(ph.depth)[heap_ids],
        parent,
        np.where(interior, 2, 0),
        first_child.astype(np.int32),
        next_sib.astype(np.int32),
        np.zeros(m, np.int32),
    ], axis=-1).astype(np.int32)

    def take(x):
        return np.asarray(x)[heap_ids]

    return Hierarchy(
        pos=take(ph.pos), scale=take(ph.scale), quat=take(ph.quat),
        opacity=take(ph.opacity), sh=take(ph.sh),
        nodes=nodes, box_lo=take(ph.box_lo), box_hi=take(ph.box_hi),
        max_side=take(ph.max_side), leaf_point=take(ph.leaf_point))


def build_hierarchy(means, scales, quats, opacities, shs,
                    merger: str = "cluster",
                    clamp_opacity: bool = True) -> Hierarchy:
    """Offline entry point: numpy/jnp in, dense Hierarchy out.

    merger="cluster" is the production covariance-preserving merge
    (ClusterMerger.cpp); "avg" is the simple-average alternate
    (AvgMerger.cpp).

    Inputs are padded to a power-of-two leaf bucket with a validity mask:
    the jitted build then compiles ONCE per bucket instead of once per
    distinct leaf count (~150 s per cold build compile through the remote
    compile service — a per-chunk wall in the pipeline). Padded rows are
    provably inert in the kd split (see assign_kd_segments) and dropped
    from every scatter, so the produced tree is identical to the unpadded
    build's."""
    n = int(means.shape[0])
    n_levels = _num_levels(n)
    bucket = 2 ** n_levels if n > 1 else 1
    assert bucket >= n
    means, scales, quats, opacities, shs = (
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(shs))
    real = None
    if bucket != n:
        pad = bucket - n

        def padded(x, fill=0.0):
            w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, w, constant_values=fill)

        # padded scales = 1 keeps log/exp finite in downstream consumers
        means, quats, opacities, shs = (padded(means), padded(quats),
                                        padded(opacities), padded(shs))
        scales = padded(scales, fill=1.0)
        real = jnp.arange(bucket) < n
    ph = build_hierarchy_padded(
        means, scales, quats, opacities, shs, real, n_levels=n_levels,
        merger=merger, clamp_opacity=clamp_opacity)
    return compact_hierarchy(ph)


def build_flat(means, scales, quats, opacities, shs) -> Hierarchy:
    """Single-root flat "hierarchy" (reference FlatGenerator.cpp:14-31 +
    AvgMerger root): node 0 is an average-merged root whose children are
    every input Gaussian, chained as siblings."""
    n = int(means.shape[0])
    c = n + 1
    nodes = np.full((c, 6), -1, np.int32)
    # root
    nodes[0, NODE_DEPTH] = 0
    nodes[0, NODE_PARENT] = -1
    nodes[0, NODE_CHILD_COUNT] = n
    nodes[0, NODE_FIRST_CHILD] = 1
    # leaves
    nodes[1:, NODE_DEPTH] = 1
    nodes[1:, NODE_PARENT] = 0
    nodes[1:, NODE_CHILD_COUNT] = 0
    nodes[1:, NODE_FIRST_CHILD] = -1
    nodes[1:c - 1, NODE_NEXT_SIBLING] = np.arange(2, c, dtype=np.int32)

    q = np.mean(np.asarray(quats), axis=0)
    q /= max(np.linalg.norm(q), 1e-12)
    pos = np.concatenate([np.mean(np.asarray(means), 0, keepdims=True),
                          np.asarray(means)], 0).astype(np.float32)
    scale = np.concatenate([np.sum(np.asarray(scales), 0, keepdims=True),
                            np.asarray(scales)], 0).astype(np.float32)
    quat = np.concatenate([q[None], np.asarray(quats)], 0).astype(np.float32)
    op = np.concatenate([[np.mean(np.asarray(opacities))],
                         np.asarray(opacities)], 0).astype(np.float32)
    sh = np.concatenate([np.mean(np.asarray(shs), 0, keepdims=True),
                         np.asarray(shs)], 0).astype(np.float32)
    r = 3.0 * scale.max(axis=1, keepdims=True)
    box_lo = pos - r
    box_hi = pos + r
    box_lo[0] = (pos[1:] - r[1:]).min(0)
    box_hi[0] = (pos[1:] + r[1:]).max(0)
    leaf_point = np.concatenate(
        [[-1], np.arange(n, dtype=np.int32)]).astype(np.int32)
    return Hierarchy(pos=pos, scale=scale, quat=quat, opacity=op, sh=sh,
                     nodes=nodes, box_lo=box_lo, box_hi=box_hi,
                     max_side=(box_hi - box_lo).max(1).astype(np.float32),
                     leaf_point=leaf_point)
