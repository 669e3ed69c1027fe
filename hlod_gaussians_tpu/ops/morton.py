"""3D Morton (Z-order) codes for spatial sorting.

TPU-native replacement for the reference's getMortonCodeCUDA
(submodules/gaussianhierarchy/morton.cu:8-45): 21 bits per axis interleaved
into a 63-bit code. JAX on TPU defaults to 32-bit ints, so the code is
returned as a pair of sortable uint32 words (hi, lo) plus a convenience
`argsort` that lexicographically sorts them.

Used for: storage layout locality (gaussian_model.sort_morton,
scene/gaussian_model.py:570-601), approximate-KNN windows (ops/knn.py), and
Morton-bucketed kd builds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _part1by2_21(x):
    """Spread 21 bits of x so there are 2 zero bits between each (64-bit)."""
    x = x.astype(jnp.uint64)
    x &= jnp.uint64(0x1FFFFF)
    x = (x | (x << 32)) & jnp.uint64(0x1F00000000FFFF)
    x = (x | (x << 16)) & jnp.uint64(0x1F0000FF0000FF)
    x = (x | (x << 8)) & jnp.uint64(0x100F00F00F00F00F)
    x = (x | (x << 4)) & jnp.uint64(0x10C30C30C30C30C3)
    x = (x | (x << 2)) & jnp.uint64(0x1249249249249249)
    return x


def morton_codes(points, lo=None, hi=None):
    """Quantize [N,3] points into 21 bits/axis and interleave.

    Returns (hi32, lo32) uint32 arrays that sort lexicographically in the
    same order as the 63-bit Morton code.
    """
    if lo is None:
        lo = points.min(axis=0)
    if hi is None:
        hi = points.max(axis=0)
    scale = jnp.where(hi > lo, (hi - lo), 1.0)
    # reference quantization exactly (morton.cu:29-32): multiply by 2^21
    # and TRUNCATE — a coordinate at the exact max maps to 2^21, whose set
    # bit lies past the 21 interleaved bits and reads as 0 (the reference's
    # overflow quirk, reproduced for order parity; it misplaces only the
    # per-axis extreme points and is harmless for storage locality).
    # Out-of-range inputs (caller-provided lo/hi) clamp to [0, 2^21].
    q = ((points - lo) / scale * (1 << 21)).clip(0.0, float(1 << 21))
    # 64-bit ints are off by default on TPU, so build the 63-bit code as two
    # 32-bit words with a compile-time-unrolled interleave: bit i of axis a
    # lands at global position 3*i + a (positions 0..30 in lo, 31..62 in hi).
    qi = q.astype(jnp.uint32)
    lo_word = jnp.zeros(points.shape[:-1], jnp.uint32)
    hi_word = jnp.zeros(points.shape[:-1], jnp.uint32)
    for i in range(21):
        for a in range(3):
            bit = (qi[..., a] >> i) & jnp.uint32(1)
            p = 3 * i + a
            if p < 31:
                lo_word = lo_word | (bit << p)
            else:
                hi_word = hi_word | (bit << (p - 31))
    return hi_word, lo_word


def morton_argsort(points, lo=None, hi=None):
    """Indices that sort points in Morton order."""
    hi_w, lo_w = morton_codes(points, lo, hi)
    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # lexicographic (hi, lo) sort: jax.lax.sort with two keys
    _, _, perm = jax.lax.sort((hi_w, lo_w, idx), num_keys=2)
    return perm
