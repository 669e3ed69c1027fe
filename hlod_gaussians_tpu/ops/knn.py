"""Approximate k-nearest-neighbor mean squared distance for scale init.

TPU-native replacement for the reference's `simple_knn` CUDA extension
(`distCUDA2`, used at scene/gaussian_model.py:848-852 to initialize log-scales
from the mean squared distance to the 3 nearest neighbors).

The CUDA simple-knn is itself approximate (Morton-box search); here we use
the classic shifted space-filling-curve scheme: sort the points along
`shifts` translated Morton curves and take the k best among the +/- `window`
rank-neighbors of every curve. Everything is fixed-shape gathers + one
top_k, which vectorizes cleanly on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu.ops.morton import morton_argsort


@functools.partial(jax.jit, static_argnames=("k", "window", "shifts"))
def knn_mean_sq_dist(points, k: int = 3, window: int = 16, shifts: int = 3):
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [N, 3] float32.
    Returns:
      [N] float32 — same semantics as simple-knn's distCUDA2.
    """
    n = points.shape[0]
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    self_idx = jnp.arange(n, dtype=jnp.int32)

    cand_list = []
    for s in range(shifts):
        # translate by an irrational-ish fraction of the extent so cell
        # boundaries of the quantization grid differ per pass
        # keep the grid anchored at `lo` while translating the points, so
        # each pass sees genuinely different cell boundaries
        shift = (s * 0.38196601) * extent
        perm = morton_argsort(points + shift, lo=lo, hi=hi + shift)
        inv = jnp.zeros(n, jnp.int32).at[perm].set(self_idx)
        pos = inv[:, None] + offs[None, :]
        ok = (pos >= 0) & (pos < n)
        cand = perm[pos.clip(0, n - 1)]
        cand = jnp.where(ok, cand, n)  # n = sentinel (invalid)
        cand_list.append(cand)

    cand = jnp.concatenate(cand_list, axis=1)          # [N, shifts*2W]
    # dedup per row: sort candidate ids, mask repeats
    cand = jnp.sort(cand, axis=1)
    dup = jnp.concatenate([jnp.zeros((n, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1)
    valid = (cand < n) & (~dup)

    nbrs = points[cand.clip(0, n - 1)]
    d2 = jnp.sum((nbrs - points[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)

    neg_topk, _ = jax.lax.top_k(-d2, k)
    mean_sq = jnp.mean(-neg_topk, axis=-1)
    return jnp.where(jnp.isfinite(mean_sq), mean_sq, 1e-8)
