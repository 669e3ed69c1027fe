"""Appearance filtering, random cuts, and gradient-propagation weights.

* `appearance_filter_mask` — mark the hierarchy nodes that any training
  viewpoint would ever select at a given granularity; everything deeper is
  never-needed detail that the reference's `AppearanceFilter` prunes or
  anchors (appearance_filter.cpp + markVisibleForAllViewpoints,
  runtime_switching.cu:1036-1080). One vmapped cut over all viewpoints.
* `random_cut_mask` — the fork's randomized-coarsening cut used for
  regularization experiments (get_random_cut,
  scene/gaussian_model.py:528-551): start from all leaves, repeatedly
  collapse a random subset of sibling pairs bottom-up.
* `sibling_weights` — opacity*surface weights normalized over sibling pairs
  (recompute_weights, scene/gaussian_model.py:557-568), used to split
  gradients flowing from a parent to its children when gradient
  propagation is enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.hierarchy import cut as cut_mod
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)


def appearance_filter_mask(nodes, pos, max_scale, alive, viewpoints,
                           target_size, *, batch: int = 64) -> jnp.ndarray:
    """[C] bool: node selected by the granularity cut from ANY viewpoint.

    viewpoints: [V,3]. Nodes never marked can be pruned (their detail is
    unreachable at this granularity from every training camera)."""
    c = nodes.shape[0]
    seen = jnp.zeros((c,), bool)

    @jax.jit
    def mark(seen, vp):
        cut = cut_mod.expand_to_size_dynamic(
            nodes, pos, max_scale, alive, vp,
            jnp.asarray([0.0, 0.0, 1.0]), target_size, use_frustum=False)
        return seen | cut.render_mask

    vps = np.asarray(viewpoints)
    for i in range(vps.shape[0]):
        seen = mark(seen, jnp.asarray(vps[i]))
    # ancestors of seen nodes are implicitly needed too
    seen_np = np.array(seen)  # writable host copy
    parent = np.asarray(nodes[:, NODE_PARENT])
    for _ in range(64):
        p_mask = seen_np & (parent >= 0)
        newly = np.zeros_like(seen_np)
        newly[parent[p_mask]] = True
        grown = newly & ~seen_np
        if not grown.any():
            break
        seen_np |= newly
    return jnp.asarray(seen_np)


def random_cut_mask(nodes, alive, p: float, key) -> np.ndarray:
    """[C] bool random coarsening cut: collapse a fraction ``p`` of leaves
    into their parents, level-synchronously from the deepest level up
    (reference get_random_cut, gaussian_model.py:528-551). Host-side."""
    nodes = np.asarray(nodes)
    alive = np.asarray(alive)
    c = nodes.shape[0]
    real = alive & (nodes[:, NODE_DEPTH] >= 0)
    cut = real & (nodes[:, NODE_CHILD_COUNT] == 0)

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1))
                                if hasattr(key, "dtype") else key)
    leaves = np.where(cut)[0]
    subset = rng.permutation(leaves)[: int(len(leaves) * p)]
    if len(subset) == 0:
        return cut
    depth = nodes[:, NODE_DEPTH]
    for d in range(int(depth[subset].max()), 0, -1):
        at_d = subset[depth[subset] == d]
        first = at_d[nodes[at_d, NODE_NEXT_SIBLING] > 0]
        sibs = nodes[first, NODE_NEXT_SIBLING]
        ok = cut[sibs]
        first, sibs = first[ok], sibs[ok]
        parents = nodes[first, NODE_PARENT]
        cut[parents] = True
        cut[first] = False
        cut[sibs] = False
        subset = np.concatenate([parents, subset[depth[subset] < d]])
    return cut


def sibling_weights(nodes, log_scale, opacity_logit, alive) -> jnp.ndarray:
    """[C] weights: opacity * ellipse surface, normalized so each sibling
    pair sums to 1; roots get 1 (recompute_weights,
    gaussian_model.py:557-568). Drives parent->child gradient splitting."""
    c = nodes.shape[0]
    scales = jnp.exp(log_scale)
    surface = (scales[:, 0] * scales[:, 1] + scales[:, 0] * scales[:, 2]
               + scales[:, 1] * scales[:, 2])
    w = surface * jax.nn.sigmoid(opacity_logit[:, 0])

    first = nodes[:, NODE_FIRST_CHILD]
    has_kids = (nodes[:, NODE_CHILD_COUNT] > 0) & alive
    f_c = jnp.clip(first, 0, c - 1)
    sib = jnp.clip(nodes[f_c, NODE_NEXT_SIBLING], 0, c - 1)
    denom = w[f_c] + w[sib]
    denom = jnp.where(denom > 0, denom, 1.0)

    norm = jnp.ones((c,))
    norm = norm.at[jnp.where(has_kids, f_c, c)].set(
        (w[f_c] / denom), mode="drop")
    norm = norm.at[jnp.where(has_kids, sib, c)].set(
        (w[sib] / denom), mode="drop")
    return jnp.where(alive, norm, 0.0)


def compute_anchors(nodes, pos, max_scale, alive, viewpoints,
                    target_size) -> np.ndarray:
    """Anchor gaussian indices (AppearanceFilter::writeAnchors,
    appearance_filter.cpp:377-455): the bottom cut of the
    visible-from-any-viewpoint set plus everything below it. Rows above the
    bottom cut are "anchored" detail the filter may prune/freeze."""
    seen = np.asarray(appearance_filter_mask(
        nodes, pos, max_scale, alive, viewpoints, target_size))
    nodes_np = np.asarray(nodes)
    c = nodes_np.shape[0]
    parent = nodes_np[:, NODE_PARENT]

    # bottom = seen nodes with no seen child (seen is ancestor-closed)
    has_seen_child = np.zeros(c, bool)
    pm = (parent >= 0) & seen
    has_seen_child[parent[pm]] = True
    bottom = seen & ~has_seen_child

    # anchors = seen nodes + all descendants of bottom nodes
    anchor = seen.copy()
    below = bottom.copy()
    for _ in range(64):
        child_of_below = (parent >= 0) & below[np.clip(parent, 0, c - 1)]
        new = child_of_below & ~below
        if not new.any():
            break
        below |= new
        anchor |= new
    return np.where(anchor)[0].astype(np.int32)


def write_anchors(path: str, indices: np.ndarray) -> None:
    """anchors.bin: [int32 count][int32 indices...] — byte-compatible with
    the reference reader (scene/gaussian_model.py:1004-1013)."""
    import struct
    idx = np.asarray(indices, np.int32)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(idx)))
        f.write(idx.astype("<i4").tobytes())


def read_anchors(path: str) -> np.ndarray:
    import struct
    with open(path, "rb") as f:
        n = struct.unpack("<i", f.read(4))[0]
        return np.frombuffer(f.read(4 * n), dtype="<i4").copy()
