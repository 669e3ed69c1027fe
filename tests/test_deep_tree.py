"""Deep-tree scale properties (round-4 directive #8).

PIPELINE_r03 reached depth-20/465k-node trees but the cut/interp property
tests ran on toy trees; these run the same invariants on a synthetically
GENERATED ~500k-node, depth>=24 unbalanced tree (no O(N log N) build —
the node table is constructed directly in numpy, which is what lets a
500k-node case live in the CPU suite).

Invariants:
* every granularity cut is a proper cut (each leaf has exactly one
  selected ancestor-or-self) — reference is_hierarchy_cut semantics. The
  BOX metric is exercised from a NEAR viewpoint: nested boxes make its
  size monotone along every path regardless of camera placement
  (computeSizeGPU, runtime_switching.cu:210-219). The DYNAMIC point
  metric, like the reference's, presumes parent size >= child size —
  guaranteed only when scale decay dominates distance variation — so it
  is exercised from a far viewpoint where that precondition holds for
  ANY tree shape.
* interpolation weights are continuous across cut transitions: a node
  ENTERS the cut (its parent splits) with ts ~ 0 and leaves full detail
  (its own split threshold) with ts ~ 1, so no granularity change pops
  (computeTsIndexedDynamic, runtime_switching.cu:640-684).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hlod_gaussians_tpu.hierarchy import cut as hc
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)


def make_deep_tree(n_leaves=250_000, skew=0.28, seed=0):
    """Unbalanced binary tree over leaves on a 3D helix.

    Interior nodes split their leaf range at `skew`, so one branch is deep
    (depth ~ 35+ at 250k) while most mass stays shallow — the shape of real
    kd hierarchies over uneven scans. Node pos/scale/boxes are segment
    means/extents; child boxes nest inside parent boxes by construction.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_leaves, dtype=np.float64)
    spacing = 0.01
    leaf_pos = np.stack([
        np.cos(t * 0.001) * 8.0,
        np.sin(t * 0.001) * 8.0,
        t / n_leaves * 6.0,
    ], axis=-1).astype(np.float32)
    leaf_pos += rng.normal(0, spacing, leaf_pos.shape).astype(np.float32)

    m = 2 * n_leaves - 1
    nodes = np.full((m, 6), 0, np.int32)
    nodes[:, NODE_PARENT] = -1
    nodes[:, NODE_FIRST_CHILD] = -1
    pos = np.zeros((m, 3), np.float32)
    max_scale = np.zeros((m,), np.float32)
    box_lo = np.zeros((m, 3), np.float32)
    box_hi = np.zeros((m, 3), np.float32)

    next_id = 1
    stack = [(0, 0, n_leaves, 0)]
    while stack:
        nid, lo, hi, depth = stack.pop()
        seg = leaf_pos[lo:hi]
        pos[nid] = seg.mean(axis=0)
        box_lo[nid] = seg.min(axis=0) - spacing
        box_hi[nid] = seg.max(axis=0) + spacing
        ext = (seg.max(axis=0) - seg.min(axis=0)).max() if hi - lo > 1 else 0
        max_scale[nid] = max(float(ext) * 0.5, spacing)
        nodes[nid, NODE_DEPTH] = depth
        if hi - lo == 1:
            nodes[nid, NODE_CHILD_COUNT] = 0
            continue
        split = lo + max(1, min(hi - lo - 1, int((hi - lo) * skew)))
        a, b = next_id, next_id + 1
        next_id += 2
        nodes[nid, NODE_CHILD_COUNT] = 2
        nodes[nid, NODE_FIRST_CHILD] = a
        nodes[a, NODE_PARENT] = nid
        nodes[b, NODE_PARENT] = nid
        nodes[a, NODE_NEXT_SIBLING] = b
        nodes[b, NODE_NEXT_SIBLING] = 0
        stack.append((a, lo, split, depth + 1))
        stack.append((b, split, hi, depth + 1))
    assert next_id == m
    max_side = (box_hi - box_lo).max(axis=-1)
    return nodes, pos, max_scale, box_lo, box_hi, max_side


_TREE = None


def get_tree():
    global _TREE
    if _TREE is None:
        _TREE = make_deep_tree()
    return _TREE


FAR = jnp.asarray([0.0, 0.0, -4000.0])
NEAR = jnp.asarray([2.0, -3.0, -12.0])
ZDIR = jnp.asarray([0.0, 0.0, 1.0])


def test_deep_tree_shape():
    nodes, pos, max_scale, box_lo, box_hi, max_side = get_tree()
    assert nodes.shape[0] >= 499_999
    assert int(nodes[:, NODE_DEPTH].max()) >= 24
    par = nodes[:, NODE_PARENT]
    has_p = par >= 0
    # nested boxes + monotone scale: the cut metrics' preconditions
    assert (max_scale[par[has_p]] >= max_scale[has_p] - 1e-7).all()
    assert (box_lo[par[has_p]] <= box_lo[has_p] + 1e-6).all()
    assert (box_hi[par[has_p]] >= box_hi[has_p] - 1e-6).all()


@pytest.mark.parametrize("target", [1e-3, 2e-4, 4e-5, 8e-6, 1e-6])
def test_deep_tree_cut_proper_dynamic(target):
    nodes, pos, max_scale, *_ = get_tree()
    nodes_j = jnp.asarray(nodes)
    alive = jnp.ones((nodes.shape[0],), bool)
    cut = hc.expand_to_size_dynamic(
        nodes_j, jnp.asarray(pos), jnp.asarray(max_scale), alive,
        FAR, ZDIR, float(target), use_frustum=False)
    assert int(jnp.sum(cut.render_mask)) > 0
    assert bool(hc.is_hierarchy_cut(nodes_j, cut.render_mask, alive))


@pytest.mark.parametrize("target", [0.2, 0.02, 2e-3, 3e-4, 1e-5])
def test_deep_tree_cut_proper_box_near(target):
    """Box metric from INSIDE the scene's near field: nested boxes keep the
    size monotone along paths, so the cut must be proper at any target even
    where the point metric's precondition fails."""
    nodes, pos, max_scale, box_lo, box_hi, max_side = get_tree()
    nodes_j = jnp.asarray(nodes)
    alive = jnp.ones((nodes.shape[0],), bool)
    cut = hc.expand_to_size_box(
        nodes_j, jnp.asarray(box_lo), jnp.asarray(box_hi),
        jnp.asarray(max_side), alive, NEAR, float(target))
    assert int(jnp.sum(cut.render_mask)) > 0
    assert bool(hc.is_hierarchy_cut(nodes_j, cut.render_mask, alive))


def test_deep_tree_cut_counts_monotone():
    """Smaller granularity target => at least as many selected nodes."""
    nodes, pos, max_scale, *_ = get_tree()
    nodes_j = jnp.asarray(nodes)
    alive = jnp.ones((nodes.shape[0],), bool)
    counts = []
    for target in (1e-3, 2e-4, 4e-5, 8e-6, 1e-6):
        cut = hc.expand_to_size_dynamic(
            nodes_j, jnp.asarray(pos), jnp.asarray(max_scale), alive,
            FAR, ZDIR, float(target), use_frustum=False)
        counts.append(int(jnp.sum(cut.render_mask)))
    assert counts == sorted(counts), counts
    assert counts[-1] == 250_000          # finest = all leaves


def test_deep_tree_ts_continuity_at_transitions():
    """At the exact target where a node's PARENT splits (node enters the
    cut), the node's interpolation weight is ~0 — it renders as its parent,
    so the transition is invisible. At the node's own split threshold the
    weight is ~1 (full self). Sampled across depths of the 500k tree."""
    nodes, pos, max_scale, *_ = get_tree()
    nodes_j = jnp.asarray(nodes)
    alive = jnp.ones((nodes.shape[0],), bool)
    viewpoint = np.array([0.0, 0.0, -4000.0], np.float32)

    dist = np.linalg.norm(pos - viewpoint, axis=-1)
    size = max_scale / dist
    par = nodes[:, NODE_PARENT]

    rng = np.random.default_rng(3)
    mid = np.where((par >= 0) & (nodes[:, NODE_DEPTH] >= 6)
                   & (nodes[:, NODE_DEPTH] <= 24)
                   & (size < size[np.clip(par, 0, None)] * 0.999))[0]
    sample = rng.choice(mid, size=12, replace=False)

    for i in sample:
        ps = float(size[par[i]])
        s = float(size[i])
        # entering: target just below the parent's size
        cut = hc.expand_to_size_dynamic(
            nodes_j, jnp.asarray(pos), jnp.asarray(max_scale), alive,
            jnp.asarray(viewpoint), ZDIR, ps * (1.0 - 1e-5),
            use_frustum=False)
        assert bool(cut.render_mask[i])
        # ts at entry ~ 0 when the interp band starts at ps/2 (s <= ps/2);
        # when s > ps/2 the band is [s, ps] and the entry weight is the
        # band-relative position (continuous either way)
        entry_ts = float(cut.ts[i])
        if s <= 0.5 * ps:
            assert entry_ts < 2e-3, (i, entry_ts)
        # leaving full detail: target at the node's own band floor
        cut2 = hc.expand_to_size_dynamic(
            nodes_j, jnp.asarray(pos), jnp.asarray(max_scale), alive,
            jnp.asarray(viewpoint), ZDIR,
            max(s, 0.5 * ps) * (1.0 + 1e-5), use_frustum=False)
        if bool(cut2.render_mask[i]):
            assert float(cut2.ts[i]) > 0.98, (i, float(cut2.ts[i]))
