"""Granularity-driven LOD cuts + interpolation weights.

TPU re-design of the gaussianhierarchy runtime cut kernels
(runtime_switching.cu): the per-node CUDA kernels with parent gathers become
dense masked array ops over the flat node table — one gather per relation,
no pointer chasing. Both variants are provided:

* box-based (upstream ``expandToSize`` / ``computeTsIndexed``,
  runtime_switching.cu:495-684): projected size = longest-AABB-side /
  distance(viewpoint, box), infinite inside the box;
* dynamic (fork ``expandToSizeDynamic`` / ``computeTsIndexedDynamic``,
  runtime_switching.cu:222-233,533-582,640-684): size = max(scale) /
  distance(viewpoint, position), with the crude dot-product frustum test
  (``is_in_frustum``, runtime_switching.cu:165-187).

All functions return dense per-node values + boolean masks (static shapes);
callers compact with `jnp.nonzero(..., size=budget)` when an index list is
needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_PARENT)


def node_size_dynamic(pos, max_scale, viewpoint):
    """Projected size metric (computeSizeGPUDynamic,
    runtime_switching.cu:222-233): max(scale) / ||viewpoint - pos||.

    Computed in transposed [3, C] layout: elementwise math on [C, 3] uses 3
    of 128 vector lanes (~40x waste at 1M nodes); with C on the lane axis
    the norm is a 3-sublane reduce over full-width ops.
    """
    d = viewpoint[:, None] - pos.T                    # [3, C]
    dist = jnp.sqrt(jnp.sum(d * d, axis=0))           # [C]
    return max_scale / jnp.maximum(dist, 1e-12)


def node_size_box(box_lo, box_hi, max_side, viewpoint):
    """Upstream box metric (computeSizeGPU, runtime_switching.cu:210-219):
    max_side / distance(viewpoint, box); +inf when inside the box.
    Transposed-layout math (see node_size_dynamic)."""
    closest = jnp.clip(viewpoint[:, None], box_lo.T, box_hi.T)   # [3, C]
    d = viewpoint[:, None] - closest
    dist = jnp.sqrt(jnp.sum(d * d, axis=0))
    inside = dist <= 0.0
    return jnp.where(inside, jnp.inf, max_side / jnp.maximum(dist, 1e-12))


def in_frustum_crude(pos, viewpoint, zdir):
    """Crude frustum test (is_in_frustum, runtime_switching.cu:165-187):
    keep the node when the cosine between normalize(viewpoint - pos) and the
    camera forward axis is < -0.5 (i.e. the point is roughly in front).
    Transposed-layout math (see node_size_dynamic)."""
    diff = viewpoint[:, None] - pos.T                 # [3, C]
    norm = jnp.sqrt(jnp.sum(diff * diff, axis=0))     # [C]
    cos_angle = jnp.sum(diff * zdir[:, None], axis=0) / jnp.maximum(
        norm, 1e-12)
    return cos_angle < -0.5


def frustum_planes(full_proj):
    """Extract the 4 side frustum planes from a row-vector view-projection
    matrix (reference extract_frustum_planes, scene/gaussian_model.py:55-78).

    Returns [4,4] plane coefficients (a,b,c,d), normalized, for
    left/right/bottom/top; a point p is inside when dot(plane, [p,1]) >= 0.
    """
    m = full_proj.T  # column-vector convention rows
    planes = jnp.stack([
        m[3] + m[0],   # left
        m[3] - m[0],   # right
        m[3] + m[1],   # bottom
        m[3] - m[1],   # top
    ])
    n = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, 1e-12)


def sphere_in_frustum(pos, radius, planes):
    """Sphere-vs-4-plane test (reference scene/gaussian_model.py:80-103)."""
    d = pos @ planes[:, :3].T + planes[None, :, 3]   # [N,4]
    return jnp.all(d >= -radius[:, None], axis=-1)


class CutResult(NamedTuple):
    render_mask: jnp.ndarray   # [C] bool — node is in the cut
    size: jnp.ndarray          # [C] projected size per node
    ts: jnp.ndarray            # [C] interpolation weight (valid where mask)
    kids: jnp.ndarray          # [C] int32 number of siblings


class ParentCache(NamedTuple):
    """Per-node copies of the parent's cut inputs, built ONCE per tree
    update. The per-frame cut then needs NO gather at all: the parent's
    projected size is recomputed from the cached parent position/scale
    (viewpoint-dependent but gather-free). A [2, C] parent gather costs
    ~25 ms at 1M nodes — the whole point of this cache.

    For the dynamic metric: p_aux = (p_pos [C,3], p_scale [C]).
    For the box metric:     p_aux = (p_lo [C,3], p_hi [C,3], p_side [C]).
    """
    p_aux: tuple
    p_kids: jnp.ndarray        # [C] int32 parent child count


@jax.jit
def build_parent_cache(nodes, pos, max_scale) -> ParentCache:
    """Dynamic-metric parent cache (one stacked gather, amortized over all
    frames until the tree changes)."""
    c = nodes.shape[0]
    parent_c = jnp.clip(nodes[:, NODE_PARENT], 0, c - 1)
    from hlod_gaussians_tpu.ops import gather_rows
    px, py, pz, ps, pk = gather_rows(
        [pos[:, 0], pos[:, 1], pos[:, 2], max_scale,
         nodes[:, NODE_CHILD_COUNT]], parent_c)
    return ParentCache(p_aux=(jnp.stack([px, py, pz], axis=1), ps),
                       p_kids=pk)


@jax.jit
def build_parent_cache_box(nodes, box_lo, box_hi, max_side) -> ParentCache:
    """Box-metric parent cache."""
    c = nodes.shape[0]
    parent_c = jnp.clip(nodes[:, NODE_PARENT], 0, c - 1)
    from hlod_gaussians_tpu.ops import gather_rows
    cols = [box_lo[:, 0], box_lo[:, 1], box_lo[:, 2],
            box_hi[:, 0], box_hi[:, 1], box_hi[:, 2],
            max_side, nodes[:, NODE_CHILD_COUNT]]
    g = gather_rows(cols, parent_c)
    return ParentCache(
        p_aux=(jnp.stack(g[0:3], axis=1), jnp.stack(g[3:6], axis=1), g[6]),
        p_kids=g[7])



def _ts_kids(has_parent, parent_size, size, target_size, p_kids):
    """Interpolation weight + sibling count shared by both cut metrics
    (computeTsIndexed runtime_switching.cu:588-637 and
    computeTsIndexedDynamic :640-684 use the identical formula):
    t = 1 if root or parent still oversized (> 2*target); else
    t = max(1 - max(0, target-start)/diff, 0) with
    start = max(parent/2, size), diff = parent - start."""
    start = jnp.maximum(0.5 * parent_size, size)
    diff = parent_size - start
    tdiff = jnp.maximum(0.0, target_size - start)
    t_inner = jnp.where(
        diff <= 0, 1.0,
        jnp.maximum(1.0 - tdiff / jnp.where(diff <= 0, 1.0, diff), 0.0))
    ts = jnp.where(~has_parent | (parent_size > 2.0 * target_size), 1.0,
                   t_inner)
    kids = jnp.maximum(jnp.where(has_parent, p_kids, 1), 1).astype(jnp.int32)
    return ts, kids


@functools.partial(jax.jit, static_argnames=("use_frustum",))
def expand_to_size_dynamic(
    nodes: jnp.ndarray,       # [C,6] int32
    pos: jnp.ndarray,         # [C,3]
    max_scale: jnp.ndarray,   # [C]
    alive: jnp.ndarray,       # [C] bool
    viewpoint: jnp.ndarray,   # [3]
    zdir: jnp.ndarray,        # [3] camera forward (world space)
    target_size,
    pcache: Optional[ParentCache] = None,
    *,
    use_frustum: bool = True,
) -> CutResult:
    """Dynamic hierarchy cut + interpolation weights in one pass
    (markNodesForSizeDynamic runtime_switching.cu:533-582 +
    computeTsIndexedDynamic :640-684). With ``pcache`` (built once per tree
    by build_parent_cache) the per-frame cut is fully gather-free."""
    from hlod_gaussians_tpu.ops import gather_rows

    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    has_parent = parent >= 0
    parent_c = jnp.clip(parent, 0, c - 1)

    size = node_size_dynamic(pos, max_scale, viewpoint)
    if pcache is not None:
        p_pos, p_scale = pcache.p_aux
        p_size = node_size_dynamic(p_pos, p_scale, viewpoint)
        p_kids = pcache.p_kids
    else:
        p_size, p_kids = gather_rows(
            [size, nodes[:, NODE_CHILD_COUNT]], parent_c)
    parent_size = jnp.where(has_parent, p_size, jnp.inf)

    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0
    not_skybox = nodes[:, NODE_DEPTH] >= 0

    mask = alive & not_skybox
    if use_frustum:
        mask = mask & in_frustum_crude(pos, viewpoint, zdir)
    sel = (size >= target_size) & is_leaf
    sel = sel | (has_parent & (parent_size >= target_size) & (size < target_size))
    mask = mask & sel

    ts, kids = _ts_kids(has_parent, parent_size, size, target_size, p_kids)
    return CutResult(render_mask=mask, size=size, ts=ts, kids=kids)


@jax.jit
def expand_to_size_box(
    nodes: jnp.ndarray,      # [C,6]
    box_lo: jnp.ndarray, box_hi: jnp.ndarray, max_side: jnp.ndarray,
    alive: jnp.ndarray,
    viewpoint: jnp.ndarray,
    target_size,
    pcache: Optional[ParentCache] = None,
) -> CutResult:
    """Upstream box-metric cut (markNodesForSize runtime_switching.cu:495-529
    + computeTsIndexed :588-637). With ``pcache`` (build_parent_cache_box)
    the per-frame cut is gather-free."""
    from hlod_gaussians_tpu.ops import gather_rows

    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    has_parent = parent >= 0
    parent_c = jnp.clip(parent, 0, c - 1)

    size = node_size_box(box_lo, box_hi, max_side, viewpoint)
    if pcache is not None:
        p_lo, p_hi, p_side = pcache.p_aux
        p_size = node_size_box(p_lo, p_hi, p_side, viewpoint)
        p_kids = pcache.p_kids
    else:
        p_size, p_kids = gather_rows(
            [size, nodes[:, NODE_CHILD_COUNT]], parent_c)
    parent_size = jnp.where(has_parent, p_size, jnp.inf)

    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0
    sel = (size >= target_size) & is_leaf
    sel = sel | (has_parent & (parent_size >= target_size) & (size < target_size))
    # depth >= 0 excludes non-tree rows (skybox/padding), matching the
    # dynamic metric's guard — otherwise a loader that zero-fills node
    # rows would double-render skybox rows (cut + explicit prepend)
    mask = alive & sel & (nodes[:, NODE_DEPTH] >= 0)

    ts, kids = _ts_kids(has_parent, parent_size, size, target_size, p_kids)
    return CutResult(render_mask=mask, size=size, ts=ts, kids=kids)


def node_heights(nodes: jnp.ndarray, alive: jnp.ndarray,
                 max_depth: int = 64) -> jnp.ndarray:
    """Subtree height per node (leaves 0, parent = max(children)+1 — the
    reference's Node.depth semantics, PointbasedKdTreeGenerator.cpp:64).
    Level-synchronous upward scatter-max sweeps; exact for trees up to
    ``max_depth`` deep."""
    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    live = alive & (nodes[:, NODE_DEPTH] >= 0)
    p_safe = jnp.where((parent >= 0) & live, parent, c)
    height = jnp.zeros((c,), jnp.int32)
    for _ in range(max_depth):
        up = jnp.zeros((c,), jnp.int32).at[p_safe].max(height + 1,
                                                       mode="drop")
        height = jnp.maximum(height, up)
    return height


def expand_to_target(nodes: jnp.ndarray, alive: jnp.ndarray,
                     target: int, max_depth: int = 64) -> jnp.ndarray:
    """HEIGHT-target cut (reference expandToTarget, traversal.cpp:16-44):
    descend while the node's subtree height exceeds ``target``; the first
    node at height <= target on each path is selected. target=0 is full
    detail (all leaves); a target >= the root height selects just the
    root. Oracle-anchored against the reference traversal
    (tests/test_oracle_parity.py::test_expand_to_target_matches_oracle).
    Returns a [C] bool mask. (The pre-r05 implementation cut at
    DEPTH-FROM-ROOT == target — the reference semantics is the subtree
    height, which adapts to unbalanced trees.)"""
    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    height = node_heights(nodes, alive, max_depth)
    ph = height[jnp.clip(parent, 0, c - 1)]
    sel = (height <= target) & ((parent < 0) | (ph > target))
    return sel & alive & (nodes[:, NODE_DEPTH] >= 0)


def bounding_sphere_divergence(
    nodes, pos, max_scale, alive, key, n_samples: int = 1024
) -> jnp.ndarray:
    """Monte-Carlo estimate of how much child bounding spheres poke out of
    their parents' (reference compute_bounding_sphere_divergence,
    scene/gaussian_model.py:616-634): sample points on each child sphere
    (radius 3*max_scale) and measure the fraction outside the parent
    sphere. 0 = perfectly nested."""
    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    has_parent = (parent >= 0) & alive & (nodes[:, NODE_DEPTH] >= 0)
    p_idx = jnp.clip(parent, 0, c - 1)

    r_child = 3.0 * max_scale
    r_parent = 3.0 * max_scale[p_idx]
    dirs = jax.random.normal(key, (n_samples, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)

    # sample points on each child sphere: [C, S, 3]
    pts = pos[:, None, :] + r_child[:, None, None] * dirs[None, :, :]
    d_parent = jnp.linalg.norm(pts - pos[p_idx][:, None, :], axis=-1)
    outside = d_parent > r_parent[:, None]
    frac = jnp.where(has_parent, outside.mean(axis=1), 0.0)
    denom = jnp.maximum(jnp.sum(has_parent), 1)
    return jnp.sum(frac) / denom


def sanity_check_hierarchy(nodes: np.ndarray, alive: np.ndarray) -> None:
    """Recursive structural checks (reference sanity_check_hierarchy,
    scene/gaussian_model.py:637-675): single root, child counts in {0,2+},
    parent back-pointers, depth monotonicity, full reachability. Raises
    AssertionError on violation. Host-side numpy."""
    nodes = np.asarray(nodes)
    alive = np.asarray(alive)
    real = alive & (nodes[:, NODE_DEPTH] >= 0)
    roots = np.where(real & (nodes[:, NODE_PARENT] == -1))[0]
    assert len(roots) == 1, f"expected 1 root, got {len(roots)}"
    seen = np.zeros(nodes.shape[0], bool)
    stack = [int(roots[0])]
    while stack:
        i = stack.pop()
        assert not seen[i], f"node {i} reached twice"
        assert real[i], f"node {i} in tree but not alive"
        seen[i] = True
        cc = nodes[i, NODE_CHILD_COUNT]
        if cc > 0:
            c = nodes[i, 3]  # NODE_FIRST_CHILD
            for _ in range(cc):
                assert nodes[c, NODE_PARENT] == i, (i, c)
                assert nodes[c, NODE_DEPTH] > nodes[i, NODE_DEPTH], (i, c)
                stack.append(int(c))
                c = nodes[c, 4]  # NODE_NEXT_SIBLING
    n_real = int(real.sum())
    assert seen.sum() == n_real, f"reachable {seen.sum()} != alive {n_real}"


def is_hierarchy_cut(nodes, mask, alive) -> jnp.ndarray:
    """True iff `mask` selects a proper cut: every alive leaf has EXACTLY one
    selected ancestor-or-self (reference is_hierarchy_cut semantics,
    scene/gaussian_model.py:348-350). Level-synchronous ancestor count."""
    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    count = mask.astype(jnp.int32)
    cur = jnp.arange(c, dtype=jnp.int32)
    max_depth = int(jnp.max(nodes[:, NODE_DEPTH])) if nodes.shape[0] else 0

    for _ in range(max_depth):
        nxt = jnp.where(cur >= 0, parent[jnp.clip(cur, 0, c - 1)], -1)
        count = count + jnp.where(nxt >= 0, mask[jnp.clip(nxt, 0, c - 1)], False
                                  ).astype(jnp.int32)
        cur = nxt

    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0
    relevant = alive & is_leaf & (nodes[:, NODE_DEPTH] >= 0)
    return jnp.all(jnp.where(relevant, count == 1, True))


class InterpTable(NamedTuple):
    """Static child+parent feature table for LOD interpolation, built ONCE
    per (tree, params) update. Row layout: [0:D] child features, [D:2D]
    parent features with the quaternion sign fix PRE-APPLIED (the child/
    parent pairing is static, so `dot(q_c, q_p) < 0` is too). The per-frame
    interpolation is then one wide [2D, M] gather + lerp — no parent-index
    lookup, no sign logic, no per-frame table build (~31 ms -> ~7 ms at a
    384k cut on 1M nodes). D = 11 + 3*sh_k is recovered from the row count
    (a static int field would become a traced pytree leaf under jit)."""
    feats: jnp.ndarray         # [2D, C]


def build_interp_table(params: dict, nodes: jnp.ndarray) -> InterpTable:
    """See InterpTable. `params` are ACTIVATED arrays as in
    interpolate_with_parents."""
    k = params["shs"].shape[1]
    c = params["means3d"].shape[0]
    feats = jnp.concatenate([
        params["means3d"].T,                      # 0:3
        params["scales"].T,                       # 3:6
        params["quats"].T,                        # 6:10
        params["opacities"][None, :],             # 10
        params["shs"].reshape(c, k * 3).T,        # 11:11+3k
    ], axis=0)                                    # [D, C]
    parent = jnp.clip(nodes[:, NODE_PARENT], 0, c - 1)
    pfeats = jax.lax.optimization_barrier(feats[:, parent])
    dots = jnp.sum(feats[6:10] * pfeats[6:10], axis=0, keepdims=True)
    sign = jnp.where(dots < 0, -1.0, 1.0)
    pfeats = pfeats.at[6:10].multiply(sign)
    return InterpTable(feats=jnp.concatenate([feats, pfeats], axis=0))


def interpolate_from_table(table: InterpTable, render_idx: jnp.ndarray,
                           ts: jnp.ndarray) -> dict:
    """Per-frame LOD interpolation via the precomputed InterpTable.
    Bit-identical to interpolate_with_parents for unit-normalized quats
    (the sign fix commutes with the static pairing)."""
    d = table.feats.shape[0] // 2
    k = (d - 11) // 3
    g = jax.lax.optimization_barrier(table.feats[:, render_idx])  # [2D, M]
    t = ts[None, :]
    out = t * g[:d] + (1.0 - t) * g[d:]
    m = render_idx.shape[0]
    return dict(
        means3d=out[0:3].T,
        scales=out[3:6].T,
        quats=out[6:10].T,                        # renderer normalizes
        opacities=out[10],
        shs=out[11:11 + 3 * k].T.reshape(m, k, 3),
    )


def interpolate_all_masked(table: InterpTable, ts: jnp.ndarray,
                           mask: jnp.ndarray) -> dict:
    """LOD-interpolate EVERY node by pure elementwise lerp over the
    InterpTable — no compaction, no gather. Rows outside ``mask`` get t=1
    (pass-through child params) so downstream math stays finite; the
    renderer culls them via its valid mask. A 384k-index feature gather
    costs ~16 ms (latency-bound, and index-sorting does NOT help — measured
    21 ms sorted vs 16 ms random); the full-table lerp is ~3 ms at 1M
    nodes, so for dense cuts the masked path wins outright."""
    d = table.feats.shape[0] // 2
    k = (d - 11) // 3
    t = jnp.where(mask, ts, 1.0)[None, :]
    out = t * table.feats[:d] + (1.0 - t) * table.feats[d:]
    c = table.feats.shape[1]
    return dict(
        means3d=out[0:3].T,
        scales=out[3:6].T,
        quats=out[6:10].T,                        # renderer normalizes
        opacities=out[10],
        shs=out[11:11 + 3 * k].T.reshape(c, k, 3),
    )


def interpolate_with_parents(
    params: dict,              # activated: means3d, scales, quats, opacities, shs
    render_idx: jnp.ndarray,   # [M] node indices (padded)
    parent_idx: jnp.ndarray,   # [M] parent node indices (root: any, t=1)
    ts: jnp.ndarray,           # [M]
) -> dict:
    """Python-interp semantics of render_post
    (gaussian_renderer/__init__.py:304-339): child/parent lerp of mean,
    scale, opacity, SH; rotation lerped after a sign fix (dot < 0 flips the
    parent quaternion). Returns gathered+interpolated arrays of length M.

    All per-node features are packed into one [D, C] table so the child and
    parent lookups are TWO wide 2-D gathers — narrow per-array row gathers
    scalarize on TPU (see ops/binning.py)."""
    k = params["shs"].shape[1]
    c = params["means3d"].shape[0]
    feats = jnp.concatenate([
        params["means3d"].T,                      # 0:3
        params["scales"].T,                       # 3:6
        params["quats"].T,                        # 6:10
        params["opacities"][None, :],             # 10
        params["shs"].reshape(c, k * 3).T,        # 11:11+3k
    ], axis=0)                                    # [11+3k, C]

    g_c = jax.lax.optimization_barrier(feats[:, render_idx])
    g_p = jax.lax.optimization_barrier(feats[:, parent_idx])

    t = ts[None, :]
    q_c, q_p = g_c[6:10], g_p[6:10]
    dots = jnp.sum(q_c * q_p, axis=0, keepdims=True)
    q_p = jnp.where(dots < 0, -q_p, q_p)

    lin_c = jnp.concatenate([g_c[:6], q_c, g_c[10:]], axis=0)
    lin_p = jnp.concatenate([g_p[:6], q_p, g_p[10:]], axis=0)
    out = t * lin_c + (1.0 - t) * lin_p           # [D, M]

    m = render_idx.shape[0]
    return dict(
        means3d=out[0:3].T,
        scales=out[3:6].T,
        quats=out[6:10].T,                        # renderer normalizes
        opacities=out[10],
        shs=out[11:11 + 3 * k].T.reshape(m, k, 3),
    )
