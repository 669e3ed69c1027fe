"""SPT ("SubPointTree") caches: granularity-indexed flat subtrees for
out-of-core LOD-aware training.

TPU re-design of the fork's SPT machinery (reference
scene/gaussian_model.py:109-345 + runtime_switching.cu:784-994):

* ``build_spt`` — cut the full tree where prod(scales) > root_volume; the
  nodes above the cut become the re-indexed "upper tree"; each cut node
  with >= min_spt_size descendants becomes an SPT: flat arrays
  (gaussian index, min_distance, max_distance) sorted per-SPT by descending
  max_distance. min_distance = sqrt(ellipse_surface(scale)) /
  target_granularity + distance-to-root, clamped by the parent's window
  (gaussian_model.py:184-320). The reference builds these with a Python
  BFS per SPT; here every quantity is a level-synchronous array sweep over
  the whole forest at once.
* ``spt_cut`` — per-view working-set selection: frustum-cull + descend the
  upper tree, then select each visible SPT's entries with
  max_distance > d >= min_distance where d is the camera distance to the
  SPT root. The CUDA kernel binary-searches the sorted arrays
  (runtime_switching.cu:784-856); on TPU a dense masked compare over the
  flat entry arrays is one VPU pass and needs no search at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.hierarchy.cut import frustum_planes, sphere_in_frustum
from hlod_gaussians_tpu.models.gaussians import (
    NODE_AUX, NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD,
    NODE_NEXT_SIBLING, NODE_PARENT)

_FAR = 1e12


class SPTForest(NamedTuple):
    """Flat SPT arrays + re-indexed upper tree (all device arrays)."""

    # flat entries over ALL SPTs
    entry_gid: jnp.ndarray      # [E] int32 global gaussian index
    entry_min: jnp.ndarray      # [E] f32
    entry_max: jnp.ndarray      # [E] f32
    entry_spt: jnp.ndarray      # [E] int32 owning SPT id
    # per-SPT
    spt_root_global: jnp.ndarray  # [S] int32 root's global index
    spt_root_xyz: jnp.ndarray     # [S,3]
    # upper tree (local indexing; AUX column = global index map)
    ut_nodes: jnp.ndarray       # [U,6] int32
    ut_xyz: jnp.ndarray         # [U,3]
    ut_max_scale: jnp.ndarray   # [U] activated max scale
    ut_spt_id: jnp.ndarray      # [U] int32 SPT id for SPT leaves, -1 else
    ut_bound: jnp.ndarray       # [U] bounding radius for frustum culls

    @property
    def n_spts(self) -> int:
        return self.spt_root_global.shape[0]


def _ellipse_min_distance(scales, target_granularity, is_leaf):
    """sqrt(s0*s1 + s0*s2 + s1*s2)/granularity; leaves -> -1e9
    (reference get_min_distance, gaussian_model.py:331-345)."""
    surf = (scales[:, 0] * scales[:, 1] + scales[:, 0] * scales[:, 2]
            + scales[:, 1] * scales[:, 2])
    md = np.sqrt(np.maximum(surf, 0.0)) / target_granularity
    md[is_leaf] = -1e9
    return md


def build_spt(
    nodes: np.ndarray,          # [C,6] int32
    xyz: np.ndarray,            # [C,3]
    scales: np.ndarray,         # [C,3] ACTIVATED (linear)
    alive: np.ndarray,          # [C] bool
    root: int,
    *,
    root_volume: float,
    target_granularity: float,
    min_spt_size: int = 100,
    max_depth: int = 64,
    use_bounding_spheres: bool = True,
) -> SPTForest:
    """Host-side vectorized build (numpy level sweeps, no per-SPT loops).

    ``use_bounding_spheres`` selects exact subtree spheres for the frustum
    bound (build_hierarchical_SPT's use_bounding_spheres,
    gaussian_model.py:184-304); False keeps the node's own 3*max_scale."""
    c = nodes.shape[0]
    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0
    cond = (np.prod(scales, axis=-1) > root_volume) & ~is_leaf & alive

    # descend from root through `cond` nodes: visited = cond-ancestor chain
    parent = nodes[:, NODE_PARENT]
    in_walk = np.zeros(c, bool)      # reached by the walk
    in_walk[root] = True
    for _ in range(max_depth):
        # children of (in_walk & cond) nodes join the walk
        p_ok = np.zeros(c, bool)
        valid_parent = (parent >= 0) & alive
        p_idx = np.clip(parent, 0, c - 1)
        p_ok[valid_parent] = in_walk[p_idx[valid_parent]] \
            & cond[p_idx[valid_parent]]
        new = p_ok & ~in_walk
        if not new.any():
            break
        in_walk |= new

    cut_mask = in_walk & ~cond                 # cut nodes (walked, condition fails)
    upper_interior = in_walk & cond            # stays in the upper tree

    # SPT root of every node: nearest cut ancestor-or-self
    spt_root_of = np.full(c, -1, np.int64)
    spt_root_of[cut_mask] = np.where(cut_mask)[0]
    below = ~in_walk & alive                   # strictly below the cut
    for _ in range(max_depth):
        need = below & (spt_root_of < 0) & (parent >= 0)
        if not need.any():
            break
        spt_root_of[need] = spt_root_of[np.clip(parent[need], 0, c - 1)]

    in_spt = (spt_root_of >= 0) & alive
    # subtree sizes per cut node
    sizes = np.bincount(spt_root_of[in_spt], minlength=c)

    # real SPT roots: cut nodes with children and enough descendants
    spt_root_mask = cut_mask & ~is_leaf & (sizes >= min_spt_size)
    spt_roots = np.where(spt_root_mask)[0]
    n_spt = len(spt_roots)
    spt_id_of_root = np.full(c, -1, np.int64)
    spt_id_of_root[spt_roots] = np.arange(n_spt)

    member = in_spt & spt_root_mask[np.clip(spt_root_of, 0, c - 1)]

    # min/max distance windows, top-down (gaussian_model.py:212-246)
    raw_min = _ellipse_min_distance(scales, target_granularity, is_leaf)
    root_center = np.zeros((c, 3), np.float32)
    root_center[member] = xyz[spt_root_of[member]]
    center_dist = np.linalg.norm(xyz - root_center, axis=-1)

    e_min = np.zeros(c, np.float32)
    e_max = np.zeros(c, np.float32)
    # roots: min = raw_min, max = FAR
    e_min[spt_root_mask] = raw_min[spt_root_mask]
    e_max[spt_root_mask] = _FAR
    done = spt_root_mask.copy()
    for _ in range(max_depth):
        need = member & ~done & done[np.clip(parent, 0, c - 1)] & (parent >= 0)
        if not need.any():
            break
        pm = e_min[np.clip(parent[need], 0, c - 1)]
        mn = raw_min[need] + center_dist[need]
        e_min[need] = np.minimum(mn, pm)
        e_max[need] = pm
        done |= need

    # flat entries sorted by (spt, -max)  [per-SPT descending max]
    members = np.where(member)[0]
    spt_of = spt_id_of_root[spt_root_of[members]]
    order = np.lexsort((-e_max[members], spt_of))
    members = members[order]
    spt_of = spt_of[order]

    # --- upper tree: interior walk nodes + ALL cut nodes; small SPTs'
    # descendants are merged in (gaussian_model.py:262-264)
    small_member = in_spt & ~member
    ut_mask = upper_interior | cut_mask | small_member
    ut_global = np.sort(np.where(ut_mask)[0])
    u = len(ut_global)
    local = np.full(c, -1, np.int64)
    local[ut_global] = np.arange(u)

    ut_nodes = nodes[ut_global].copy()
    ut_nodes[:, NODE_AUX] = ut_global.astype(np.int32)
    # remap parent / first_child / next_sibling into local indices
    p = ut_nodes[:, NODE_PARENT]
    ut_nodes[:, NODE_PARENT] = np.where(p >= 0, local[np.clip(p, 0, c - 1)], -1)
    ut_nodes[local[np.clip(root, 0, c - 1)], NODE_PARENT] = -1

    is_spt_leaf = spt_root_mask[ut_global]
    fc = ut_nodes[:, NODE_FIRST_CHILD]
    fc_mapped = np.where(fc > 0, local[np.clip(fc, 0, c - 1)], -1)
    ut_nodes[:, NODE_FIRST_CHILD] = fc_mapped.astype(np.int32)
    ut_nodes[:, NODE_CHILD_COUNT] = np.where(
        is_spt_leaf | (fc_mapped < 0), 0, ut_nodes[:, NODE_CHILD_COUNT])
    ns = ut_nodes[:, NODE_NEXT_SIBLING]
    ut_nodes[:, NODE_NEXT_SIBLING] = np.where(
        ns > 0, local[np.clip(ns, 0, c - 1)], 0).astype(np.int32)

    ut_spt_id = np.where(is_spt_leaf,
                         spt_id_of_root[ut_global], -1).astype(np.int32)

    ut_max_scale = scales[ut_global].max(-1)
    # bounding radius: own 3*max_scale; SPT leaves take the subtree sphere
    bound = 3.0 * ut_max_scale.copy()
    if n_spt and use_bounding_spheres:
        # radius of each SPT = max over members of center_dist + 3*max_scale
        reach = center_dist + 3.0 * scales.max(-1)
        spt_reach = np.zeros(n_spt, np.float32)
        np.maximum.at(spt_reach, spt_id_of_root[spt_root_of[member.nonzero()[0]]],
                      reach[member])
        bound[is_spt_leaf] = np.maximum(bound[is_spt_leaf],
                                        spt_reach[ut_spt_id[is_spt_leaf]])
    # upward propagation (gaussian_model.py:300-318)
    utp = ut_nodes[:, NODE_PARENT]
    for _ in range(max_depth if use_bounding_spheres else 0):
        valid = utp >= 0
        if not valid.any():
            break
        d = np.linalg.norm(xyz[ut_global] - xyz[ut_global[np.clip(utp, 0, u - 1)]],
                           axis=-1)
        cand = np.zeros(u, np.float32)
        np.maximum.at(cand, np.clip(utp, 0, u - 1),
                      np.where(valid, bound + d, 0.0))
        grew = cand > bound
        if not grew.any():
            break
        bound = np.maximum(bound, cand)

    return SPTForest(
        entry_gid=jnp.asarray(members.astype(np.int32)),
        entry_min=jnp.asarray(e_min[members].astype(np.float32)),
        entry_max=jnp.asarray(e_max[members].astype(np.float32)),
        entry_spt=jnp.asarray(spt_of.astype(np.int32)),
        spt_root_global=jnp.asarray(spt_roots.astype(np.int32)),
        spt_root_xyz=jnp.asarray(xyz[spt_roots].astype(np.float32)),
        ut_nodes=jnp.asarray(ut_nodes.astype(np.int32)),
        ut_xyz=jnp.asarray(xyz[ut_global].astype(np.float32)),
        ut_max_scale=jnp.asarray(ut_max_scale.astype(np.float32)),
        ut_spt_id=jnp.asarray(ut_spt_id),
        ut_bound=jnp.asarray(bound.astype(np.float32)),
    )


class SPTCut(NamedTuple):
    gaussian_mask: jnp.ndarray   # [C] bool — global working-set mask
    spt_selected: jnp.ndarray    # [S] bool
    spt_distance: jnp.ndarray    # [S] f32 camera distance per SPT
    n_selected: jnp.ndarray      # scalar int32 — |working set|


@functools.partial(jax.jit, static_argnames=("use_frustum",))
def spt_cut(
    forest: SPTForest,
    capacity_mask_shape: jnp.ndarray,   # [C]-shaped array (for size only)
    campos: jnp.ndarray,                # [3]
    full_proj: jnp.ndarray,             # [4,4]
    distance_multiplier: jnp.ndarray = 1.0,
    use_frustum: bool = True,
) -> SPTCut:
    """Per-view working set (reference get_SPT_cut, gaussian_model.py:109-181
    + getSPTCut runtime_switching.cu:878-994), as dense masked selects."""
    c = capacity_mask_shape.shape[0]
    u = forest.ut_nodes.shape[0]

    planes = frustum_planes(full_proj)
    visible = sphere_in_frustum(forest.ut_xyz, forest.ut_bound, planes)
    if not use_frustum:
        visible = jnp.ones((u,), bool)

    # the reference's coarse LOD condition is currently disabled
    # (gaussian_model.py:125 overrides it with all-true), so the coarse cut
    # = all frustum-visible upper-tree leaves; interior nodes contribute
    # their subtree only through their leaves.
    is_ut_leaf = forest.ut_nodes[:, NODE_CHILD_COUNT] == 0
    cut_leaf = visible & is_ut_leaf

    # non-SPT leaves render directly (their global index)
    plain_leaf = cut_leaf & (forest.ut_spt_id < 0)
    plain_global = jnp.where(plain_leaf, forest.ut_nodes[:, NODE_AUX], c)
    mask = jnp.zeros((c,), bool).at[plain_global].set(True, mode="drop")

    # selected SPTs + camera distances to their roots
    s = forest.n_spts
    spt_sel = jnp.zeros((s,), bool).at[
        jnp.where(cut_leaf & (forest.ut_spt_id >= 0), forest.ut_spt_id, s)
    ].set(True, mode="drop")
    dist = jnp.linalg.norm(forest.spt_root_xyz - campos, axis=-1)
    dist = dist * distance_multiplier

    # dense entry selection: max > d AND min < d for the owning SPT.
    # per-SPT lookups via one stacked 2-D gather; the [C] mask scatter keeps
    # a leading unit row for the fast scatter path (see ops/binning.py).
    from hlod_gaussians_tpu.ops import gather_rows
    d_e, sel_f = gather_rows([dist, spt_sel.astype(jnp.float32)],
                             forest.entry_spt)
    sel_e = ((sel_f > 0.5)
             & (forest.entry_max > d_e) & (forest.entry_min < d_e))
    mask = mask[None].at[:, jnp.where(sel_e, forest.entry_gid, c)].set(
        True, mode="drop")[0]

    return SPTCut(gaussian_mask=mask, spt_selected=spt_sel,
                  spt_distance=dist, n_selected=jnp.sum(mask))


@functools.partial(jax.jit, static_argnames=("use_frustum",))
def spt_cut_cached(
    forest: SPTForest,
    capacity_mask_shape: jnp.ndarray,
    campos: jnp.ndarray,
    full_proj: jnp.ndarray,
    prev_selected: jnp.ndarray,     # [S] bool — previous view's SPT set
    prev_distance: jnp.ndarray,     # [S] f32 — distances the prev cut used
    rtol,                           # PostConfig.reuse_spt_tolerance
    distance_multiplier: jnp.ndarray = 1.0,
    use_frustum: bool = True,
) -> SPTCut:
    """spt_cut with the fork's SPT-cache reuse rule (train_post.py:362-394,
    Reuse_SPT_Tolerance): an SPT selected in BOTH consecutive views whose
    camera distance moved less than `rtol` relative KEEPS the previous
    view's cut distance — its working-set rows stay bit-identical, so an
    out-of-core cache pages only the true delta. The returned
    spt_distance is the EFFECTIVE (possibly stale) distance to feed back
    as prev_distance."""
    base = spt_cut(forest, capacity_mask_shape, campos, full_proj,
                   distance_multiplier, use_frustum=use_frustum)
    c = capacity_mask_shape.shape[0]
    new_dist = base.spt_distance
    lo = prev_distance * rtol
    hi = prev_distance / jnp.maximum(rtol, 1e-6)
    reuse = (prev_selected & base.spt_selected
             & (new_dist >= lo) & (new_dist <= hi))
    eff = jnp.where(reuse, prev_distance, new_dist)

    # re-derive the entry selection at the effective distances
    from hlod_gaussians_tpu.ops import gather_rows
    d_e, sel_f = gather_rows(
        [eff, base.spt_selected.astype(jnp.float32)], forest.entry_spt)
    sel_e = ((sel_f > 0.5)
             & (forest.entry_max > d_e) & (forest.entry_min < d_e))
    # plain (non-SPT) leaves are distance-independent: recover them from the
    # base mask by clearing every SPT-owned row first
    mask = base.gaussian_mask
    mask = mask[None].at[:, forest.entry_gid].set(False)[0]
    mask = mask[None].at[:, jnp.where(sel_e, forest.entry_gid, c)].set(
        True, mode="drop")[0]
    return SPTCut(gaussian_mask=mask, spt_selected=base.spt_selected,
                  spt_distance=eff, n_selected=jnp.sum(mask))


@functools.partial(jax.jit, static_argnames=("use_frustum", "retries"))
def spt_cut_budgeted(
    forest: SPTForest,
    capacity_mask_shape: jnp.ndarray,
    campos: jnp.ndarray,
    full_proj: jnp.ndarray,
    budget,
    base_multiplier: jnp.ndarray = 1.0,
    grow: float = 1.5,
    use_frustum: bool = True,
    retries: int = 3,
) -> "SPTCut":
    """spt_cut with the over-budget fallback INSIDE the jit.

    The reference re-cuts with distance_multiplier *= 1.5 until the working
    set fits (train_post.py:324-430) — a device->host sync per view. Here
    the candidate multipliers (base * grow^k) are evaluated in one program
    and the smallest one under budget wins, so the training loop never
    syncs on the cut size. Returns the chosen cut (its spt_distance already
    includes the winning multiplier).

    If even base * grow^(retries-1) exceeds the budget the LAST candidate
    is returned still over budget — compare the result's n_selected to the
    budget before truncating it to a fixed-size index list (the dense-mask
    training path in pipeline/full_train.py needs no truncation, so an
    over-budget cut there only costs memory, matching the reference's
    unbounded retry loop in spirit).
    """
    cuts = [spt_cut(forest, capacity_mask_shape, campos, full_proj,
                    distance_multiplier=base_multiplier * (grow ** k),
                    use_frustum=use_frustum)
            for k in range(retries)]
    best = cuts[-1]
    for cut in reversed(cuts[:-1]):
        ok = cut.n_selected <= budget
        best = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), cut, best)
    return best


@jax.jit
def mip_respawn_mask(forest: SPTForest, capacity_mask_shape: jnp.ndarray,
                     camera_positions: jnp.ndarray) -> jnp.ndarray:
    """[C] bool: SPT entries too fine to EVER be selected from any training
    camera (reference Use_MIP_respawn, train_post.py:752-761): an entry is
    unreachable when its max-distance window lies below the closest camera's
    distance to its SPT root — it will never enter a working set, so its
    capacity is better spent elsewhere (relocate_gs extra_dead)."""
    c = capacity_mask_shape.shape[0]
    # [S] closest-camera distance per SPT root
    d = jnp.linalg.norm(forest.spt_root_xyz[:, None, :]
                        - camera_positions[None, :, :], axis=-1)
    min_d = jnp.min(d, axis=1)
    from hlod_gaussians_tpu.ops import gather_rows
    (d_e,) = gather_rows([min_d], forest.entry_spt)
    never = forest.entry_max < d_e
    return jnp.zeros((c,), bool)[None].at[
        :, jnp.where(never, forest.entry_gid, c)].max(
        never[None], mode="drop")[0]
