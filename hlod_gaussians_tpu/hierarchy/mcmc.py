"""MCMC densification on the hierarchy (3DGS-as-MCMC style).

TPU re-design of the fork's relocation machinery:
  * `compute_relocation` — Eq. (9) of "3D Gaussian Splatting as MCMC"
    (reference hierarchy-rasterizer/cuda_rasterizer/utils.cu:1-51). The CUDA
    kernel's O(n_max^2) binomial double sum collapses via the hockey-stick
    identity  sum_{i=k+1..N} C(i-1,k) = C(N,k+1)  to ONE masked sum over k —
    a closed form the GPU kernel recomputes per thread.
  * `relocate_gs` — dead low-opacity leaves respawn at opacity-sampled alive
    leaves; the dead node's sibling is promoted into the parent (tree
    contraction) and both freed slots become the two children of the respawn
    host (reference scene/gaussian_model.py:1588-1698).
  * `add_new_gs` — grows the model toward `cap_max` by splitting
    opacity-sampled leaves into two relocated copies
    (scene/gaussian_model.py:1700-1767).

Everything runs at a static relocation budget `K` with validity masks so the
whole pass jits; the tree surgery is scatter passes plus a level-synchronous
promotion sweep (bounded by `max_depth`) replacing the reference's
depth-descending Python loop (gaussian_model.py:1643-1664).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu import optim
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import (
    GaussianState, NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD,
    NODE_NEXT_SIBLING, NODE_PARENT)

N_MAX = 51  # reference reloc_utils.py binom table size


def compute_relocation(opacity_old, scale_old, n):
    """New (opacity, scale) for a Gaussian respawned n times (utils.cu:9-36).

    opacity_old [M], scale_old [M,3], n [M] int (>=1).
    Closed form: opacity_new = 1 - (1-o)^(1/n);
    denom = sum_{k=0}^{n-1} C(n,k+1) (-1)^k / sqrt(k+1) * opacity_new^{k+1};
    scale_new = (o / denom) * scale_old.
    """
    n = jnp.clip(n.astype(jnp.float32), 1, N_MAX)
    op_new = 1.0 - jnp.power(jnp.clip(1.0 - opacity_old, 1e-12, 1.0), 1.0 / n)

    k = jnp.arange(N_MAX, dtype=jnp.float32)[None, :]          # [1, n_max]
    # C(n, k+1) via lgamma, masked to k < n
    log_binom = (jax.lax.lgamma(n[:, None] + 1.0)
                 - jax.lax.lgamma(k + 2.0)
                 - jax.lax.lgamma(jnp.maximum(n[:, None] - k, 1.0)))
    binom = jnp.exp(log_binom)
    sign = jnp.where(k % 2 == 0, 1.0, -1.0)
    term = binom * sign / jnp.sqrt(k + 1.0) * jnp.power(
        jnp.maximum(op_new[:, None], 1e-12), k + 1.0)
    denom = jnp.sum(jnp.where(k < n[:, None], term, 0.0), axis=1)

    coeff = opacity_old / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    scale_new = coeff[:, None] * scale_old
    return op_new, scale_new


def _update_params(state: GaussianState, idxs, n):
    """Gather host parameters with MCMC-relocated opacity/scale
    (reference _update_params, gaussian_model.py:1569-1578)."""
    op_old = jax.nn.sigmoid(state.opacity_logit[idxs, 0])
    sc_old = jnp.exp(state.log_scale[idxs])
    op_new, sc_new = compute_relocation(op_old, sc_old, n)
    op_new = jnp.clip(op_new, 0.005, 1.0 - 1e-7)
    return dict(
        xyz=state.xyz[idxs],
        f_dc=state.f_dc[idxs],
        f_rest=state.f_rest[idxs],
        opacity_logit=gm.inverse_sigmoid(op_new)[:, None],
        log_scale=jnp.log(jnp.maximum(sc_new, 1e-12)),
        quat=state.quat[idxs])


def _sample_hosts(key, probs_masked, k2: int):
    """Sample k2 indices ~ probs (categorical, with replacement) and their
    multiplicity per index (reference _sample_alives,
    gaussian_model.py:1580-1586)."""
    c = probs_masked.shape[0]
    logits = jnp.where(probs_masked > 0, jnp.log(jnp.maximum(probs_masked, 1e-20)),
                       -jnp.inf)
    sampled = jax.random.categorical(key, logits, shape=(k2,))
    counts = jax.ops.segment_sum(jnp.ones((k2,), jnp.int32), sampled,
                                 num_segments=c)
    return sampled, counts


def _unique_first(sampled, cap: int, k_out: int):
    """First occurrence of each sampled value in SAMPLING ORDER, compacted
    to k_out (padded with `cap`). Order preservation matters: a sorted
    unique would deterministically favor LOW row indices whenever more
    unique hosts are sampled than dead slots, biasing respawned mass away
    from the opacity-weighted distribution (the reference's multinomial
    keeps draw order)."""
    k2 = sampled.shape[0]
    pos = jnp.arange(k2, dtype=jnp.int32)
    firstpos = jnp.full((cap + 1,), k2, jnp.int32).at[sampled].min(pos)
    is_first = firstpos[sampled] == pos
    key = jnp.where(is_first, pos, k2)
    order = jnp.argsort(key)
    uniq = jnp.where(key[order] < k2, sampled[order], cap)[:k_out]
    return uniq, jnp.sum(is_first)


@functools.partial(jax.jit, static_argnames=("budget", "max_depth"),
                   donate_argnames=("state", "adam"))
def relocate_gs(
    state: GaussianState,
    adam: optim.AdamState,
    key: jax.Array,
    dead_opacity: float = 0.005,
    *,
    budget: int = 4096,
    max_depth: int = 40,
    extra_dead: "jnp.ndarray" = None,
) -> Tuple[GaussianState, optim.AdamState, jnp.ndarray]:
    """Respawn dead leaves at sampled alive leaves with tree contraction
    (reference relocate_gs, gaussian_model.py:1588-1698).

    ``extra_dead`` ([C] bool) extends the low-opacity dead set — the MIP
    respawn of never-visible SPT entries (train_post.py:752-761).

    Processes up to `budget` dead leaves per call. Returns
    (state, adam, n_relocated).
    """
    cap = state.capacity
    nodes = state.nodes
    opacity = jax.nn.sigmoid(state.opacity_logit[:, 0])
    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0
    usable = state.alive & is_leaf & (~state.skybox_mask) & (nodes[:, NODE_DEPTH] >= 0)

    dead = usable & (opacity < dead_opacity)
    if extra_dead is not None:
        dead = dead | (usable & extra_dead)
    # if a node AND its sibling are dead, keep the sibling (second child)
    sib_ptr = jnp.where(dead, nodes[:, NODE_NEXT_SIBLING], cap)
    is_dead_sibling = jnp.zeros((cap,), bool).at[sib_ptr].set(True, mode="drop")
    dead = dead & ~is_dead_sibling

    # sibling of each dead node: next_sibling if first child, else parent's
    # first child
    parent = jnp.clip(nodes[:, NODE_PARENT], 0, cap - 1)
    sib_of = jnp.where(nodes[:, NODE_NEXT_SIBLING] > 0,
                       nodes[:, NODE_NEXT_SIBLING],
                       nodes[parent, NODE_FIRST_CHILD])

    # respawn host candidates: alive leaves that are neither dead nor a
    # sibling of a dead node
    sib_mask = jnp.zeros((cap,), bool).at[
        jnp.where(dead, sib_of, cap)].set(True, mode="drop")
    candidates = usable & ~dead & ~sib_mask

    dead_idx = jnp.nonzero(dead, size=budget, fill_value=cap)[0]
    n_dead = jnp.sum(dead)

    probs = jnp.where(candidates, opacity, 0.0)
    sampled, counts = _sample_hosts(key, probs, 2 * budget)
    hosts, n_hosts = _unique_first(sampled, cap, budget)

    n_reloc = jnp.minimum(jnp.minimum(n_dead, n_hosts), budget)
    # no usable respawn hosts: categorical over all -inf logits returns
    # index 0, which would silently turn row 0 (skybox/root) into an
    # "interior" host — relocate nothing instead
    n_reloc = jnp.where(jnp.sum(probs) > 0.0, n_reloc, 0)
    lane = jnp.arange(budget)
    valid = lane < n_reloc
    d = jnp.where(valid, dead_idx, cap)               # dead slot (child 1)
    h = jnp.where(valid, hosts, cap)                  # respawn host
    d_c = jnp.clip(d, 0, cap - 1)
    h_c = jnp.clip(h, 0, cap - 1)
    s = jnp.where(valid, sib_of[d_c], cap)            # sibling slot (child 2)
    s_c = jnp.clip(s, 0, cap - 1)
    p = jnp.where(valid, nodes[d_c, NODE_PARENT], cap)  # parent slot
    p_c = jnp.clip(p, 0, cap - 1)

    new_p = _update_params(state, h_c, counts[h_c] + 1)

    # 1) promote sibling into parent slot, level-synchronously from the
    #    deepest level up (gaussian_model.py:1643-1664)
    params = state.params()
    nodes2 = nodes
    for depth in range(max_depth, 0, -1):
        at_depth = valid & (nodes2[s_c, NODE_DEPTH] == depth)
        src = jnp.where(at_depth, s, cap)
        dst = jnp.where(at_depth, p, cap)
        src_c = jnp.clip(src, 0, cap - 1)
        for name in ("xyz", "f_dc", "f_rest", "opacity_logit", "log_scale",
                     "quat"):
            params[name] = params[name].at[dst].set(params[name][src_c],
                                                    mode="drop")
        nodes2 = nodes2.at[dst, NODE_CHILD_COUNT].set(
            nodes2[src_c, NODE_CHILD_COUNT], mode="drop")
        nodes2 = nodes2.at[dst, NODE_FIRST_CHILD].set(
            nodes2[src_c, NODE_FIRST_CHILD], mode="drop")
        # re-parent the promoted subtree's children
        fc = jnp.where(at_depth & (nodes2[src_c, NODE_CHILD_COUNT] > 0),
                       nodes2[src_c, NODE_FIRST_CHILD], cap)
        fc_c = jnp.clip(fc, 0, cap - 1)
        nodes2 = nodes2.at[fc, NODE_PARENT].set(dst.astype(jnp.int32),
                                                mode="drop")
        nodes2 = nodes2.at[fc, NODE_DEPTH].set(
            nodes2[jnp.clip(dst, 0, cap - 1), NODE_DEPTH] + 1, mode="drop")
        sc2 = jnp.where(fc < cap, nodes2[fc_c, NODE_NEXT_SIBLING], cap)
        nodes2 = nodes2.at[sc2, NODE_PARENT].set(dst.astype(jnp.int32),
                                                 mode="drop")
        nodes2 = nodes2.at[sc2, NODE_DEPTH].set(
            nodes2[jnp.clip(dst, 0, cap - 1), NODE_DEPTH] + 1, mode="drop")

    # 2) respawned params into BOTH freed slots (dead + sibling)
    for name, val in new_p.items():
        params[name] = params[name].at[d].set(val, mode="drop")
        params[name] = params[name].at[s].set(val, mode="drop")

    # 3) host becomes interior with children (d, s)
    host_depth = nodes2[h_c, NODE_DEPTH]
    nodes2 = nodes2.at[h, NODE_CHILD_COUNT].set(2, mode="drop")
    nodes2 = nodes2.at[h, NODE_FIRST_CHILD].set(d_c.astype(jnp.int32),
                                                mode="drop")
    child_row_d = jnp.stack([
        host_depth + 1, h_c.astype(jnp.int32), jnp.zeros_like(h_c),
        jnp.zeros_like(h_c), s_c.astype(jnp.int32), jnp.zeros_like(h_c)],
        axis=-1)
    child_row_s = jnp.stack([
        host_depth + 1, h_c.astype(jnp.int32), jnp.zeros_like(h_c),
        jnp.zeros_like(h_c), jnp.zeros_like(h_c), jnp.zeros_like(h_c)],
        axis=-1)
    nodes2 = nodes2.at[d].set(child_row_d, mode="drop")
    nodes2 = nodes2.at[s].set(child_row_s, mode="drop")

    # depth repair: the promotion rewires only the DIRECT children of the
    # promoted slot, so a 2+ level subtree keeps stale depths (its root
    # moved up one level). Re-derive every depth from the parent chain —
    # level-synchronous, converges in <= max_depth passes. Runs once per
    # densify interval, so the [cap]-gather passes are amortized.
    par_all = nodes2[:, NODE_PARENT]
    has_par = par_all >= 0
    par_cl = jnp.clip(par_all, 0, cap - 1)
    depth_col = nodes2[:, NODE_DEPTH]
    for _ in range(max_depth):
        depth_col = jnp.where(has_par, depth_col[par_cl] + 1, depth_col)
    nodes2 = nodes2.at[:, NODE_DEPTH].set(depth_col)

    # 4) fresh moments for all touched slots — including the parent slot,
    #    which received the promoted sibling's PARAMETERS and must not
    #    keep Adam moments accumulated for its previous Gaussian
    #    (reference replace_tensors_to_optimizer resets every replaced row)
    touched = jnp.zeros((cap,), bool)
    touched = (touched.at[d].set(True, mode="drop")
               .at[s].set(True, mode="drop")
               .at[p].set(True, mode="drop"))
    adam = optim.zero_rows(adam, touched)

    new_state = dataclasses.replace(state, nodes=nodes2, **params)
    return new_state, adam, n_reloc


@functools.partial(jax.jit, static_argnames=("budget",),
                   donate_argnames=("state", "adam"))
def add_new_gs(
    state: GaussianState,
    adam: optim.AdamState,
    key: jax.Array,
    n_new: jnp.ndarray,          # target number of NEW gaussians (pairs*2)
    *,
    budget: int = 4096,
) -> Tuple[GaussianState, optim.AdamState, jnp.ndarray]:
    """Split opacity-sampled leaves into two relocated children in free
    capacity slots (reference add_new_gs, gaussian_model.py:1700-1767).

    Only hosts sampled EXACTLY once are used (matching the reference's
    `ratio == 1` filter). Returns (state, adam, n_added_pairs)."""
    cap = state.capacity
    nodes = state.nodes
    opacity = jax.nn.sigmoid(state.opacity_logit[:, 0])
    usable = state.alive & (nodes[:, NODE_CHILD_COUNT] == 0) \
        & (~state.skybox_mask) & (nodes[:, NODE_DEPTH] >= 0)

    n_pairs_target = jnp.minimum(n_new // 2, budget)
    probs = jnp.where(usable, opacity, 0.0)
    sampled, counts = _sample_hosts(key, probs, budget)
    # hosts sampled exactly once
    once = counts == 1
    host_mask = jnp.zeros((cap,), bool).at[sampled].set(True, mode="drop") & once
    hosts_all = jnp.nonzero(host_mask, size=budget, fill_value=cap)[0]
    n_hosts = jnp.sum(host_mask)

    # free slots: need 2 per host
    free = ~state.alive
    n_free = jnp.sum(free)
    free_idx = jnp.nonzero(free, size=cap, fill_value=cap)[0].astype(jnp.int32)

    lane = jnp.arange(budget)
    n_sel = jnp.minimum(jnp.minimum(n_hosts, n_pairs_target),
                        n_free // 2)
    valid = lane < n_sel
    h = jnp.where(valid, hosts_all, cap)
    h_c = jnp.clip(h, 0, cap - 1)
    c0 = jnp.where(valid, free_idx[jnp.clip(2 * lane, 0, cap - 1)], cap)
    c1 = jnp.where(valid, free_idx[jnp.clip(2 * lane + 1, 0, cap - 1)], cap)
    c0_c = jnp.clip(c0, 0, cap - 1)
    c1_c = jnp.clip(c1, 0, cap - 1)

    new_p = _update_params(state, h_c, jnp.full((budget,), 2, jnp.int32))

    params = state.params()
    for name, val in new_p.items():
        params[name] = params[name].at[c0].set(val, mode="drop")
        params[name] = params[name].at[c1].set(val, mode="drop")

    host_depth = nodes[h_c, NODE_DEPTH]
    nodes2 = nodes.at[h, NODE_CHILD_COUNT].set(2, mode="drop")
    nodes2 = nodes2.at[h, NODE_FIRST_CHILD].set(c0_c.astype(jnp.int32),
                                                mode="drop")
    row0 = jnp.stack([host_depth + 1, h_c.astype(jnp.int32),
                      jnp.zeros_like(h_c), jnp.zeros_like(h_c),
                      c1_c.astype(jnp.int32), jnp.zeros_like(h_c)], axis=-1)
    row1 = jnp.stack([host_depth + 1, h_c.astype(jnp.int32),
                      jnp.zeros_like(h_c), jnp.zeros_like(h_c),
                      jnp.zeros_like(h_c), jnp.zeros_like(h_c)], axis=-1)
    nodes2 = nodes2.at[c0].set(row0, mode="drop")
    nodes2 = nodes2.at[c1].set(row1, mode="drop")

    alive = state.alive.at[c0].set(True, mode="drop").at[c1].set(True,
                                                                 mode="drop")
    touched = jnp.zeros((cap,), bool)
    touched = touched.at[c0].set(True, mode="drop").at[c1].set(True, mode="drop")
    adam = optim.zero_rows(adam, touched)

    new_state = dataclasses.replace(state, nodes=nodes2, alive=alive, **params)
    return new_state, adam, n_sel
