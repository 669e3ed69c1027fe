"""Viewer runtime maintenance: incremental cuts converge to the full cut,
stay proper, and the row cache transfers only deltas
(runtime_switching.cu:236-491 + runtime_maintenance.cu:39-387 semantics)."""

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.hierarchy import build as hb
from hlod_gaussians_tpu.hierarchy.cut import (expand_to_size_dynamic,
                                              is_hierarchy_cut)
from hlod_gaussians_tpu.viewer import maintenance as maint


def tree(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    scales = np.exp(rng.uniform(-3.0, -2.0, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    ops = rng.uniform(0.3, 0.9, n).astype(np.float32)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32)
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    return h


def test_incremental_converges_to_full_cut():
    h = tree()
    nodes = jnp.asarray(h.nodes)
    pos = jnp.asarray(h.pos)
    ms = jnp.asarray(h.scale.max(axis=1))
    c = nodes.shape[0]
    alive = jnp.ones((c,), bool)
    vp = jnp.zeros(3)

    for target in (1e-6, 3e-4, 3e-3):
        active = jnp.asarray(maint.initial_cut(h.nodes, np.ones(c, bool)))
        for k in range(40):
            assert bool(is_hierarchy_cut(nodes, active, alive)), \
                f"step {k} broke the cut (target {target})"
            active, n_s, n_c = maint.incremental_cut_step(
                nodes, pos, ms, alive, active, vp, target)
            if int(n_s) + int(n_c) == 0:
                break
        full = expand_to_size_dynamic(
            nodes, pos, ms, alive, vp, jnp.asarray([0.0, 0.0, 1.0]), target,
            use_frustum=False)
        np.testing.assert_array_equal(np.asarray(active),
                                      np.asarray(full.render_mask),
                                      err_msg=f"target {target}")


def test_incremental_tracks_camera_with_small_deltas():
    h = tree(n=128, seed=2)
    nodes = jnp.asarray(h.nodes)
    pos = jnp.asarray(h.pos)
    ms = jnp.asarray(h.scale.max(axis=1))
    c = nodes.shape[0]
    alive = jnp.ones((c,), bool)
    target = 5e-4

    active = jnp.asarray(maint.initial_cut(h.nodes, np.ones(c, bool)))
    vp = jnp.zeros(3)
    for _ in range(40):
        active, n_s, n_c = maint.incremental_cut_step(
            nodes, pos, ms, alive, active, vp, target)
        if int(n_s) + int(n_c) == 0:
            break
    # small camera step -> small cut change
    before = np.asarray(active).copy()
    vp2 = jnp.asarray([0.05, 0.0, 0.0])
    for _ in range(40):
        active, n_s, n_c = maint.incremental_cut_step(
            nodes, pos, ms, alive, active, vp2, target)
        if int(n_s) + int(n_c) == 0:
            break
    delta = int(np.sum(before != np.asarray(active)))
    assert delta < before.sum() * 0.5, (delta, int(before.sum()))


def test_active_row_cache_delta_transfers():
    cap = 64
    rng = np.random.default_rng(0)
    host = {"xyz": rng.normal(size=(cap, 3)).astype(np.float32),
            "opacity": rng.random((cap, 1)).astype(np.float32)}
    cache = maint.ActiveRowCache(host, budget=32)

    m1 = np.zeros(cap, bool)
    m1[:10] = True
    f, e = cache.update(m1)
    assert (f, e) == (10, 0)
    # same set again: zero traffic
    f, e = cache.update(m1)
    assert (f, e) == (0, 0)
    # shift by 3: only the delta moves
    m2 = np.zeros(cap, bool)
    m2[3:13] = True
    f, e = cache.update(m2)
    assert (f, e) == (3, 3)
    # device rows hold the right data
    rows = cache.slot_rows()
    dev = np.asarray(cache.device_rows()["xyz"])
    for s, r in enumerate(rows):
        if r >= 0:
            np.testing.assert_array_equal(dev[s], host["xyz"][r])
    # budget overflow raises
    m3 = np.zeros(cap, bool)
    m3[:33] = True
    try:
        cache.update(m3)
        assert False, "expected budget overflow"
    except RuntimeError:
        pass


def test_budget_controller():
    ctrl = maint.BudgetController(budget=100, target=1e-3)
    t1 = ctrl.update(95)          # over high water -> coarsen
    assert t1 > 1e-3
    for _ in range(5):
        t2 = ctrl.update(10)      # under low water -> refine
    assert t2 < t1


def test_incremental_coarsening_keeps_proper_cut():
    """Target INCREASE (camera zooms out / budget coarsens): simultaneous
    collapses at different levels must not activate an ancestor while a
    deeper descendant stays in the cut (double-rendered subtree)."""
    h = tree(n=97, seed=5)
    nodes = jnp.asarray(h.nodes)
    pos = jnp.asarray(h.pos)
    ms = jnp.asarray(h.scale.max(axis=1))
    c = nodes.shape[0]
    alive = jnp.ones((c,), bool)
    vp = jnp.zeros(3)

    # refine to a fine cut first
    active = jnp.asarray(maint.initial_cut(h.nodes, np.ones(c, bool)))
    for _ in range(40):
        active, n_s, n_c = maint.incremental_cut_step(
            nodes, pos, ms, alive, active, vp, 1e-6)
        if int(n_s) + int(n_c) == 0:
            break
    assert bool(is_hierarchy_cut(nodes, active, alive))

    # big coarsening jump (but below the root's projected size — at or
    # above it the reference renders NOTHING, markNodesForSizeDynamic's
    # `else if (node.parent >= 0)` guard, and the incremental cut instead
    # bottoms out at {root}): every step must stay a proper cut
    from hlod_gaussians_tpu.hierarchy.cut import node_size_dynamic
    root = int(np.where(np.asarray(nodes)[:, 1] == -1)[0][0])
    coarse = 0.9 * float(node_size_dynamic(pos, ms, vp)[root])
    for k in range(40):
        active, n_s, n_c = maint.incremental_cut_step(
            nodes, pos, ms, alive, active, vp, coarse)
        assert bool(is_hierarchy_cut(nodes, active, alive)), f"step {k}"
        if int(n_s) + int(n_c) == 0:
            break
    full = expand_to_size_dynamic(
        nodes, pos, ms, alive, vp, jnp.asarray([0.0, 0.0, 1.0]), coarse,
        use_frustum=False)
    np.testing.assert_array_equal(np.asarray(active),
                                  np.asarray(full.render_mask))
