"""MCMC densification tests: relocation formula parity with the CUDA
reference math, tree invariants after relocate_gs / add_new_gs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import optim
from hlod_gaussians_tpu.hierarchy import build as hb, mcmc
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)
from tests.test_hierarchy_build import random_gaussians


def reference_relocation(opacity_old, scale_old, n, n_max=51):
    """Direct double-loop port of the CUDA kernel (utils.cu:9-36)."""
    from math import comb, sqrt
    out_o = np.empty_like(opacity_old)
    out_s = np.empty_like(scale_old)
    for i, (o, s, nn) in enumerate(zip(opacity_old, scale_old, n)):
        o_new = 1.0 - (1.0 - o) ** (1.0 / nn)
        denom = 0.0
        for ii in range(1, nn + 1):
            for k in range(ii):
                denom += comb(ii - 1, k) * ((-1) ** k / sqrt(k + 1)) \
                    * o_new ** (k + 1)
        out_o[i] = o_new
        out_s[i] = (o / denom) * s
    return out_o, out_s


def test_compute_relocation_matches_cuda_math():
    rng = np.random.default_rng(0)
    m = 32
    op = rng.uniform(0.01, 0.98, m).astype(np.float64)
    sc = rng.uniform(0.01, 2.0, (m, 3)).astype(np.float64)
    n = rng.integers(1, 10, m)

    ref_o, ref_s = reference_relocation(op, sc, n)
    got_o, got_s = mcmc.compute_relocation(
        jnp.asarray(op, jnp.float32), jnp.asarray(sc, jnp.float32),
        jnp.asarray(n, jnp.int32))
    np.testing.assert_allclose(np.asarray(got_o), ref_o, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=2e-3)


def hier_state(n=33, cap=256, seed=0):
    """GaussianState carrying a built hierarchy."""
    args = random_gaussians(n, seed=seed)
    h = hb.build_hierarchy(*args)
    m = h.nodes.shape[0]
    st = gm.empty_state(cap, sh_degree=0)
    st = dataclasses.replace(
        st,
        xyz=st.xyz.at[:m].set(jnp.asarray(h.pos)),
        log_scale=st.log_scale.at[:m].set(jnp.asarray(np.log(h.scale))),
        quat=st.quat.at[:m].set(jnp.asarray(h.quat)),
        opacity_logit=st.opacity_logit.at[:m].set(
            gm.inverse_sigmoid(jnp.asarray(np.clip(h.opacity, 0.01, 0.99))
                               )[:, None]),
        f_dc=st.f_dc.at[:m].set(jnp.asarray(h.sh[:, :1])),
        alive=st.alive.at[:m].set(True),
        nodes=st.nodes.at[:m].set(jnp.asarray(h.nodes)))
    return st, m


def check_invariants(state):
    nodes = np.asarray(state.nodes)
    alive = np.asarray(state.alive)
    for i in np.where(alive)[0]:
        cc = nodes[i, NODE_CHILD_COUNT]
        if cc == 2:
            c0 = nodes[i, NODE_FIRST_CHILD]
            c1 = nodes[c0, NODE_NEXT_SIBLING]
            assert alive[c0] and alive[c1], i
            assert nodes[c0, NODE_PARENT] == i, (i, c0)
            assert nodes[c1, NODE_PARENT] == i, (i, c1)
        p = nodes[i, NODE_PARENT]
        if p >= 0:
            assert alive[p], (i, p)
            assert nodes[p, NODE_CHILD_COUNT] == 2


def test_relocate_gs_respawns_dead():
    st, m = hier_state()
    # kill a few leaves (low opacity)
    nodes = np.asarray(st.nodes)
    leaves = np.where((nodes[:, NODE_CHILD_COUNT] == 0)
                      & np.asarray(st.alive))[0]
    kill = leaves[:3]
    logit = np.array(st.opacity_logit)
    logit[kill] = float(gm.inverse_sigmoid(jnp.float32(0.001)))
    st = dataclasses.replace(st, opacity_logit=jnp.asarray(logit))

    adam = optim.init_adam(st.params())
    n_alive_before = int(jnp.sum(st.alive))
    st2, adam2, n_reloc = mcmc.relocate_gs(
        st, adam, jax.random.PRNGKey(0), budget=64, max_depth=12)
    assert int(n_reloc) > 0
    # relocation preserves the number of alive gaussians (slot recycling)
    assert int(jnp.sum(st2.alive)) == n_alive_before
    check_invariants(st2)
    # no leaf below the dead threshold among relocated slots' hosts
    op = np.asarray(jax.nn.sigmoid(st2.opacity_logit[:, 0]))
    nodes2 = np.asarray(st2.nodes)
    relocated_leaves = (nodes2[:, NODE_CHILD_COUNT] == 0) & np.asarray(st2.alive)
    # the killed slots were re-seeded with opacity >= 0.005
    assert (op[kill] >= 0.004).all()


def test_relocate_noop_when_no_dead():
    st, m = hier_state(seed=3)
    adam = optim.init_adam(st.params())
    # relocate_gs donates its inputs — snapshot before the call
    xyz_before = np.array(st.xyz)
    nodes_before = np.array(st.nodes)
    st2, _, n_reloc = mcmc.relocate_gs(st, adam, jax.random.PRNGKey(1),
                                       budget=32, max_depth=12)
    assert int(n_reloc) == 0
    np.testing.assert_array_equal(np.asarray(st2.xyz), xyz_before)
    np.testing.assert_array_equal(np.asarray(st2.nodes), nodes_before)


def test_add_new_gs_grows_leaves():
    st, m = hier_state(cap=512)
    adam = optim.init_adam(st.params())
    n_before = int(jnp.sum(st.alive))
    # add_new_gs donates its inputs — snapshot before the call
    nodes_before = np.array(st.nodes)
    logit_before = np.array(st.opacity_logit)
    st2, adam2, n_pairs = mcmc.add_new_gs(
        st, adam, jax.random.PRNGKey(2), jnp.int32(16), budget=32)
    n_after = int(jnp.sum(st2.alive))
    assert int(n_pairs) > 0
    assert n_after == n_before + 2 * int(n_pairs)
    check_invariants(st2)
    # children carry relocated opacity (host split into 2 -> 1-(1-o)^(1/2))
    nodes2 = np.asarray(st2.nodes)
    hosts = np.where((nodes2[:, NODE_CHILD_COUNT] == 2)
                     & (nodes_before[:, NODE_CHILD_COUNT] == 0))[0]
    assert len(hosts) == int(n_pairs)
    for h in hosts[:4]:
        c0 = nodes2[h, NODE_FIRST_CHILD]
        o_host = 1.0 / (1.0 + np.exp(-logit_before[h, 0]))
        o_child = float(jax.nn.sigmoid(st2.opacity_logit[c0, 0]))
        expect = max(1.0 - (1.0 - o_host) ** 0.5, 0.005)
        assert abs(o_child - expect) < 1e-3, (o_child, expect)


def test_add_new_gs_respects_capacity():
    st, m = hier_state(cap=m_cap(69))
    adam = optim.init_adam(st.params())
    free = int(st.capacity - jnp.sum(st.alive))
    st2, _, n_pairs = mcmc.add_new_gs(st, adam, jax.random.PRNGKey(3),
                                      jnp.int32(1000), budget=256)
    assert int(n_pairs) <= free // 2
    assert int(jnp.sum(st2.alive)) <= st.capacity


def m_cap(n):
    return n


def test_relocate_repairs_subtree_depths():
    """Promoting an interior sibling pulls its WHOLE subtree up one level;
    every stored depth must satisfy depth(child) == depth(parent) + 1
    afterwards. kd-built trees pair leaves with height-<=1 siblings, so the
    stale-grandchild case (which accumulates over repeated relocations in
    training) is constructed by hand: kill leaf 1 whose sibling 2 carries a
    3-level subtree."""
    cap = 64
    st = gm.empty_state(cap, sh_degree=0)
    #            depth parent cc  fc  nsib side
    rows = np.array([
        [0,  -1, 2, 1, 0, 0],    # 0 root
        [1,   0, 0, 0, 2, 0],    # 1 leaf to kill
        [2,   0, 2, 3, 0, 0],    # 2 sibling S (interior)  [stored depth 2
                                 #   is deliberately 1 too deep? no: S is a
                                 #   child of root -> depth 1]
        [2,   2, 2, 5, 4, 0],    # 3 S.child (interior)
        [2,   2, 0, 0, 0, 0],    # 4 S.child leaf
        [3,   3, 0, 0, 6, 0],    # 5 grandchild leaf
        [3,   3, 0, 0, 0, 0],    # 6 grandchild leaf
        [1,   0, 0, 0, 0, 0],    # unused
    ], np.int32)
    rows[2, 0] = 1               # S depth = 1 (child of root)
    nodes = np.full((cap, 6), -1, np.int32)
    nodes[: rows.shape[0]] = rows
    alive = np.zeros(cap, bool)
    alive[:7] = True
    rng = np.random.default_rng(0)
    st = dataclasses.replace(
        st,
        nodes=jnp.asarray(nodes),
        alive=jnp.asarray(alive),
        xyz=jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32)),
        log_scale=jnp.full((cap, 3), -2.0),
        quat=jnp.zeros((cap, 4)).at[:, 0].set(1.0),
        opacity_logit=jnp.full((cap, 1), 2.0))
    # kill leaf 1
    st = dataclasses.replace(
        st, opacity_logit=st.opacity_logit.at[1, 0].set(
            float(gm.inverse_sigmoid(jnp.float32(0.001)))))
    adam = optim.init_adam(st.params())
    st2, _, n_reloc = mcmc.relocate_gs(
        st, adam, jax.random.PRNGKey(2), budget=8, max_depth=12)
    assert int(n_reloc) == 1
    nodes2 = np.asarray(st2.nodes)
    alive2 = np.asarray(st2.alive)
    for i in np.where(alive2)[0]:
        p = nodes2[i, NODE_PARENT]
        if p >= 0 and nodes2[i, NODE_DEPTH] >= 0:
            assert nodes2[i, NODE_DEPTH] == nodes2[p, NODE_DEPTH] + 1, \
                (i, p, nodes2[i, NODE_DEPTH], nodes2[p, NODE_DEPTH])


def test_relocate_no_candidates_is_noop():
    """All-dead candidate set: categorical over -inf logits returns row 0;
    relocate_gs must not corrupt row 0 (skybox/root) — it relocates 0."""
    st, m = hier_state(n=9, seed=2)
    nodes = np.asarray(st.nodes)
    alive = np.asarray(st.alive)
    leaves = (nodes[:, NODE_CHILD_COUNT] == 0) & alive
    logit = np.array(st.opacity_logit)
    logit[leaves] = float(gm.inverse_sigmoid(jnp.float32(0.001)))
    st = dataclasses.replace(st, opacity_logit=jnp.asarray(logit))
    adam = optim.init_adam(st.params())
    nodes_before = np.array(st.nodes)
    st2, _, n_reloc = mcmc.relocate_gs(
        st, adam, jax.random.PRNGKey(0), budget=64, max_depth=12)
    assert int(n_reloc) == 0
    np.testing.assert_array_equal(np.asarray(st2.nodes), nodes_before)
