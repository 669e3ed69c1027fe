"""Appearance filter, random cut, sibling weight tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.hierarchy import cut as hc, filter as hf
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_FIRST_CHILD, NODE_NEXT_SIBLING, NODE_PARENT)
from tests.test_mcmc import hier_state


def test_appearance_filter_marks_ancestors():
    st, m = hier_state(n=33, cap=128)
    scales = jnp.exp(st.log_scale)
    vps = np.array([[0, 0, -10.0], [5, 0, -10.0]], np.float32)
    mask = hf.appearance_filter_mask(
        st.nodes, st.xyz, jnp.max(scales, -1), st.alive, vps, 1e-6)
    mask = np.asarray(mask)
    nodes = np.asarray(st.nodes)
    # at ultra-fine granularity every leaf is selected -> whole tree marked
    alive = np.asarray(st.alive)
    assert mask[alive].all()

    # at coarse granularity only the top of the tree survives
    mask_c = np.asarray(hf.appearance_filter_mask(
        st.nodes, st.xyz, jnp.max(scales, -1), st.alive, vps, 0.05))
    assert mask_c.sum() < mask.sum()
    # closed under parents
    for i in np.where(mask_c)[0]:
        p = nodes[i, NODE_PARENT]
        if p >= 0:
            assert mask_c[p], i


def test_random_cut_is_proper():
    st, m = hier_state(n=33, cap=128, seed=2)
    for p in (0.0, 0.5, 1.0):
        mask = hf.random_cut_mask(st.nodes, st.alive,
                                  p, np.random.default_rng(0))
        assert bool(hc.is_hierarchy_cut(st.nodes, jnp.asarray(mask),
                                        st.alive))
    m0 = hf.random_cut_mask(st.nodes, st.alive, 0.0,
                            np.random.default_rng(0))
    m9 = hf.random_cut_mask(st.nodes, st.alive, 1.0,
                            np.random.default_rng(0))
    assert m9.sum() <= m0.sum()


def test_sibling_weights_normalized():
    st, m = hier_state(n=17, cap=64, seed=3)
    w = np.asarray(hf.sibling_weights(st.nodes, st.log_scale,
                                      st.opacity_logit, st.alive))
    nodes = np.asarray(st.nodes)
    interior = np.where((nodes[:, NODE_CHILD_COUNT] == 2)
                        & np.asarray(st.alive))[0]
    for i in interior:
        c0 = nodes[i, NODE_FIRST_CHILD]
        c1 = nodes[c0, NODE_NEXT_SIBLING]
        assert abs(w[c0] + w[c1] - 1.0) < 1e-5, (i, w[c0], w[c1])
        assert 0.0 <= w[c0] <= 1.0
    # root weight is 1
    root = np.where(nodes[:, NODE_PARENT] == -1)[0]
    alive_roots = [r for r in root if st.alive[r]]
    assert all(abs(w[r] - 1.0) < 1e-6 for r in alive_roots)


def test_anchors_roundtrip_and_semantics(tmp_path):
    """anchors.bin interop (appearance_filter.cpp:377-455 +
    scene/gaussian_model.py:1004-1013)."""
    import numpy as np

    from hlod_gaussians_tpu.hierarchy import build as hb, filter as flt

    rng = np.random.default_rng(0)
    n = 32
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    scales = np.exp(rng.uniform(-3.0, -2.0, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    ops = rng.uniform(0.4, 0.9, n).astype(np.float32)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32)
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    c = h.nodes.shape[0]

    vps = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    alive = np.ones(c, bool)
    anchors = flt.compute_anchors(h.nodes, h.pos, h.scale.max(1), alive,
                                  vps, 5e-4)
    assert len(anchors) > 0
    # every leaf is an anchor (below any bottom cut)
    import hlod_gaussians_tpu.models.gaussians as gm
    leaves = np.where(h.nodes[:, gm.NODE_CHILD_COUNT] == 0)[0]
    assert np.isin(leaves, anchors).all()

    path = str(tmp_path / "anchors.bin")
    flt.write_anchors(path, anchors)
    back = flt.read_anchors(path)
    np.testing.assert_array_equal(back, anchors)
    # byte layout: little-endian count prefix
    raw = open(path, "rb").read()
    assert int.from_bytes(raw[:4], "little") == len(anchors)
