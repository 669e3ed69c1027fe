"""Debug renders, depth-target cut, sanity checker, CLI create-hierarchy."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import debug as debug_mod
from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.hierarchy import cut as hc
from hlod_gaussians_tpu.models.gaussians import NODE_CHILD_COUNT, NODE_PARENT
from hlod_gaussians_tpu.utils.camera import make_camera
from tests.test_mcmc import hier_state

CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)


def test_expand_to_target_levels():
    """Reference expandToTarget semantics (r05 fix): HEIGHT cut — target 0
    is full detail (all leaves), a target >= root height is just the
    root."""
    st, m = hier_state(n=33, cap=128)
    nodes = np.asarray(st.nodes)
    for d in range(0, 7):
        mask = np.asarray(hc.expand_to_target(st.nodes, st.alive, d))
        assert bool(hc.is_hierarchy_cut(st.nodes, jnp.asarray(mask), st.alive))
    alive = np.asarray(st.alive)
    leaves = (nodes[:, NODE_CHILD_COUNT] == 0) & alive
    m0 = np.asarray(hc.expand_to_target(st.nodes, st.alive, 0))
    np.testing.assert_array_equal(m0, leaves)
    mtop = np.asarray(hc.expand_to_target(st.nodes, st.alive, 63))
    root = np.where((nodes[:, NODE_PARENT] == -1) & alive)[0]
    assert mtop.sum() == 1 and mtop[root[0]]
    # cut size shrinks monotonically with the target
    sizes = [int(np.asarray(hc.expand_to_target(st.nodes, st.alive, d)).sum())
             for d in range(0, 8)]
    assert all(a >= b for a, b in zip(sizes, sizes[1:])), sizes


def test_sanity_checker_accepts_and_rejects():
    st, m = hier_state(n=17, cap=64)
    hc.sanity_check_hierarchy(st.nodes, st.alive)

    bad = np.array(st.nodes)
    kid = np.where(bad[:, NODE_PARENT] >= 0)[0][0]
    bad[kid, NODE_PARENT] = kid  # corrupt a back-pointer
    try:
        hc.sanity_check_hierarchy(jnp.asarray(bad), st.alive)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_bounding_sphere_divergence_nested_vs_not():
    st, m = hier_state(n=17, cap=64)
    act_scale = jnp.exp(st.log_scale)
    div = hc.bounding_sphere_divergence(
        st.nodes, st.xyz, jnp.max(act_scale, axis=-1), st.alive,
        jax.random.PRNGKey(0), n_samples=256)
    assert 0.0 <= float(div) <= 1.0


def test_debug_renders():
    st, m = hier_state(n=33, cap=128, seed=1)
    cam = make_camera(np.eye(3), np.asarray([0, 0, 20.0]), 0.9, 0.9, 32, 32)
    # reference expandToTarget semantics (r05): target 0 = all leaves,
    # big target = root only
    n_leaves = int(((np.asarray(st.nodes)[:, NODE_CHILD_COUNT] == 0)
                    & np.asarray(st.alive)).sum())
    img, n0 = debug_mod.render_depth_slice(st, cam, 0, cfg=CFG, k_max=64)
    assert img.shape == (3, 32, 32) and n0 == n_leaves
    img2, n2 = debug_mod.render_depth_slice(st, cam, 63, cfg=CFG, k_max=64)
    assert n2 == 1

    counts = debug_mod.gaussians_per_limit(
        st, [0, 0, -20.0], [0, 0, 1.0], [1e-9, 0.01, 0.1])
    assert counts[0] >= counts[1] >= counts[2] >= 0

    roots = np.where(np.asarray(st.nodes)[:, NODE_CHILD_COUNT] == 2)[0][:4]
    cols = debug_mod.false_color_by_subtree(st, roots.tolist())
    assert cols.shape == (st.capacity, 3)


def test_cli_create_hierarchy(tmp_path):
    from hlod_gaussians_tpu.data import dhier as dhier_io, ply as ply_io
    rng = np.random.default_rng(0)
    n = 9
    g = ply_io.GaussianPly(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=np.zeros((n, 0, 3), np.float32),
        opacity=np.zeros(n, np.float32),
        log_scale=np.full((n, 3), -2.0, np.float32),
        quat=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    inp = str(tmp_path / "in.ply")
    outp = str(tmp_path / "out.dhier")
    ply_io.save_gaussian_ply(inp, g)

    from hlod_gaussians_tpu import cli
    cli.main(["create-hierarchy", inp, outp])
    d = dhier_io.load_dhier(outp)
    assert d.nodes.shape[0] == 2 * n - 1


def test_path_to_root_and_level_slices():
    """Round-4: the two reference diagnostics debug.py lacked
    (debug_utils.plot_path_to_root:68-88, render_level_slices:286-314)."""
    st, m = hier_state(n=33, cap=128)
    nodes = np.asarray(st.nodes)
    leaf = int(np.where((nodes[:, NODE_CHILD_COUNT] == 0)
                        & np.asarray(st.alive))[0][0])
    path = debug_mod.path_to_root(st, leaf)
    assert path.shape[0] >= 2 and path.shape[1] == 3
    # the chain must end at the root
    n = leaf
    hops = 0
    while nodes[n, NODE_PARENT] >= 0:
        n = int(nodes[n, NODE_PARENT])
        hops += 1
    assert path.shape[0] == hops + 1

    cam = make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    slices = debug_mod.render_level_slices(st, cam, cfg=CFG, k_max=128)
    assert len(slices) >= 2
    counts = [n for _, n in slices]
    # finest level = all leaves; strictly coarser going up
    n_leaves = int(((nodes[:, NODE_CHILD_COUNT] == 0)
                    & np.asarray(st.alive)).sum())
    assert counts[0] == n_leaves
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    for img, _ in slices:
        assert np.isfinite(img).all() and img.max() > 0.0
