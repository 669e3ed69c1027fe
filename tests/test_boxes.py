"""Node AABBs + upstream .hier interop + box-metric tau evaluation
(reference render_hierarchy.py protocol over computeSizeGPU boxes)."""

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.data import dhier as dhier_io
from hlod_gaussians_tpu.hierarchy import boxes as boxes_mod
from hlod_gaussians_tpu.hierarchy import build as hb
from hlod_gaussians_tpu.hierarchy.cut import (expand_to_size_box,
                                              is_hierarchy_cut)
from hlod_gaussians_tpu.models.gaussians import (NODE_CHILD_COUNT,
                                                 NODE_DEPTH, NODE_PARENT)


def small_hierarchy(n=33, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    scales = np.exp(rng.uniform(-3.5, -2.0, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    ops = rng.uniform(0.3, 0.9, n).astype(np.float32)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.2
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    return dhier_io.DHier(
        sh_degree=0, pos=h.pos, quat=h.quat,
        log_scale=np.log(np.maximum(h.scale, 1e-9)).astype(np.float32),
        opacity=np.clip(h.opacity, 0.01, 0.99).astype(np.float32),
        shs=h.sh.astype(np.float32), nodes=h.nodes)


def test_leaf_and_parent_boxes():
    d = small_hierarchy()
    pos = np.asarray(d.pos)
    ms = np.exp(np.asarray(d.log_scale)).max(axis=1)
    nb = boxes_mod.compute_node_boxes(d.nodes, pos, ms)
    nodes = np.asarray(d.nodes)

    leaves = np.where(nodes[:, NODE_CHILD_COUNT] == 0)[0]
    np.testing.assert_allclose(nb.lo[leaves], pos[leaves] - 3 * ms[leaves, None],
                               rtol=1e-6)
    np.testing.assert_allclose(nb.hi[leaves], pos[leaves] + 3 * ms[leaves, None],
                               rtol=1e-6)

    # every parent's box contains its children's boxes
    par = nodes[:, NODE_PARENT]
    for i in range(len(nodes)):
        p = par[i]
        if p >= 0:
            assert (nb.lo[p] <= nb.lo[i] + 1e-6).all()
            assert (nb.hi[p] >= nb.hi[i] - 1e-6).all()
    # root box = longest side consistency
    root = np.where(par == -1)[0][0]
    np.testing.assert_allclose(nb.max_side[root],
                               (nb.hi[root] - nb.lo[root]).max(), rtol=1e-6)


def test_hier_round_trip_and_box_cut(tmp_path):
    d = small_hierarchy(seed=3)
    up = boxes_mod.dhier_to_upstream(d)
    path = str(tmp_path / "test.hier")
    dhier_io.save_hier(path, up)
    up2 = dhier_io.load_hier(path)
    np.testing.assert_allclose(up2.pos, up.pos, atol=1e-6)
    np.testing.assert_allclose(up2.boxes, up.boxes, atol=1e-6)

    d2, nb = boxes_mod.upstream_to_fork(up2)
    nodes2 = np.asarray(d2.nodes)
    # same number of leaves, same depth histogram
    n1 = np.asarray(d.nodes)
    assert (nodes2[:, NODE_CHILD_COUNT] == 0).sum() == \
        (n1[:, NODE_CHILD_COUNT] == 0).sum()
    h1 = np.bincount(n1[:, NODE_DEPTH][n1[:, NODE_DEPTH] >= 0])
    h2 = np.bincount(nodes2[:, NODE_DEPTH][nodes2[:, NODE_DEPTH] >= 0])
    np.testing.assert_array_equal(h1, h2)

    # box cut at several granularities is a proper hierarchy cut
    alive = jnp.ones(nodes2.shape[0], bool)
    for target in (1e-6, 0.01, 0.1, 1.0):
        cut = expand_to_size_box(
            jnp.asarray(nodes2), jnp.asarray(nb.lo), jnp.asarray(nb.hi),
            jnp.asarray(nb.max_side), alive, jnp.zeros(3), target)
        assert bool(is_hierarchy_cut(jnp.asarray(nodes2), cut.render_mask,
                                     alive)), f"target {target}"
        # coarser target selects fewer nodes
    c_fine = int(expand_to_size_box(
        jnp.asarray(nodes2), jnp.asarray(nb.lo), jnp.asarray(nb.hi),
        jnp.asarray(nb.max_side), alive, jnp.zeros(3),
        1e-6).render_mask.sum())
    c_coarse = int(expand_to_size_box(
        jnp.asarray(nodes2), jnp.asarray(nb.lo), jnp.asarray(nb.hi),
        jnp.asarray(nb.max_side), alive, jnp.zeros(3),
        1.0).render_mask.sum())
    assert c_fine > c_coarse


def test_box_tau_eval_runs(tmp_path):
    """tau-sweep eval over a loaded .hier with the box metric
    (render_hierarchy.py:32-141 protocol)."""
    import dataclasses as dc

    from hlod_gaussians_tpu import eval as eval_mod, render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.train import post as post_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    d = small_hierarchy(seed=5)
    up = boxes_mod.dhier_to_upstream(d)
    path = str(tmp_path / "m.hier")
    dhier_io.save_hier(path, up)
    d2, nb = boxes_mod.upstream_to_fork(dhier_io.load_hier(path))

    st = post_mod.create_from_dhier(d2, capacity=128)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, 64, 64)
    act = gm.activate(st)
    # ground truth = full-detail render of the LEAVES only (what a tau=0
    # cut selects)
    leaf_valid = st.alive & (st.nodes[:, NODE_CHILD_COUNT] == 0) \
        & (st.nodes[:, NODE_DEPTH] >= 0)
    gt = render_mod.render_arrays(
        act.means3d, act.scales, act.quats, act.opacities, act.shs,
        leaf_valid, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, jnp.zeros(3), sh_degree=st.sh_degree,
        width=64, height=64, cfg=cfg, k_max=256).image

    # boxes are over the hierarchy rows; pad to state capacity
    cpad = st.capacity
    lo = np.zeros((cpad, 3), np.float32); lo[:nb.lo.shape[0]] = nb.lo
    hi = np.zeros((cpad, 3), np.float32); hi[:nb.hi.shape[0]] = nb.hi
    msd = np.zeros((cpad,), np.float32); msd[:nb.max_side.shape[0]] = nb.max_side

    warned = []
    results = eval_mod.eval_views(
        st, [cam], [np.asarray(gt)], levels=[0.0, 15.0], level_is_tau=True,
        boxes=(lo, hi, msd), budget=256, cfg=cfg, k_max=256,
        warn=lambda *a, **k: warned.append(a))
    assert warned, "missing-LPIPS warning not raised"
    # tau=0 renders at full detail -> reconstruction near-exact (inf = the
    # cut reproduced the leaf render bit-for-bit)
    assert results[0].psnr > 30.0, results
    # coarser tau selects fewer nodes
    assert results[1].mean_rendered <= results[0].mean_rendered
