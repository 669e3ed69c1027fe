"""SPT build + cut tests: structure invariants and distance-window
semantics against the reference build algorithm
(scene/gaussian_model.py:184-345)."""

import numpy as np
import jax.numpy as jnp

from hlod_gaussians_tpu.hierarchy import build as hb, spt as spt_mod
from hlod_gaussians_tpu.models.gaussians import (
    NODE_AUX, NODE_CHILD_COUNT, NODE_PARENT)
from tests.test_hierarchy_build import random_gaussians


def make_forest(n=129, seed=0, root_volume=None, min_spt_size=4,
                granularity=0.01):
    means, scales, q, ops, shs = random_gaussians(n, seed=seed)
    h = hb.build_hierarchy(means, scales, q, ops, shs)
    m = h.nodes.shape[0]
    vols = np.prod(h.scale, axis=-1)
    if root_volume is None:
        # pick a volume between leaf and root scales so a real cut forms
        root_volume = float(np.quantile(vols[h.nodes[:, NODE_CHILD_COUNT] == 2],
                                        0.5))
    root = int(np.where(h.nodes[:, NODE_PARENT] == -1)[0][0])
    forest = spt_mod.build_spt(
        h.nodes, h.pos, h.scale, np.ones(m, bool), root,
        root_volume=root_volume, target_granularity=granularity,
        min_spt_size=min_spt_size)
    return h, forest


def test_build_partitions_leaves():
    """Every original leaf is either in exactly one SPT or in the upper tree."""
    h, forest = make_forest()
    m = h.nodes.shape[0]
    leaves = np.where(h.nodes[:, NODE_CHILD_COUNT] == 0)[0]

    entry_gid = np.asarray(forest.entry_gid)
    ut_global = np.asarray(forest.ut_nodes[:, NODE_AUX])
    in_spt = np.isin(leaves, entry_gid)
    in_ut = np.isin(leaves, ut_global)
    assert ((in_spt | in_ut)).all()
    assert not (in_spt & in_ut).any()
    # no duplicates in the SPT entries
    assert len(np.unique(entry_gid)) == len(entry_gid)


def test_entry_windows_nested():
    """Per entry: min <= max; children windows sit inside the parent's."""
    h, forest = make_forest()
    e_min = np.asarray(forest.entry_min)
    e_max = np.asarray(forest.entry_max)
    assert (e_min <= e_max + 1e-5).all()
    # per SPT sorted by descending max
    spt = np.asarray(forest.entry_spt)
    for s in np.unique(spt):
        mx = e_max[spt == s]
        assert (np.diff(mx) <= 1e-5).all()


def test_cut_covers_each_spt_leaf_region_once():
    """At any distance, the selected entries of an SPT form a proper cut of
    that SPT's subtree (every leaf covered by exactly one selected
    ancestor-or-self)."""
    h, forest = make_forest()
    m = h.nodes.shape[0]
    nodes = h.nodes
    entry_gid = np.asarray(forest.entry_gid)
    spt_of = np.asarray(forest.entry_spt)
    roots = np.asarray(forest.spt_root_global)

    for s, root in enumerate(roots):
        for dist in [0.5, 2.0, 10.0, 1e6]:
            sel = entry_gid[(spt_of == s)
                            & (np.asarray(forest.entry_max) > dist)
                            & (np.asarray(forest.entry_min) < dist)]
            sel = set(sel.tolist())
            # walk the subtree of root; count selected ancestors per leaf
            stack = [(int(root), 0)]
            while stack:
                i, cnt = stack.pop()
                cnt += int(i in sel)
                if nodes[i, NODE_CHILD_COUNT] == 0:
                    assert cnt == 1, (s, dist, i, cnt)
                else:
                    c0 = nodes[i, 3]
                    c1 = nodes[c0, 4]
                    stack += [(int(c0), cnt), (int(c1), cnt)]


def test_spt_cut_mask():
    h, forest = make_forest()
    m = h.nodes.shape[0]
    campos = jnp.asarray([0.0, 0.0, -10.0])
    proj = jnp.eye(4)
    cut = spt_mod.spt_cut(forest, jnp.zeros(m), campos, proj,
                          use_frustum=False)
    n_sel = int(cut.n_selected)
    assert n_sel > 0
    mask = np.asarray(cut.gaussian_mask)
    # every selected gaussian is alive in the hierarchy and at the right
    # granularity; far camera -> coarse cut smaller than the leaf count
    n_leaves = int((h.nodes[:, NODE_CHILD_COUNT] == 0).sum())
    assert mask.sum() == n_sel

    cut_near = spt_mod.spt_cut(forest, jnp.zeros(m),
                               jnp.asarray([0.0, 0.0, -0.1]), proj,
                               use_frustum=False)
    # nearer camera selects at least as many gaussians
    assert int(cut_near.n_selected) >= n_sel


def test_distance_multiplier_coarsens():
    h, forest = make_forest()
    m = h.nodes.shape[0]
    campos = jnp.asarray([0.0, 0.0, -5.0])
    proj = jnp.eye(4)
    base = spt_mod.spt_cut(forest, jnp.zeros(m), campos, proj,
                           use_frustum=False)
    coarse = spt_mod.spt_cut(forest, jnp.zeros(m), campos, proj,
                             distance_multiplier=8.0, use_frustum=False)
    assert int(coarse.n_selected) <= int(base.n_selected)


def test_mip_respawn_mask():
    """Entries whose max-distance window is below every camera's distance
    are flagged for relocation (train_post.py:752-761)."""
    import jax.numpy as jnp

    forest, state = _small_forest() if "_small_forest" in dir() else (None, None)
    if forest is None:
        import numpy as np
        from hlod_gaussians_tpu.train import post as post_mod
        from hlod_gaussians_tpu.hierarchy import build as hb
        from hlod_gaussians_tpu.data.dhier import DHier
        from hlod_gaussians_tpu.config import PostConfig

        rng = np.random.default_rng(0)
        n = 32
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        pts[:, 2] += 5.0
        scales = np.exp(rng.uniform(-3.0, -2.0, (n, 3))).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        h = hb.build_hierarchy(pts, scales, quats,
                               rng.uniform(0.3, 0.9, n).astype(np.float32),
                               rng.normal(size=(n, 1, 3)).astype(np.float32))
        d = DHier(sh_degree=0, pos=h.pos, quat=h.quat,
                  log_scale=np.log(np.maximum(h.scale, 1e-9)).astype(np.float32),
                  opacity=np.clip(h.opacity, 0.01, 0.99).astype(np.float32),
                  shs=h.sh.astype(np.float32), nodes=h.nodes)
        state = post_mod.create_from_dhier(d, capacity=128)
        # threshold between leaf volume (~1e-4) and root volume so the cut
        # lands mid-tree and real SPTs form below it
        forest = post_mod.rebuild_spt(
            state, post=PostConfig(spt_root_volume=1e-1, min_spt_size=4))
        assert forest.n_spts > 0 and forest.entry_gid.shape[0] > 0

    dummy = jnp.zeros((state.capacity,))
    # far camera: fine detail unreachable -> many entries flagged
    far = spt_mod.mip_respawn_mask(forest, dummy,
                                   jnp.asarray([[0.0, 0.0, -100.0]]))
    # camera at the scene: everything reachable -> nothing flagged
    near = spt_mod.mip_respawn_mask(forest, dummy,
                                    jnp.asarray([[0.0, 0.0, 5.0]]))
    assert int(far.sum()) > int(near.sum())
    assert int(near.sum()) == 0
