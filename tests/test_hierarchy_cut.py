"""LOD cut + interpolation weight tests: cut correctness (proper-cut
invariant at every granularity), weight formula parity, LOD render smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from hlod_gaussians_tpu import render as render_mod
from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.hierarchy import build as hb, cut as hc
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_PARENT)
from hlod_gaussians_tpu.utils import camera as cam_mod
from tests.test_hierarchy_build import random_gaussians


def build_test_hierarchy(n=33, seed=0):
    args = random_gaussians(n, seed=seed)
    return hb.build_hierarchy(*args)


@pytest.mark.parametrize("target", [1e-6, 1e-3, 0.01, 0.1, 10.0])
def test_cut_is_proper(target):
    """Proper-cut invariant for any target below the root's projected size.
    Above it the cut is empty — the reference renders nothing when even the
    root subtends less than the granularity target
    (markNodesForSizeDynamic, runtime_switching.cu:533-582)."""
    h = build_test_hierarchy()
    nodes = jnp.asarray(h.nodes)
    alive = jnp.ones(nodes.shape[0], bool)
    viewpoint = jnp.asarray([0.0, 0.0, -30.0])
    zdir = jnp.asarray([0.0, 0.0, 1.0])

    cut = hc.expand_to_size_dynamic(
        nodes, jnp.asarray(h.pos), jnp.asarray(h.scale.max(-1)), alive,
        viewpoint, zdir, target, use_frustum=False)
    root = np.where(h.nodes[:, NODE_PARENT] == -1)[0][0]
    if float(cut.size[root]) >= target:
        assert bool(hc.is_hierarchy_cut(nodes, cut.render_mask, alive))
    else:
        assert int(jnp.sum(cut.render_mask)) == 0


def test_tiny_target_selects_leaves():
    h = build_test_hierarchy()
    nodes = jnp.asarray(h.nodes)
    alive = jnp.ones(nodes.shape[0], bool)
    cut = hc.expand_to_size_dynamic(
        nodes, jnp.asarray(h.pos), jnp.asarray(h.scale.max(-1)), alive,
        jnp.asarray([0.0, 0.0, -30.0]), jnp.asarray([0.0, 0.0, 1.0]),
        1e-9, use_frustum=False)
    leaves = h.nodes[:, NODE_CHILD_COUNT] == 0
    np.testing.assert_array_equal(np.asarray(cut.render_mask), leaves)
    # at maximum detail every selected node interpolates fully to itself
    assert np.allclose(np.asarray(cut.ts)[leaves], 1.0)


def test_coarse_target_selects_top_children():
    """Just below the root's size the cut is the root's two children."""
    h = build_test_hierarchy()
    nodes = jnp.asarray(h.nodes)
    alive = jnp.ones(nodes.shape[0], bool)
    viewpoint = jnp.asarray([0.0, 0.0, -1000.0])
    root = np.where(h.nodes[:, NODE_PARENT] == -1)[0][0]
    root_size = h.scale[root].max() / np.linalg.norm(
        np.asarray(viewpoint) - h.pos[root])
    # target above every node but below the root
    sizes = h.scale.max(-1) / np.linalg.norm(
        np.asarray(viewpoint) - h.pos, axis=-1)
    second = np.sort(sizes)[-2]
    target = (root_size + second) / 2 if second < root_size else root_size * 0.999
    cut = hc.expand_to_size_dynamic(
        nodes, jnp.asarray(h.pos), jnp.asarray(h.scale.max(-1)), alive,
        viewpoint, jnp.asarray([0.0, 0.0, 1.0]), float(target),
        use_frustum=False)
    mask = np.asarray(cut.render_mask)
    assert bool(hc.is_hierarchy_cut(nodes, jnp.asarray(mask), alive))
    assert not mask[root]
    assert mask.sum() >= 2


def test_ts_formula_matches_reference():
    """Re-derive computeTsIndexedDynamic (runtime_switching.cu:640-684) in
    scalar numpy for every node and compare."""
    h = build_test_hierarchy(n=17, seed=2)
    nodes = h.nodes
    viewpoint = np.array([1.0, -2.0, -20.0], np.float32)
    target = 0.004
    maxsc = h.scale.max(-1)

    cut = hc.expand_to_size_dynamic(
        jnp.asarray(nodes), jnp.asarray(h.pos), jnp.asarray(maxsc),
        jnp.ones(nodes.shape[0], bool), jnp.asarray(viewpoint),
        jnp.asarray([0.0, 0.0, 1.0]), target, use_frustum=False)

    def size(i):
        return maxsc[i] / np.linalg.norm(viewpoint - h.pos[i])

    for i in range(nodes.shape[0]):
        p = nodes[i, NODE_PARENT]
        if p < 0:
            t = 1.0
        else:
            ps = size(p)
            if ps > 2 * target:
                t = 1.0
            else:
                s = size(i)
                start = max(0.5 * ps, s)
                diff = ps - start
                if diff <= 0:
                    t = 1.0
                else:
                    t = max(1.0 - max(0.0, target - start) / diff, 0.0)
        assert float(cut.ts[i]) == pytest.approx(t, rel=1e-5), i


def test_box_cut_inside_box_is_infinite():
    h = build_test_hierarchy()
    nodes = jnp.asarray(h.nodes)
    alive = jnp.ones(nodes.shape[0], bool)
    root = np.where(h.nodes[:, NODE_PARENT] == -1)[0][0]
    inside_pt = jnp.asarray((h.box_lo[root] + h.box_hi[root]) / 2)
    cut = hc.expand_to_size_box(
        nodes, jnp.asarray(h.box_lo), jnp.asarray(h.box_hi),
        jnp.asarray(h.max_side), alive, inside_pt, 1e9)
    # viewpoint inside the root box -> root size is inf -> must recurse
    assert float(cut.size[root]) == np.inf
    assert bool(hc.is_hierarchy_cut(nodes, cut.render_mask, alive))


def test_interpolation_sign_fix():
    params = dict(
        means3d=jnp.asarray([[0.0, 0, 0], [1, 0, 0]]),
        scales=jnp.asarray([[1.0, 1, 1], [2, 2, 2]]),
        quats=jnp.asarray([[1.0, 0, 0, 0], [-1.0, 0, 0, 0]]),
        opacities=jnp.asarray([0.5, 0.9]),
        shs=jnp.zeros((2, 1, 3)),
    )
    out = hc.interpolate_with_parents(
        params, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([0.5]))
    # parent quat (-1,0,0,0) has negative dot with child -> flipped to (1,0,0,0)
    np.testing.assert_allclose(np.asarray(out["quats"][0]), [1, 0, 0, 0],
                               atol=1e-6)
    assert float(out["opacities"][0]) == pytest.approx(0.7)
    np.testing.assert_allclose(np.asarray(out["means3d"][0]), [0.5, 0, 0])


def test_render_lod_smoke_and_detail_consistency():
    """Full-detail LOD render ~= flat render of the leaves."""
    n = 32
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.8, np.float32)
    shs = rng.random((n, 1, 3)).astype(np.float32) - 0.5

    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)

    out_lod, n_sel = render_mod.render_lod(
        jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
        jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
        jnp.asarray(h.nodes), jnp.ones(m, bool),
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
        jnp.zeros(3), 1e-9,
        sh_degree=0, width=64, height=64, budget=64, cfg=cfg, k_max=128,
        use_frustum=False)
    assert int(n_sel) == n  # all leaves

    # flat render of the leaves only
    leaves = h.nodes[:, NODE_CHILD_COUNT] == 0
    valid = jnp.asarray(leaves)
    out_flat = render_mod.render_arrays(
        jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
        jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh), valid,
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
        jnp.zeros(3), sh_degree=0, width=64, height=64, cfg=cfg, k_max=128)

    np.testing.assert_allclose(np.asarray(out_lod.image),
                               np.asarray(out_flat.image), atol=2e-5)

    # coarser cut still renders something sane
    out_coarse, n_sel_c = render_mod.render_lod(
        jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
        jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
        jnp.asarray(h.nodes), jnp.ones(m, bool),
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
        jnp.zeros(3), 0.03,
        sh_degree=0, width=64, height=64, budget=64, cfg=cfg, k_max=128,
        use_frustum=False)
    assert 0 < int(n_sel_c) < n
    img = np.asarray(out_coarse.image)
    assert np.isfinite(img).all() and img.max() > 0.01


@pytest.mark.parametrize("target", [1e-3, 0.05])
def test_parent_cache_cut_equivalence(target):
    """Per-frame cuts with the precomputed ParentCache must match the
    gather-based path exactly (mask, ts, kids), for both metrics."""
    h = build_test_hierarchy(65, seed=3)
    nodes = jnp.asarray(h.nodes)
    c = nodes.shape[0]
    alive = jnp.ones(c, bool)
    pos = jnp.asarray(h.pos)
    ms = jnp.asarray(h.scale.max(-1))
    viewpoint = jnp.asarray([0.3, -0.2, -30.0])
    zdir = jnp.asarray([0.0, 0.0, 1.0])

    ref = hc.expand_to_size_dynamic(nodes, pos, ms, alive, viewpoint, zdir,
                                    target, use_frustum=True)
    pc = hc.build_parent_cache(nodes, pos, ms)
    got = hc.expand_to_size_dynamic(nodes, pos, ms, alive, viewpoint, zdir,
                                    target, pc, use_frustum=True)
    assert bool(jnp.all(got.render_mask == ref.render_mask))
    np.testing.assert_allclose(np.asarray(got.ts), np.asarray(ref.ts),
                               atol=1e-6)
    assert bool(jnp.all(got.kids == ref.kids))

    # box metric
    from hlod_gaussians_tpu.hierarchy import boxes as boxes_mod
    nb = boxes_mod.compute_node_boxes(h.nodes, h.pos, h.scale.max(-1))
    lo, hi, side = (jnp.asarray(nb.lo), jnp.asarray(nb.hi),
                    jnp.asarray(nb.max_side))
    ref_b = hc.expand_to_size_box(nodes, lo, hi, side, alive, viewpoint,
                                  target)
    pcb = hc.build_parent_cache_box(nodes, lo, hi, side)
    got_b = hc.expand_to_size_box(nodes, lo, hi, side, alive, viewpoint,
                                  target, pcb)
    assert bool(jnp.all(got_b.render_mask == ref_b.render_mask))
    np.testing.assert_allclose(np.asarray(got_b.ts), np.asarray(ref_b.ts),
                               atol=1e-6)


def test_render_lod_precomputed_cut_and_stream_equivalence():
    """render_lod(precomputed_cut=...) and render_lod_stream must produce
    the same image as the in-jit cut path; the stream state must regulate
    (budget bucket seeded, pending feedback carried)."""
    n = 48
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.8, np.float32)
    shs = rng.random((n, 1, 3)).astype(np.float32) - 0.5

    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)
    args = (jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
            jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
            jnp.asarray(h.nodes), jnp.ones(m, bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), 0.01)
    kw = dict(sh_degree=0, width=64, height=64, cfg=cfg, k_max=128,
              use_frustum=False)

    ref, n_ref = render_mod.render_lod(*args, budget=64, **kw)

    cut = hc.expand_to_size_dynamic(
        args[5], args[0], jnp.max(args[1].T, axis=0), args[6], cam.campos,
        cam.world_view[:3, 2], 0.01, use_frustum=False)
    got, n_got = render_mod.render_lod(
        *args, None, None, None, cut, budget=64, **kw)
    assert int(n_got) == int(n_ref)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image),
                               atol=1e-6)

    st = {}
    for _ in range(3):   # seed frame + two regulated frames
        out_s, n_s = render_mod.render_lod_stream(
            *args, st, min_budget=64, **kw)
    assert int(n_s) == int(n_ref)
    assert st["budget"] >= int(n_ref)
    assert "pending" in st and st["md"] is not None
    np.testing.assert_allclose(np.asarray(out_s.image),
                               np.asarray(ref.image), atol=1e-6)


def test_interp_table_and_masked_render_equivalence():
    """interpolate_from_table == interpolate_with_parents bit-for-bit, and
    render_lod_masked matches render_lod on the same cut."""
    n = 48
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    scales = (0.03 + 0.04 * rng.random((n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.4, 0.9, n).astype(np.float32)
    shs = rng.random((n, 1, 3)).astype(np.float32) - 0.5

    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    nodes = jnp.asarray(h.nodes)
    params = dict(means3d=jnp.asarray(h.pos), scales=jnp.asarray(h.scale),
                  quats=jnp.asarray(h.quat),
                  opacities=jnp.asarray(np.clip(h.opacity, 0, 1)),
                  shs=jnp.asarray(h.sh))
    table = hc.build_interp_table(params, nodes)

    idx = jnp.asarray(rng.integers(0, m, 32).astype(np.int32))
    ts = jnp.asarray(rng.random(32).astype(np.float32))
    from hlod_gaussians_tpu.models.gaussians import NODE_PARENT
    parent = jnp.clip(nodes[idx, NODE_PARENT], 0, m - 1)
    ref = hc.interpolate_with_parents(params, idx, parent, ts)
    got = hc.interpolate_from_table(table, idx, ts)
    for key in ref:
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(ref[key]), err_msg=key)

    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)
    args = (params["means3d"], params["scales"], params["quats"],
            params["opacities"], params["shs"], nodes, jnp.ones(m, bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), 0.01)
    kw = dict(sh_degree=0, width=64, height=64, cfg=cfg, k_max=128,
              use_frustum=False)
    ref_r, n_ref = render_mod.render_lod(*args, budget=m, **kw)
    got_r, n_got = render_mod.render_lod_masked(
        *args, None, None, None, table, **kw)
    assert int(n_got) == int(n_ref)
    np.testing.assert_allclose(np.asarray(got_r.image),
                               np.asarray(ref_r.image), atol=2e-5)


def _stream_scene(n=48, seed=13, gscale=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    scales = np.full((n, 3), gscale, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.8, np.float32)
    shs = rng.random((n, 1, 3)).astype(np.float32) - 0.5
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    params = dict(means3d=jnp.asarray(h.pos), scales=jnp.asarray(h.scale),
                  quats=jnp.asarray(h.quat),
                  opacities=jnp.asarray(np.clip(h.opacity, 0, 1)),
                  shs=jnp.asarray(h.sh))
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    args = (params["means3d"], params["scales"], params["quats"],
            params["opacities"], params["shs"], jnp.asarray(h.nodes),
            jnp.ones(m, bool), cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3))
    return h, m, params, args


def test_stream_md_regulation_recovers_from_truncation():
    """A tiny md_floor forces truncation; the n_dup feedback must grow the
    capacity bucket until frames stop truncating, and never shrink it."""
    # big gaussians: every node touches many tiles, so the dup demand far
    # exceeds the initial capacity guess and truncation must occur
    h, m, params, args = _stream_scene(gscale=0.45)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)
    kw = dict(sh_degree=0, width=64, height=64, cfg=cfg, k_max=128,
              use_frustum=False, min_budget=64, md_floor=128,
              masked_crossover=0.0)   # force the budgeted gather path
    st = {}
    truncs = []
    for _ in range(8):
        out, n_sel = render_mod.render_lod_stream(*args, 0.01, st, **kw)
        truncs.append(bool(np.asarray(out.truncated)))
    assert truncs[-1] is False, truncs
    mds = st["md"]
    b = st["budget"]
    assert mds[b] > 128            # grew from the floor
    # rendering again keeps the settled bucket (monotonic, no flapping)
    settled = dict(mds)
    for _ in range(3):
        out, _ = render_mod.render_lod_stream(*args, 0.01, st, **kw)
    assert st["md"] == settled
    assert not bool(np.asarray(out.truncated))


def test_stream_masked_crossover_paths_match():
    """Forcing the masked path and forcing the budgeted path must render
    the same image through the stream."""
    h, m, params, args = _stream_scene()
    table = hc.build_interp_table(params, jnp.asarray(h.nodes))
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)
    kw = dict(sh_degree=0, width=64, height=64, cfg=cfg, k_max=128,
              use_frustum=False, min_budget=64, interp_table=table)
    st_m, st_b = {}, {}
    for _ in range(3):
        out_m, n_m = render_mod.render_lod_stream(
            *args, 0.01, st_m, masked_crossover=1e9, **kw)
        out_b, n_b = render_mod.render_lod_stream(
            *args, 0.01, st_b, masked_crossover=0.0, **kw)
    assert int(n_m) == int(n_b)
    np.testing.assert_allclose(np.asarray(out_m.image),
                               np.asarray(out_b.image), atol=2e-5)


def test_render_lod_inference_not_differentiable():
    """render_lod* force cfg.inference (binning skips gradient
    bookkeeping); differentiating through one must raise at trace time
    with a clear message, not silently return zero gradients."""
    import jax
    import pytest

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.utils.camera import make_camera

    rng = np.random.default_rng(0)
    n = 24
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    h = hb.build_hierarchy(
        pts, np.full((n, 3), 0.05, np.float32),
        np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
        np.full((n,), 0.8, np.float32),
        rng.random((n, 1, 3)).astype(np.float32) - 0.5)
    m = h.nodes.shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), 1.0, 1.0, 32, 32)
    cfg = RasterizerConfig(backend="pallas", tile_w=16, tile_h=8,
                           max_dup=1 << 12)

    def loss(pos):
        out, _ = render_mod.render_lod(
            jnp.asarray(pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
            jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
            jnp.asarray(h.nodes), jnp.ones((m,), bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), 0.01,
            sh_degree=0, width=32, height=32, budget=32, cfg=cfg,
            k_max=64, use_frustum=False)
        return out.image.sum()

    with pytest.raises(ValueError, match="inference"):
        jax.grad(loss)(h.pos)


def test_lod_fidelity_monotone_small():
    """CPU pin of the round-4 LOD-fidelity property (LODFIDELITY_r04): on
    an exact structured-color hierarchy, PSNR vs the leaf render degrades
    MONOTONICALLY as tau coarsens the cut (equal cuts excepted). Guards
    the cut/interp/LOD-alpha chain against quality regressions."""
    n = 2000
    rng = np.random.default_rng(5)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3.5, 4.5, n)], axis=-1).astype(np.float32)
    # structured multi-band colors (noise-free detail the cut must keep)
    cols = 0.5 + 0.35 * np.stack([
        np.sin(4.0 * pts[:, 0]) + 0.4 * np.sin(19.0 * pts[:, 1]),
        np.cos(3.0 * pts[:, 1]) + 0.4 * np.sin(17.0 * pts[:, 2]),
        np.sin(2.0 * pts[:, 2]) + 0.4 * np.cos(21.0 * pts[:, 0]),
    ], axis=-1) / 1.4
    scales = np.full((n, 3), 0.045, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.8, np.float32)
    C0 = 0.28209479177387814
    shs = ((cols - 0.5) / C0).astype(np.float32)[:, None, :]

    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    W = H = 96
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.7, 0.7, W, H)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=1 << 15)

    gt = render_mod.render_arrays(
        jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops), jnp.asarray(shs), jnp.ones(n, bool),
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, jnp.zeros(3), sh_degree=0, width=W, height=H,
        cfg=cfg, k_max=1024)
    assert not bool(gt.truncated)
    gt_img = jnp.clip(gt.image, 0, 1)

    from hlod_gaussians_tpu.ops import ssim as ssim_ops
    seq = []
    for tau in (0.0, 3.0, 8.0, 20.0):
        target = render_mod.tau_to_threshold(tau, float(cam.tan_fovx), W)
        out, n_sel = render_mod.render_lod(
            jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
            jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
            jnp.asarray(h.nodes), jnp.ones(m, bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), max(float(target), 1e-9),
            sh_degree=0, width=W, height=H, budget=4096, cfg=cfg,
            k_max=1024, use_frustum=False)
        assert not bool(out.truncated)
        psnr = float(ssim_ops.psnr(jnp.clip(out.image, 0, 1), gt_img))
        seq.append((psnr, int(n_sel)))

    for (pa, ra), (pb, rb) in zip(seq, seq[1:]):
        if ra > rb:          # the cut actually coarsened
            assert pa > pb, seq
        else:
            assert abs(pa - pb) < 0.05, seq
    assert seq[0][0] - seq[-1][0] > 3.0, seq   # real spread, not noise


def test_render_lod_auto_matches_budgeted():
    """render_lod_auto (r05: whole-frame jitted via the stream-frame
    programs + masked dispatch for dense cuts) must stay pixel-identical
    to the plain budgeted path at full detail and produce sane coarse
    frames, with md_state remembering capacities."""
    n = 64
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    h = hb.build_hierarchy(
        pts, np.full((n, 3), 0.05, np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        np.full(n, 0.8, np.float32),
        rng.random((n, 1, 3)).astype(np.float32) - 0.5)
    m = h.nodes.shape[0]
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)
    args = (jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
            jnp.asarray(np.clip(h.opacity, 0, 1)), jnp.asarray(h.sh),
            jnp.asarray(h.nodes), jnp.ones(m, bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3))
    md_state = {}
    out_a, n_a = render_mod.render_lod_auto(
        *args, jnp.float32(1e-9), sh_degree=0, width=64, height=64,
        cfg=cfg, k_max=128, use_frustum=False, md_state=md_state)
    out_b, n_b = render_mod.render_lod(
        *args, 1e-9, sh_degree=0, width=64, height=64, budget=128,
        cfg=cfg, k_max=128, use_frustum=False)
    assert int(n_a) == int(n_b) == n
    np.testing.assert_allclose(np.asarray(out_a.image),
                               np.asarray(out_b.image), atol=1e-5)
    out_c, n_c = render_mod.render_lod_auto(
        *args, jnp.float32(0.03), sh_degree=0, width=64, height=64,
        cfg=cfg, k_max=128, use_frustum=False, md_state=md_state)
    assert 0 < int(n_c) < n
    assert np.isfinite(np.asarray(out_c.image)).all()
