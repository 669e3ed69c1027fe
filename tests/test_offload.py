"""Out-of-core (host-offloaded) training tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import OptimizationConfig, PostConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import offload
from hlod_gaussians_tpu.utils.camera import make_camera

W = H = 48
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)


def toy(cap=256, n=48, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    cols = rng.random((n, 3)).astype(np.float32)
    st = gm.create_from_points(pts, cols, capacity=cap, sh_degree=1,
                               opacity_init=0.7)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    return st, cam


def test_host_store_roundtrip():
    st, _ = toy()
    store = offload.to_host_store(st)
    assert store.params["xyz"].sharding.memory_kind == offload.host_memory_kind()
    st2, adam2 = offload.from_host_store(store, st)
    np.testing.assert_array_equal(np.asarray(st2.xyz), np.asarray(st.xyz))


def test_offloaded_step_updates_only_working_set():
    st, cam = toy()
    xyz0 = np.array(st.xyz)
    dc0 = np.array(st.f_dc)
    store = offload.to_host_store(st)

    # working set = first half of the live rows
    mask = np.zeros(st.capacity, bool)
    mask[:24] = True
    idx, valid = offload.cut_to_indices(jnp.asarray(mask), budget=64)

    gt = jnp.full((3, H, W), 0.5)
    step = offload.make_offloaded_step(cfg=CFG, width=W, height=H,
                                       k_max=128, sh_degree=1,
                                       scene_extent=2.0)
    store2, loss, n_vis = step(
        store, idx, valid, cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))
    assert np.isfinite(float(loss))
    assert int(n_vis) > 0

    new_dc = np.asarray(store2.params["f_dc"])[:-1]   # strip scratch row
    # rows outside the working set untouched (incl. the LAST real row,
    # which padding lanes used to clobber via index clipping)
    np.testing.assert_array_equal(new_dc[24:], dc0[24:])
    # some working-set rows were optimized
    assert not np.allclose(new_dc[:24], dc0[:24])


def test_offloaded_matches_resident_step():
    """Out-of-core step == HBM-resident post step on the same working set."""
    from hlod_gaussians_tpu.train import post as post_mod

    st, cam = toy(seed=3)
    gt = jnp.full((3, H, W), 0.3)
    mask_np = np.array(st.alive)
    opt = OptimizationConfig()
    post = PostConfig(lambda_opacity=0.01)

    # resident reference
    st_res, _ = toy(seed=3)
    ts = post_mod.init_post_train(st_res)
    ts2, aux = post_mod.post_train_step(
        ts, jnp.asarray(mask_np), cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3), 2.0,
        opt=opt, post=post, cfg=CFG, width=W, height=H, k_max=128,
        sh_degree=1, antialiasing=False)

    # offloaded
    st_off, _ = toy(seed=3)
    store = offload.to_host_store(st_off)
    idx, valid = offload.cut_to_indices(jnp.asarray(mask_np), budget=64)
    step = offload.make_offloaded_step(opt=opt, post=post, cfg=CFG,
                                       width=W, height=H, k_max=128,
                                       sh_degree=1, scene_extent=2.0)
    store2, loss, _ = step(
        store, idx, valid, cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))

    np.testing.assert_allclose(float(loss), float(aux.loss), rtol=1e-5)
    live = mask_np
    np.testing.assert_allclose(
        np.asarray(store2.params["xyz"])[:-1][live],      # strip scratch row
        np.asarray(ts2.gaussians.xyz)[live], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(store2.params["opacity_logit"])[:-1][live],
        np.asarray(ts2.gaussians.opacity_logit)[live], atol=1e-6)


def test_reuse_diff_rule():
    prev = jnp.asarray([10.0, 20.0, 30.0])
    new = jnp.asarray([10.5, 40.0, 30.0])
    keep = offload.reuse_diff(None, prev, new, rtol=0.9)
    assert bool(keep[0]) and not bool(keep[1]) and bool(keep[2])


def test_numpy_offloaded_matches_resident():
    """The numpy-backed paging loop == the HBM-resident post step."""
    from hlod_gaussians_tpu.train import post as post_mod

    st, cam = toy(seed=9)
    gt = jnp.full((3, H, W), 0.3)
    mask_np = np.array(st.alive)
    opt = OptimizationConfig()
    post = PostConfig(lambda_opacity=0.01)

    st_res, _ = toy(seed=9)
    ts = post_mod.init_post_train(st_res)
    ts2, aux = post_mod.post_train_step(
        ts, jnp.asarray(mask_np), cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3), 2.0,
        opt=opt, post=post, cfg=CFG, width=W, height=H, k_max=128,
        sh_degree=1, antialiasing=False)

    st_off, _ = toy(seed=9)
    store = offload.to_numpy_store(st_off)
    idx_np = np.where(mask_np)[0].astype(np.int32)
    pad = np.full(64 - len(idx_np), store.capacity, np.int32)
    idx_np = np.concatenate([idx_np, pad])
    step = offload.make_numpy_offloaded_step(
        opt=opt, post=post, cfg=CFG, width=W, height=H, k_max=128,
        sh_degree=1, scene_extent=2.0)
    loss, n_vis = step(store, idx_np, cam.world_view, cam.full_proj,
                       cam.campos, cam.tan_fovx, cam.tan_fovy, gt,
                       jnp.zeros(3))
    np.testing.assert_allclose(float(loss), float(aux.loss), rtol=1e-5)
    live = mask_np
    np.testing.assert_allclose(store.params["xyz"][live],
                               np.asarray(ts2.gaussians.xyz)[live], atol=1e-6)
    assert store.step == 1


def test_packed_roundtrip():
    st, _ = toy()
    adam = None
    from hlod_gaussians_tpu import optim
    adam = optim.init_adam(st.params())
    store = offload.PackedStore.from_state(st, adam)
    p, m, v = offload.unpack_rows(jnp.asarray(store.data), st.sh_degree)
    np.testing.assert_array_equal(np.asarray(p["xyz"]), np.asarray(st.xyz))
    np.testing.assert_array_equal(np.asarray(p["quat"]), np.asarray(st.quat))
    repacked = np.asarray(offload.pack_rows(p, m, v, st.sh_degree))
    np.testing.assert_array_equal(repacked, store.data)


def test_device_resident_matches_sequential():
    """The cached trainer's results are identical to the synchronous numpy
    paging path across overlapping working sets."""
    st, cam = toy(seed=3)
    gt = jnp.full((3, H, W), 0.35)

    # working sets: overlapping windows over the live rows
    sets = [np.arange(0, 32), np.arange(16, 40), np.arange(8, 36),
            np.arange(0, 24)]

    # reference: synchronous unpacked paging
    store_a = offload.to_numpy_store(st)
    step_a = offload.make_numpy_offloaded_step(
        cfg=CFG, width=W, height=H, k_max=128, sh_degree=1,
        scene_extent=2.0)
    for rows in sets:
        step_a(store_a, rows.astype(np.int32), cam.world_view, cam.full_proj,
               cam.campos, cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))

    # device-resident cached trainer
    store_b = offload.PackedStore.from_state(st)
    tr = offload.DeviceResidentTrainer(
        store_b, budget=64, cfg=CFG, width=W, height=H, k_max=128,
        scene_extent=2.0)
    fetches = []
    for rows in sets:
        tr.step(rows.astype(np.int32), cam.world_view, cam.full_proj,
                cam.campos, cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))
        fetches.append(tr.last_fetch)
    tr.flush()

    # delta accounting: step 2 reuses [16,32) -> fetches only 8 new rows
    assert fetches[0] == 32
    assert fetches[1] == 8, fetches
    assert fetches[2] == 8, fetches

    p, m, v = offload.unpack_rows(jnp.asarray(store_b.data), 1)
    np.testing.assert_allclose(np.asarray(p["xyz"]), store_a.params["xyz"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(p["opacity_logit"]),
                               store_a.params["opacity_logit"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m["xyz"]), store_a.m["xyz"],
                               rtol=2e-5, atol=1e-7)


def test_packed_step_dispatch_writeback():
    st, cam = toy(seed=5)
    store = offload.PackedStore.from_state(st)
    gt = jnp.full((3, H, W), 0.5)
    dispatch, writeback = offload.make_packed_offloaded_step(
        cfg=CFG, width=W, height=H, k_max=128, sh_degree=1, scene_extent=2.0)
    idx = np.arange(32, dtype=np.int32)
    before = store.data.copy()
    h = dispatch(store, idx, cam.world_view, cam.full_proj, cam.campos,
                 cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))
    loss, n_vis = writeback(store, h)
    assert np.isfinite(float(loss)) and int(n_vis) > 0
    assert (store.data[:32] != before[:32]).any()
    np.testing.assert_array_equal(store.data[32:], before[32:])


def test_device_resident_prefetch_pipeline():
    """step(prefetch_rows=next) must give bit-identical results to the
    unpipelined path while actually consuming the prepared delta."""
    st, cam = toy(seed=7)
    gt = jnp.full((3, H, W), 0.4)
    sets = [np.arange(0, 32), np.arange(16, 40), np.arange(8, 36),
            np.arange(0, 24)]

    store_a = offload.PackedStore.from_state(st)
    tr_a = offload.DeviceResidentTrainer(
        store_a, budget=64, cfg=CFG, width=W, height=H, k_max=128,
        scene_extent=2.0)
    for rows in sets:
        tr_a.step(rows.astype(np.int32), cam.world_view, cam.full_proj,
                  cam.campos, cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3))
    tr_a.flush()

    store_b = offload.PackedStore.from_state(st)
    tr_b = offload.DeviceResidentTrainer(
        store_b, budget=64, cfg=CFG, width=W, height=H, k_max=128,
        scene_extent=2.0)
    for i, rows in enumerate(sets):
        nxt = sets[i + 1].astype(np.int32) if i + 1 < len(sets) else None
        tr_b.step(rows.astype(np.int32), cam.world_view, cam.full_proj,
                  cam.campos, cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3),
                  prefetch_rows=nxt)
        if nxt is not None:
            assert tr_b._prefetched is not None
    tr_b.flush()
    np.testing.assert_array_equal(store_a.data, store_b.data)


def test_cached_cutter_reuse_rule():
    """cache_spts + reuse_spt_tolerance (train_post.py:362-394): a small
    camera move keeps the working set bit-identical; a big move or
    cache_spts=False re-cuts at the new distance."""
    from hlod_gaussians_tpu.config import PostConfig
    from tests.test_spt import make_forest

    h, forest = make_forest(n=257, seed=2)
    cap = h.nodes.shape[0]
    proj = jnp.asarray(np.eye(4, dtype=np.float32))

    campos0 = jnp.asarray(np.array([0.0, 0.0, -3.0], np.float32))
    # a move small enough that every SPT distance ratio stays within 0.9
    campos1 = campos0 + jnp.asarray(np.array([0.0, 0.0, -0.05], np.float32))
    campos2 = campos0 + jnp.asarray(np.array([0.0, 0.0, -8.0], np.float32))

    post_on = PostConfig(cache_spts=True, reuse_spt_tolerance=0.9,
                         use_frustum_culling=False)
    cutter = offload.CachedCutter(forest, cap, post_on)
    c0 = cutter.cut(campos0, proj)
    c1 = cutter.cut(campos1, proj)
    assert int(c0.n_selected) > 0
    np.testing.assert_array_equal(np.asarray(c0.gaussian_mask),
                                  np.asarray(c1.gaussian_mask))
    # effective distances were REUSED, not refreshed
    np.testing.assert_allclose(np.asarray(c1.spt_distance)[
        np.asarray(c0.spt_selected)],
        np.asarray(c0.spt_distance)[np.asarray(c0.spt_selected)])

    # a large move re-cuts (distance ratio falls outside the tolerance)
    c2 = cutter.cut(campos2, proj)
    sel = np.asarray(c2.spt_selected) & np.asarray(c0.spt_selected)
    if sel.any():
        assert not np.allclose(np.asarray(c2.spt_distance)[sel],
                               np.asarray(c0.spt_distance)[sel])

    # cache off: the second cut equals a fresh cut at the new position
    post_off = PostConfig(cache_spts=False, use_frustum_culling=False)
    cutter_off = offload.CachedCutter(forest, cap, post_off)
    cutter_off.cut(campos0, proj)
    c1_off = cutter_off.cut(campos1, proj)
    from hlod_gaussians_tpu.hierarchy import spt as spt_mod
    fresh = spt_mod.spt_cut(forest, jnp.zeros((cap,)), campos1, proj,
                            use_frustum=False)
    np.testing.assert_array_equal(np.asarray(c1_off.gaussian_mask),
                                  np.asarray(fresh.gaussian_mask))


def test_post_optimize_offloaded_spt_cuts():
    """The composed out-of-core post loop (directive #4's 'SPT-cut working
    sets'): CachedCutter -> DeviceResidentTrainer with prefetch. Checks
    the loop trains (finite, loss drops on repeated views), pages only
    deltas on revisits, and the store actually changes."""
    import dataclasses

    from hlod_gaussians_tpu.config import PostConfig
    from hlod_gaussians_tpu.train import post as post_mod
    from hlod_gaussians_tpu.utils.camera import make_camera
    from tests.test_spt import make_forest

    h, forest = make_forest(n=129, seed=4)
    cap = 1 << int(np.ceil(np.log2(h.nodes.shape[0] + 1)))
    from hlod_gaussians_tpu.data.dhier import DHier
    d = DHier(sh_degree=1, pos=h.pos, quat=h.quat,
              log_scale=np.log(np.maximum(h.scale, 1e-12)).astype(np.float32),
              opacity=np.clip(h.opacity, 1e-4, 1 - 1e-6).astype(np.float32),
              shs=h.sh.astype(np.float32), nodes=h.nodes)
    state = post_mod.create_from_dhier(d, capacity=cap)
    store = offload.PackedStore.from_state(state)
    before = store.data.copy()

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.models import gaussians as gm
    act = gm.activate(state)
    views = []
    for k in range(3):
        ang = 0.05 * k
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cam = make_camera(R, np.zeros(3), 0.9, 0.9, W, H)
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3), sh_degree=1,
            width=W, height=H, cfg=CFG, k_max=256)
        # train toward a DIMMED target so there is real signal
        views.append(dataclasses.replace(cam, image=out.image * 0.7))

    post = PostConfig(cache_spts=True, use_frustum_culling=False,
                      lambda_opacity=0.0)
    trainer, losses = offload.post_optimize_offloaded(
        store, forest, views, budget=cap, post=post, cfg=CFG,
        width=W, height=H, k_max=256, scene_extent=2.0, n_iters=9)
    trainer.flush()

    l = [float(x) for x in losses]
    assert all(np.isfinite(l))
    assert l[-1] < l[0], l                       # same views revisited
    assert not np.array_equal(store.data, before)
    # revisits of cached SPT cuts page ZERO rows (cache_spts keeps the
    # working set bit-identical for an unmoved camera)
    assert trainer.last_fetch <= 4, trainer.last_fetch
