"""End-to-end flat training smoke tests: loss decreases, densify writes
children, opacity reset clamps — semantics from reference train_single.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hlod_gaussians_tpu import optim, render as render_mod
from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import flat
from hlod_gaussians_tpu.utils import camera as cam_mod

W, H = 64, 64
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=4096)


def toy_scene(n=64, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    cols = rng.random((n, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=cap, sh_degree=1,
                                  opacity_init=0.5)
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), fovx=0.8, fovy=0.8,
                              width=W, height=H)
    return state, cam


def render_state(state, cam, sh_degree=1):
    act = gm.activate(state)
    return render_mod.render_arrays(
        act.means3d, act.scales, act.quats, act.opacities, act.shs, act.valid,
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
        jnp.zeros(3), sh_degree=sh_degree, width=W, height=H, cfg=CFG,
        k_max=256)


def test_train_step_decreases_loss():
    state, cam = toy_scene()
    gt = np.asarray(render_state(state, cam).image)

    # perturb the model, then fit back toward gt
    pert = dataclasses.replace(
        state, f_dc=state.f_dc + 0.3,
        xyz=state.xyz + 0.02 * np.random.default_rng(1).normal(
            size=state.xyz.shape).astype(np.float32))
    ts = flat.init_flat_train(pert)
    opt = OptimizationConfig(position_lr_init=1e-3, iterations=200)

    losses = []
    for i in range(30):
        ts, aux = flat.train_step(
            ts, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.asarray(gt), jnp.zeros(3),
            exposure_idx=jnp.int32(0), scene_extent=5.0,
            opt=opt, cfg=CFG, width=W, height=H, k_max=256, sh_degree=1,
            use_exposure=False, scale_big_gauss=False)
        losses.append(float(aux.loss))
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses).all()


def test_train_step_stats_and_visibility():
    state, cam = toy_scene()
    gt = np.asarray(render_state(state, cam).image) * 0.5
    # train_step donates its input state; keep host copies for the checks
    state_alive = np.asarray(state.alive)
    state_xyz = np.asarray(state.xyz)
    ts = flat.init_flat_train(state)
    ts, aux = flat.train_step(
        ts, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, jnp.asarray(gt), jnp.zeros(3),
        exposure_idx=jnp.int32(0), scene_extent=5.0,
        cfg=CFG, width=W, height=H, k_max=256, sh_degree=1,
        use_exposure=False, scale_big_gauss=False)
    assert int(aux.n_visible) > 0
    # stats accumulate only on visible rows
    assert float(jnp.max(ts.xyz_grad_accum)) > 0
    assert int(jnp.sum(ts.denom)) == int(aux.n_visible)
    # dead rows' params untouched by the masked Adam
    dead = ~state_alive
    np.testing.assert_array_equal(np.asarray(ts.gaussians.xyz)[dead],
                                  state_xyz[dead])


def test_densify_creates_children():
    state, cam = toy_scene(n=32, cap=256)
    state_log_scale = np.asarray(state.log_scale)  # densify donates the state
    ts = flat.init_flat_train(state)
    # force selection: high accumulated grads + radii + opacity
    ts = dataclasses.replace(
        ts,
        xyz_grad_accum=jnp.where(state.alive, 1.0, 0.0),
        max_radii=jnp.where(state.alive, 10.0, 0.0))
    n_before = int(jnp.sum(state.alive))
    ts2, n_split = flat.densify_step(ts, 5.0, opt=OptimizationConfig(
        densify_grad_threshold=0.01))
    assert int(n_split) == n_before  # all alive leaves qualify (opacity 0.5)
    assert int(jnp.sum(ts2.gaussians.alive)) == n_before + 2 * n_before

    nodes = np.asarray(ts2.gaussians.nodes)
    alive = np.asarray(ts2.gaussians.alive)
    parents = np.where(nodes[:, gm.NODE_CHILD_COUNT] == 2)[0]
    assert len(parents) == n_before
    for p in parents[:8]:
        c0 = nodes[p, gm.NODE_FIRST_CHILD]
        assert alive[c0]
        assert nodes[c0, gm.NODE_PARENT] == p
        assert nodes[c0, gm.NODE_DEPTH] == nodes[p, gm.NODE_DEPTH] + 1
        c1 = nodes[c0, gm.NODE_NEXT_SIBLING]
        assert nodes[c1, gm.NODE_PARENT] == p
    # children split the parent's scale/opacity by 1/(0.8*2)
    p = parents[0]
    c0 = nodes[p, gm.NODE_FIRST_CHILD]
    np.testing.assert_allclose(
        np.exp(np.asarray(ts2.gaussians.log_scale)[c0]),
        np.exp(state_log_scale[p]) / 1.6, rtol=1e-5)
    # stats reset
    assert float(jnp.sum(ts2.xyz_grad_accum)) == 0.0


def test_densify_respects_capacity():
    state, cam = toy_scene(n=32, cap=40)  # only 8 free slots -> 4 splits
    ts = flat.init_flat_train(state)
    ts = dataclasses.replace(
        ts, xyz_grad_accum=jnp.where(state.alive, 1.0, 0.0),
        max_radii=jnp.where(state.alive, 10.0, 0.0))
    ts2, n_split = flat.densify_step(ts, 5.0, opt=OptimizationConfig(
        densify_grad_threshold=0.01))
    assert int(n_split) == 4
    assert int(jnp.sum(ts2.gaussians.alive)) == 40


def test_reset_opacity():
    state, _ = toy_scene()
    ts = flat.init_flat_train(state)
    ts2 = flat.reset_opacity(ts)
    op = jax.nn.sigmoid(ts2.gaussians.opacity_logit[:, 0])
    alive = np.asarray(state.alive)
    assert np.all(np.asarray(op)[alive] <= 0.0101)


def test_expon_lr_schedule():
    lr0 = float(optim.expon_lr(0, 1e-2, 1e-4, max_steps=100))
    lr_mid = float(optim.expon_lr(50, 1e-2, 1e-4, max_steps=100))
    lr1 = float(optim.expon_lr(100, 1e-2, 1e-4, max_steps=100))
    assert lr0 == pytest.approx(1e-2, rel=1e-5)
    assert lr1 == pytest.approx(1e-4, rel=1e-5)
    assert lr_mid == pytest.approx(1e-3, rel=1e-4)  # log-lerp midpoint


def test_densify_clone_mode():
    """Clone keeps child scale/opacity identical to the parent
    (densify_and_clone, gaussian_model.py:1404-1449)."""
    import dataclasses

    from hlod_gaussians_tpu.models import gaussians as gm

    st, cam = _toy_scene() if "_toy_scene" in dir() else (None, None)
    if st is None:
        import numpy as np
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(16, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        st = gm.create_from_points(pts, rng.random((16, 3)).astype(np.float32),
                                   capacity=64, sh_degree=1, opacity_init=0.7)
    ts = flat.init_flat_train(st)
    ts = dataclasses.replace(
        ts, xyz_grad_accum=jnp.full((64,), 1e9),
        max_radii=jnp.full((64,), 100.0))
    ls_parent = np.asarray(ts.gaussians.log_scale).copy()
    op_parent = np.asarray(ts.gaussians.opacity_logit).copy()
    ts2, n = flat.densify_step(ts, 5.0, mode="clone")
    assert int(n) > 0
    g = ts2.gaussians
    nodes = np.asarray(g.nodes)
    kids = np.where((nodes[:, gm.NODE_PARENT] >= 0)
                    & np.asarray(g.alive)
                    & (np.arange(64) >= 16))[0]
    assert len(kids) == 2 * int(n)
    for c in kids:
        p = nodes[c, gm.NODE_PARENT]
        np.testing.assert_array_equal(np.asarray(g.log_scale)[c], ls_parent[p])
        np.testing.assert_array_equal(np.asarray(g.opacity_logit)[c],
                                      op_parent[p])


def test_coarse_frozen_xyz_stays_finite():
    """lr_init = lr_final = 0 (the coarse stage's frozen xyz) must yield a
    ZERO learning rate, not NaN (exp(log(0)*(1-t) + log(0)*t)) — the NaN
    silently destroyed the scaffold before the finite-filter hid it."""
    import jax
    from hlod_gaussians_tpu import optim
    from hlod_gaussians_tpu.train import coarse as coarse_mod

    lr = float(optim.expon_lr(0, 0.0, 0.0))
    assert lr == 0.0 and np.isfinite(lr)

    state, cam = toy_scene(n=24)
    ts = flat.init_flat_train(state)
    opt_c = coarse_mod.coarse_opt_config(OptimizationConfig())
    xyz0 = np.asarray(ts.gaussians.xyz)
    gt = jnp.zeros((3, H, W))
    cams = (cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        ts, aux = coarse_mod.coarse_step(
            ts, cams, gt, jax.random.fold_in(key, i), 5.0,
            opt=opt_c, cfg=CFG, width=W, height=H, k_max=128)
    xyz1 = np.asarray(ts.gaussians.xyz)
    assert np.isfinite(xyz1).all()
    np.testing.assert_array_equal(xyz1, xyz0)   # frozen: bit-identical
