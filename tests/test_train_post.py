"""Post-optimization loop tests: dhier round-trip through the state,
SPT-cut training step reduces loss, densify round keeps invariants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import OptimizationConfig, PostConfig, RasterizerConfig
from hlod_gaussians_tpu.data import dhier as dhier_io
from hlod_gaussians_tpu.hierarchy import build as hb, spt as spt_mod
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import post as post_mod
from hlod_gaussians_tpu.utils.camera import make_camera
from tests.test_mcmc import check_invariants

W = H = 64
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)


def build_dhier(n=65, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 4.0
    scales = np.full((n, 3), 0.06, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = rng.uniform(0.5, 0.95, n).astype(np.float32)
    shs = (rng.random((n, 4, 3)).astype(np.float32) - 0.5)
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    return dhier_io.DHier(
        sh_degree=1, pos=h.pos, quat=h.quat,
        log_scale=np.log(np.maximum(h.scale, 1e-9)).astype(np.float32),
        opacity=np.clip(h.opacity, 0.01, 0.99).astype(np.float32),
        shs=h.sh.astype(np.float32), nodes=h.nodes)


def test_create_from_dhier_and_back(tmp_path):
    d = build_dhier()
    st = post_mod.create_from_dhier(d, capacity=512, skybox_num=8,
                                    scene_radius=2.0)
    assert int(jnp.sum(st.alive)) == d.pos.shape[0] + 8
    np.testing.assert_allclose(np.asarray(st.xyz)[8:8 + d.pos.shape[0]],
                               d.pos, atol=1e-6)
    # node table shifted
    nodes = np.asarray(st.nodes)
    root = np.where((nodes[:, gm.NODE_PARENT] == -1)
                    & (nodes[:, gm.NODE_DEPTH] >= 0))[0]
    assert len(root) == 1 and root[0] >= 8

    d2 = post_mod.state_to_dhier(st)
    np.testing.assert_allclose(d2.pos, d.pos, atol=1e-6)
    np.testing.assert_allclose(d2.opacity, d.opacity, atol=1e-5)
    np.testing.assert_array_equal(d2.nodes[:, gm.NODE_CHILD_COUNT],
                                  d.nodes[:, gm.NODE_CHILD_COUNT])
    # full binary round trip
    p = str(tmp_path / "x.dhier")
    dhier_io.save_dhier(p, d2)
    d3 = dhier_io.load_dhier(p)
    np.testing.assert_allclose(d3.pos, d.pos, atol=1e-6)


def test_post_train_step_reduces_loss():
    d = build_dhier()
    st = post_mod.create_from_dhier(d, capacity=512, skybox_num=0,
                                    scene_radius=2.0)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)

    forest = post_mod.rebuild_spt(
        st, post=PostConfig(spt_root_volume=1e-5, min_spt_size=4,
                            spt_target_granularity=0.01))
    cut = spt_mod.spt_cut(forest, jnp.zeros(st.capacity), cam.campos,
                          cam.full_proj, use_frustum=False)
    assert int(cut.n_selected) > 0

    # ground truth = render of the clean state at the same cut
    from hlod_gaussians_tpu import render as render_mod
    act = gm.activate(st, cut.gaussian_mask)
    gt = render_mod.render_arrays(
        act.means3d, act.scales, act.quats, act.opacities, act.shs, act.valid,
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
        jnp.zeros(3), sh_degree=1, width=W, height=H, cfg=CFG, k_max=256).image

    pert = dataclasses.replace(st, f_dc=st.f_dc + 0.25)
    ts = post_mod.init_post_train(pert)
    opt = OptimizationConfig(iterations=100)
    post = PostConfig(lambda_opacity=0.0, lambda_scaling=0.0)
    losses = []
    for i in range(25):
        ts, aux = post_mod.post_train_step(
            ts, cut.gaussian_mask, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.asarray(gt), jnp.zeros(3), 2.0,
            opt=opt, post=post, cfg=CFG, width=W, height=H, k_max=256,
            sh_degree=1, antialiasing=False)
        losses.append(float(aux.loss))
    assert losses[-1] < losses[0] * 0.6, losses
    assert np.isfinite(losses).all()


def test_densify_round():
    d = build_dhier()
    st = post_mod.create_from_dhier(d, capacity=1024, skybox_num=0,
                                    scene_radius=2.0)
    ts = post_mod.init_post_train(st)
    n_before = int(jnp.sum(st.alive))
    ts2, stats = post_mod.densify_round(
        ts, jax.random.PRNGKey(0),
        post=PostConfig(max_cap=800, grow_fraction=0.2), budget=256)
    assert int(stats["n_added_pairs"]) > 0
    assert int(stats["size"]) > n_before
    check_invariants(ts2.gaussians)


def test_mcmc_regularizers_change_loss():
    d = build_dhier()
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    gt = jnp.zeros((3, H, W))

    def run(lo):
        # fresh state per run: post_train_step donates its input buffers
        st = post_mod.create_from_dhier(d, capacity=256, skybox_num=0)
        mask = st.alive.copy()  # distinct buffer: the state is donated
        ts = post_mod.init_post_train(st)
        _, aux = post_mod.post_train_step(
            ts, mask, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3), 1.0,
            post=PostConfig(lambda_opacity=lo, lambda_scaling=0.0),
            cfg=CFG, width=W, height=H, k_max=256, sh_degree=1,
            antialiasing=False)
        return float(aux.loss)

    assert run(0.5) > run(0.0)


def test_mcmc_noise_perturbs_low_opacity():
    d = build_dhier()
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    gt = jnp.zeros((3, H, W))

    def run(noise_lr):
        st = post_mod.create_from_dhier(d, capacity=256, skybox_num=0)
        # make everything low-opacity so the noise gate opens
        st = dataclasses.replace(
            st, opacity_logit=jnp.where(st.alive[:, None], -3.0,
                                        st.opacity_logit))
        mask = st.alive.copy()
        ts = post_mod.init_post_train(st)
        ts2, _ = post_mod.post_train_step(
            ts, mask, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, gt, jnp.zeros(3), 1.0,
            post=PostConfig(mcmc_noise_lr=noise_lr, lambda_opacity=0.0),
            cfg=CFG, width=W, height=H, k_max=256, sh_degree=1,
            antialiasing=False)
        return np.asarray(ts2.gaussians.xyz)

    x0 = run(0.0)
    x1 = run(5e5)
    assert not np.allclose(x0, x1)
    assert np.isfinite(x1).all()
