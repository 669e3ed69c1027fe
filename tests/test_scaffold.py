"""Scaffold conditioning of chunk training (reference
scene/gaussian_model.py:866-919 + train_single.py:162-186)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.pipeline import full_train
from hlod_gaussians_tpu.train import flat
from hlod_gaussians_tpu.utils.camera import make_camera
from hlod_gaussians_tpu import render as render_mod

W = H = 64
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)


def test_ring_selection():
    xyz = np.array([
        [0.0, 0.0, 0.0],     # center -> excluded (interior)
        [0.6, 0.0, 0.0],     # in ring
        [0.0, 1.4, 0.0],     # in ring
        [2.0, 0.0, 0.0],     # too far
        [0.3, 0.3, 0.0],     # interior (max 0.3 < 0.5)
    ], np.float32)
    sel = gm.select_scaffold_ring(xyz, np.zeros(3), 1.0, n_skybox=0)
    assert sel.tolist() == [False, True, True, False, False]
    # skybox rows always selected
    sel2 = gm.select_scaffold_ring(xyz, np.zeros(3), 1.0, n_skybox=2)
    assert sel2[:2].all()


def make_scaffold(n=40, n_sky=8, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = gm.create_from_points(pts, cols, capacity=64, sh_degree=1,
                               skybox_num=n_sky, scene_radius=2.0)
    # perturb so scaffold rows are distinguishable from fresh init
    st = dataclasses.replace(st, quat=st.quat + 0.01)
    return st


def test_create_with_scaffold_layout():
    scaffold = make_scaffold()
    center = np.array([1.0, 0.0, 4.0], np.float32)
    pts = np.random.default_rng(1).uniform(-0.4, 0.4, (10, 3)).astype(np.float32) + center
    cols = np.full((10, 3), 0.5, np.float32)

    st = gm.create_with_scaffold(scaffold, center, 1.0, pts, cols,
                                 capacity=128, sh_degree=3)
    assert st.n_skybox == scaffold.n_skybox        # all skybox rows kept
    assert st.n_scaffold > 0
    n_pre = st.n_skybox + st.n_scaffold
    assert int(jnp.sum(st.alive)) == n_pre + len(pts)
    # scaffold raw params copied bit-exactly
    sel = gm.select_scaffold_ring(np.asarray(scaffold.xyz), center, 1.0,
                                  scaffold.n_skybox)
    sel &= np.asarray(scaffold.alive)
    rows = np.where(sel)[0]
    np.testing.assert_array_equal(np.asarray(st.xyz[:n_pre]),
                                  np.asarray(scaffold.xyz)[rows])
    np.testing.assert_array_equal(np.asarray(st.quat[:n_pre]),
                                  np.asarray(scaffold.quat)[rows])
    # SH rest zero-padded deg1 -> deg3
    assert st.f_rest.shape[1] == 15
    np.testing.assert_array_equal(np.asarray(st.f_rest[:n_pre, :3]),
                                  np.asarray(scaffold.f_rest)[rows])
    assert float(jnp.abs(st.f_rest[:n_pre, 3:]).max()) == 0.0


def _train_setup():
    scaffold = make_scaffold()
    center = np.array([0.5, 0.0, 4.0], np.float32)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.4, 0.4, (12, 3)).astype(np.float32) + center
    cols = rng.uniform(0, 1, (12, 3)).astype(np.float32)
    st = gm.create_with_scaffold(scaffold, center, 1.0, pts, cols,
                                 capacity=128, sh_degree=3)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    act = gm.activate(st)
    out = render_mod.render_arrays(
        act.means3d, act.scales, act.quats, act.opacities, act.shs,
        act.valid, cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
        sh_degree=3, width=W, height=H, cfg=CFG, k_max=256)
    return st, cam, out.image


def test_skybox_locked_scaffold_trainable():
    st, cam, gt = _train_setup()
    ts = flat.init_flat_train(st)
    xyz_before = np.asarray(st.xyz).copy()
    opt = OptimizationConfig()
    # train against a different target so gradients are nonzero
    target = jnp.clip(gt + 0.2, 0, 1)
    for _ in range(3):
        ts, aux = flat.train_step(
            ts, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, target, jnp.zeros(3), exposure_idx=jnp.int32(0),
            scene_extent=5.0, opt=opt, cfg=CFG, width=W, height=H,
            k_max=256, sh_degree=3, use_exposure=False, skybox_locked=True,
            scale_big_gauss=False)
    g = ts.gaussians
    n_sky = g.n_skybox
    # skybox rows bit-identical (grad locked, train_single.py:162-168)
    np.testing.assert_array_equal(np.asarray(g.xyz[:n_sky]),
                                  xyz_before[:n_sky])
    # scaffold ring rows DID move (they are trainable in the reference)
    scaf = slice(n_sky, n_sky + g.n_scaffold)
    assert np.abs(np.asarray(g.xyz[scaf]) - xyz_before[scaf]).max() > 0


def test_scaffold_not_densified_not_shrunk():
    st, cam, gt = _train_setup()
    n_pre = st.n_skybox + st.n_scaffold
    # make scaffold rows huge so shrink WOULD trigger, and give them big
    # densify stats
    st = dataclasses.replace(
        st, log_scale=st.log_scale.at[:n_pre].set(jnp.log(3.0)))
    # train_step donates its input; keep an independent copy for reuse
    st_copy = jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "dtype") else x, st)
    ls_before = np.asarray(st.log_scale).copy()

    ts2, _ = flat.train_step(
        flat.init_flat_train(st), cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, gt, jnp.zeros(3), exposure_idx=jnp.int32(0),
        scene_extent=5.0, opt=OptimizationConfig(position_lr_init=0.0,
                                                 scaling_lr=0.0,
                                                 feature_lr=0.0,
                                                 opacity_lr=0.0,
                                                 rotation_lr=0.0),
        cfg=CFG, width=W, height=H, k_max=256, sh_degree=3,
        use_exposure=False, skybox_locked=True, scale_big_gauss=True,
        big_gauss_frac=0.02)
    g2 = ts2.gaussians
    # protected rows (skybox+scaffold) never shrunk (train_single.py:184-185)
    np.testing.assert_array_equal(np.asarray(g2.log_scale[:n_pre]),
                                  ls_before[:n_pre])

    # densify never selects protected rows (fresh state: train_step donates)
    ts3 = dataclasses.replace(
        flat.init_flat_train(st_copy), xyz_grad_accum=jnp.full((128,), 1e9),
        max_radii=jnp.full((128,), 100.0))
    ts4, n_split = flat.densify_step(ts3, 5.0, opt=OptimizationConfig())
    nodes = np.asarray(ts4.gaussians.nodes)
    assert (nodes[:n_pre, gm.NODE_CHILD_COUNT] <= 0).all()


def test_pipeline_with_scaffold_and_resume(tmp_path):
    """Two-chunk pipeline: scaffold conditions each chunk; resume skips
    completed chunks (scripts/full_train.py:58-59,82,158)."""
    from tests.test_full_pipeline import synthetic_views
    pts, cols, views = synthetic_views(n_views=3, n_pts=40)

    from hlod_gaussians_tpu.data.scene import SceneInfo

    class FakeInfo:
        def __init__(self, v):
            self.v = v
            self.R = np.eye(3)                      # for chunking's centers
            self.T = -np.asarray(v.campos)

    scene = SceneInfo(points=pts, colors=cols,
                      train_cameras=[FakeInfo(v) for v in views],
                      test_cameras=[], extent=5.0,
                      center=np.zeros(3, np.float32))
    pcfg = full_train.PipelineConfig(
        coarse_iters=8, chunk_iters=12, post_iters=4, skybox_num=4,
        coarse_capacity=128, chunk_capacity=256, k_max=256, mh_walk=False,
        densification_interval=1000, post_densify_interval=1000,
        opacity_reset_interval=1000, chunk_size=100.0)
    opt = OptimizationConfig(iterations=50, densify_until_iter=0)
    out_dir = str(tmp_path / "run")

    merged = full_train.run_pipeline(
        scene, view_loader=lambda ci: ci.v, output_dir=out_dir,
        pcfg=pcfg, opt=opt, cfg=CFG)
    assert merged.pos.shape[0] > 0
    assert os.path.exists(os.path.join(out_dir, "scaffold.npz"))
    assert os.path.exists(os.path.join(out_dir, "merged.dhier"))

    # resume: chunk artifacts untouched (mtime unchanged => skipped)
    hier_files = []
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f == "hierarchy.dhier_opt":
                hier_files.append(os.path.join(root, f))
    assert hier_files
    mtimes = {f: os.path.getmtime(f) for f in hier_files}
    merged2 = full_train.run_pipeline(
        scene, view_loader=lambda ci: ci.v, output_dir=out_dir,
        pcfg=pcfg, opt=opt, cfg=CFG, skip_if_exists=True)
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"chunk re-trained: {f}"
    assert merged2.pos.shape[0] > 0


def test_pipeline_no_chunks(tmp_path):
    """Single-scene pipeline without chunking (train_no_chunks.py:98-265):
    coarse -> hierarchy on the scaffold -> post, no merge."""
    from tests.test_full_pipeline import synthetic_views

    pts, cols, views = synthetic_views(n_views=2, n_pts=32)
    from hlod_gaussians_tpu.data.scene import SceneInfo

    class FakeInfo:
        def __init__(self, v):
            self.v = v
            self.R = np.eye(3)
            self.T = -np.asarray(v.campos)

    scene = SceneInfo(points=pts, colors=cols,
                      train_cameras=[FakeInfo(v) for v in views],
                      test_cameras=[], extent=5.0,
                      center=np.zeros(3, np.float32))
    pcfg = full_train.PipelineConfig(
        coarse_iters=6, post_iters=4, skybox_num=4,
        coarse_capacity=128, chunk_capacity=512, k_max=256, mh_walk=False,
        post_densify_interval=1000)
    out = full_train.run_pipeline_no_chunks(
        scene, view_loader=lambda ci: ci.v, output_dir=str(tmp_path / "nc"),
        pcfg=pcfg, opt=OptimizationConfig(iterations=20), cfg=CFG)
    assert out.pos.shape[0] > 0
    assert os.path.exists(str(tmp_path / "nc" / "hierarchy.dhier_opt"))
