"""End-to-end pipeline smoke test on a tiny synthetic scene: flat training
-> hierarchy creation -> post-optimization -> merged .dhier -> LOD eval."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import eval as eval_mod, render as render_mod
from hlod_gaussians_tpu.config import (OptimizationConfig, PostConfig,
                                       RasterizerConfig)
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.pipeline import full_train, merge
from hlod_gaussians_tpu.train import post as post_mod
from hlod_gaussians_tpu.utils.camera import make_camera
from hlod_gaussians_tpu.utils.metrics import MetricsLogger, SectionTimers

W = H = 64
CFG = RasterizerConfig(tile_w=16, tile_h=16, max_dup=8192)


def synthetic_views(n_views=3, n_pts=48, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 4.0
    cols = rng.uniform(0.1, 0.9, (n_pts, 3)).astype(np.float32)

    gt_state = gm.create_from_points(pts, cols, capacity=128, sh_degree=1,
                                     opacity_init=0.8)
    views = []
    for k in range(n_views):
        ang = 0.15 * (k - 1)
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        cam = make_camera(R, np.zeros(3), 0.9, 0.9, W, H, exposure_idx=k)
        act = gm.activate(gt_state)
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=1, width=W, height=H, cfg=CFG, k_max=256)
        views.append(dataclasses.replace(cam, image=out.image))
    return pts, cols, views


def test_flat_then_hierarchy_then_post(tmp_path):
    pts, cols, views = synthetic_views()
    pcfg = full_train.PipelineConfig(
        densification_interval=40, densify_from_iter=10,
        opacity_reset_interval=10_000, post_densify_interval=10_000,
        k_max=256, mh_walk=False)
    opt = OptimizationConfig(iterations=200, densify_until_iter=100,
                             densify_grad_threshold=1e9)  # no densify noise
    logger = MetricsLogger(str(tmp_path / "metrics.jsonl"))

    # scale_big_gauss off: the toy scene's extent is tiny, so the reference's
    # 2%-of-extent shrink heuristic would fight the fit
    ts = full_train.train_flat_scene(
        views, pts, cols, 5.0, n_iters=400, capacity=256, opt=opt, cfg=CFG,
        pcfg=pcfg, sh_degree=1, scale_big_gauss=False, logger=logger,
        stage="test")
    assert int(jnp.sum(ts.gaussians.alive)) >= len(pts)

    d = full_train.state_to_hierarchy(ts)
    assert d.pos.shape[0] == 2 * int(jnp.sum(ts.gaussians.alive)) - 1

    post = PostConfig(spt_root_volume=1e-6, min_spt_size=4,
                      lambda_opacity=0.0)
    ts_post = full_train.post_optimize(
        d, views, 5.0, n_iters=20, capacity=1024, opt=opt, post=post,
        cfg=CFG, pcfg=pcfg, logger=logger)
    assert np.isfinite(float(jnp.sum(ts_post.gaussians.xyz))), "post diverged"

    final = post_mod.state_to_dhier(ts_post.gaussians)
    # merged (single chunk) hierarchy still renders at full detail with
    # reasonable fidelity vs the gt views
    m = merge.merge_hierarchies([final], np.zeros((1, 3), np.float32))
    st = post_mod.create_from_dhier(m, capacity=2048)
    results = eval_mod.eval_views(
        st, views, [np.asarray(v.image) for v in views],
        levels=[1e-9], budget=1024, cfg=CFG, k_max=256)
    assert results[0].psnr > 17.0, results

    # metrics were written
    lines = open(str(tmp_path / "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) > 0


def test_eval_levels_decrease_detail():
    pts, cols, views = synthetic_views(seed=5)
    ts = full_train.train_flat_scene(
        views, pts, cols, 5.0, n_iters=5, capacity=256,
        opt=OptimizationConfig(densify_until_iter=0), cfg=CFG,
        pcfg=full_train.PipelineConfig(k_max=256, mh_walk=False),
        sh_degree=1, scale_big_gauss=False)
    d = full_train.state_to_hierarchy(ts)
    st = post_mod.create_from_dhier(d, capacity=512)
    res = eval_mod.eval_views(
        st, views[:1], [np.asarray(views[0].image)],
        levels=[1e-9, 0.05], budget=512, cfg=CFG, k_max=256)
    assert res[0].mean_rendered >= res[1].mean_rendered
    assert res[0].psnr >= res[1].psnr - 1.0


def test_section_timers():
    t = SectionTimers()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2 and t.totals["a"] >= 0


def test_post_optimize_with_occlusion_culling():
    """use_occlusion_culling wiring (reference train_post.py:344-351): the
    working-set cut is refined by a low-res visibility pre-pass. Smoke:
    the flag routes through post_optimize and training stays finite."""
    pts, cols, views = synthetic_views(seed=7)
    ts = full_train.train_flat_scene(
        views, pts, cols, 5.0, n_iters=5, capacity=256,
        opt=OptimizationConfig(densify_until_iter=0), cfg=CFG,
        pcfg=full_train.PipelineConfig(k_max=256, mh_walk=False),
        sh_degree=1, scale_big_gauss=False)
    d = full_train.state_to_hierarchy(ts)
    post = PostConfig(spt_root_volume=1e-6, min_spt_size=4,
                      lambda_opacity=0.0, use_occlusion_culling=True)
    pcfg = full_train.PipelineConfig(post_densify_interval=10_000,
                                     k_max=256, mh_walk=False)
    ts_post = full_train.post_optimize(
        d, views, 5.0, n_iters=4, capacity=1024,
        opt=OptimizationConfig(), post=post, cfg=CFG, pcfg=pcfg)
    assert np.isfinite(float(jnp.sum(ts_post.gaussians.xyz)))
