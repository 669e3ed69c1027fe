"""PIPELINE_r05: end-to-end pipeline one order of magnitude up
(VERDICT r04 #5) — 2.25M GT leaves, 3x3 chunks, >=4M merged nodes, full
composed pipeline (coarse scaffold -> scaffold-conditioned chunks ->
hierarchy build -> SPT post + MCMC densify -> merge -> tau sweep on
held-out views), recording per-stage walls, peak host RSS and device HBM,
and the ring-heldout tau curve (must be monotone with >= 1 dB spread).

Also the acceptance run for the r05 compile-wall fixes (VERDICT #4): the
post_densify stage wall must come in <= 350 s (was 1117 s in r04 at a
QUARTER of this scale, dominated by per-chunk MCMC recompiles).

Scene recipe follows PIPELINE_r04 (structured-color surface shells,
interleaved ring test cams) scaled 9 clusters x 250k.
Writes PIPELINE_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/tpu_pipe_scale_r05"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    from hlod_gaussians_tpu import eval as eval_mod, render as render_mod
    from hlod_gaussians_tpu.config import (ModelConfig, OptimizationConfig,
                                           PostConfig, RasterizerConfig)
    from hlod_gaussians_tpu.data.scene import SceneInfo
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.pipeline import full_train
    from hlod_gaussians_tpu.train import post as post_mod
    from hlod_gaussians_tpu.utils.camera import make_camera
    from hlod_gaussians_tpu.utils.metrics import MetricsLogger

    W = H = 512
    CFG = RasterizerConfig(backend="pallas", tile_w=16, tile_h=16,
                           max_dup=1 << 22, tight_binning=True)
    CFG_FULL = RasterizerConfig(backend="pallas", tile_w=16, tile_h=16,
                                max_dup=1 << 23, tight_binning=True)
    CAP = 1 << 19                    # per-chunk capacity
    CAP_GT = 1 << 22                 # 2.25M GT leaves / coarse cloud

    # ---- ground truth: 3x3 grid of spherical shells, 250k each ----------
    from lod_fidelity_probe import structured_colors
    rng = np.random.default_rng(7)
    per = 250_000
    grid = [-3.0, 0.0, 3.0]
    centers = np.array([[x, y, 5.0] for y in grid for x in grid], np.float32)
    parts = []
    for c in centers:
        d = rng.normal(size=(per, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True).clip(1e-9)
        r = 0.7 + rng.normal(0, 0.01, (per, 1))
        parts.append((c + d * r).astype(np.float32))
    pts = np.concatenate(parts)
    cols = structured_colors(pts)
    gt_state = gm.create_from_points(pts, cols, capacity=CAP_GT, sh_degree=1,
                                     opacity_init=0.92)
    act = gm.activate(gt_state)

    def cam_at(pos, look):
        fwd = look - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], axis=0)
        T = -Rwc @ pos
        return make_camera(Rwc.T, T, 1.0, 1.0, W, H)

    ring_n = 12
    cams = []
    for c in centers:
        for k in range(ring_n):
            ang = 2 * np.pi * (k + 0.5) / ring_n
            pos = c + np.array([1.1 * np.cos(ang), 1.1 * np.sin(ang), -3.5],
                               np.float32)
            cams.append(cam_at(pos.astype(np.float64), c.astype(np.float64)))
    global_cams = []
    for k in range(4):
        ang = 2 * np.pi * k / 4
        pos = np.array([3.5 * np.cos(ang), 3.5 * np.sin(ang), -3.0])
        global_cams.append(cam_at(pos, np.array([0.0, 0.0, 5.0])))
    cams = cams + global_cams

    t0 = time.perf_counter()
    views = []
    for i, cam in enumerate(cams):
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=1, width=W, height=H, cfg=CFG_FULL, k_max=1024)
        assert not bool(out.truncated), f"GT render {i} truncated"
        views.append(dataclasses.replace(cam, image=out.image,
                                         exposure_idx=i))
    print(f"GT renders: {len(views)} views in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    n_ring = len(centers) * ring_n
    train_views = [v for i, v in enumerate(views[:n_ring]) if i % 3 != 0]
    ring_test_views = [v for i, v in enumerate(views[:n_ring]) if i % 3 == 0]
    global_test_views = views[n_ring:]

    class FakeInfo:
        def __init__(self, v):
            self.v = v
            self.R = np.eye(3)
            self.T = -np.asarray(v.campos)

    scene = SceneInfo(points=pts, colors=cols,
                      train_cameras=[FakeInfo(v) for v in train_views],
                      test_cameras=[], extent=9.0,
                      center=np.zeros(3, np.float32))

    pcfg = full_train.PipelineConfig(
        coarse_iters=600, chunk_iters=1500, post_iters=800, skybox_num=1024,
        coarse_capacity=CAP_GT, chunk_capacity=CAP, k_max=1024, mh_walk=True,
        densification_interval=10_000, densify_from_iter=10_000,
        opacity_reset_interval=100_000, post_densify_interval=400,
        chunk_size=2.9, chunk_point_padding=0.15)
    opt = OptimizationConfig(iterations=1500, densify_until_iter=0,
                             densify_grad_threshold=1e8)
    post = PostConfig(spt_root_volume=1e-3, min_spt_size=64,
                      lambda_opacity=0.0, grow_fraction=0.005,
                      max_sh_degree=1)
    mcfg = ModelConfig(sh_degree=1)

    mpath = os.path.join(WORK, "metrics.jsonl")
    resumed = os.path.exists(mpath)
    logger = MetricsLogger(mpath)
    t0 = time.perf_counter()
    merged = full_train.run_pipeline(
        scene, view_loader=lambda ci: ci.v, output_dir=WORK,
        pcfg=pcfg, opt=opt, post=post, cfg=CFG, mcfg=mcfg, logger=logger,
        skip_if_exists=True)
    t_total = time.perf_counter() - t0
    logger.close()
    print(f"pipeline total: {t_total:.0f}s, merged nodes "
          f"{merged.nodes.shape[0]}", flush=True)
    assert merged.nodes.shape[0] >= 4_000_000, merged.nodes.shape

    # gap-capped consecutive deltas attributed to the later entry's stage:
    # min/max-ts spans are polluted by tunnel stalls / skip_if_exists
    # resumes (the metrics file accumulates across runs)
    entries = sorted((json.loads(l) for l in open(mpath)),
                     key=lambda d: d["ts"])
    stage_walls = {}
    prev = None
    for d in entries:
        s = d.get("stage", "?").split("(")[0].rstrip("0123456789")
        if prev is not None and 0 <= d["ts"] - prev["ts"] <= 120:
            stage_walls[s] = stage_walls.get(s, 0.0) + d["ts"] - prev["ts"]
        prev = d
    stage_walls = {s: round(v, 1) for s, v in stage_walls.items()}
    print("stage walls (gap-capped):", stage_walls, flush=True)

    from hlod_gaussians_tpu.models.gaussians import NODE_DEPTH
    depth = int(merged.nodes[:, NODE_DEPTH].max())
    print(f"max tree depth: {depth}", flush=True)
    assert depth > 12, depth

    import resource
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    try:
        ms = jax.devices()[0].memory_stats() or {}
        hbm_gb = ms.get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        hbm_gb = -1.0

    cap_m = 1 << int(np.ceil(np.log2(merged.pos.shape[0] + 1)))
    st = post_mod.create_from_dhier(merged, capacity=cap_m)
    taus = [0.0, 3.0, 6.0, 15.0]

    def sweep_for(vs, label):
        gts = [np.asarray(v.image) for v in vs]
        t0 = time.perf_counter()
        res = eval_mod.eval_views(
            st, vs, gts, levels=taus, level_is_tau=True,
            budget=1 << 20, cfg=CFG_FULL, k_max=1024,
            warn=lambda *a, **k: None)
        rows = []
        for tau, r in zip(taus, res):
            print(f"[{label}] tau {tau:g}: PSNR {r.psnr:.2f} SSIM "
                  f"{r.ssim:.3f} GMSD {r.gmsd:.4f} rendered "
                  f"{r.mean_rendered:.0f}", flush=True)
            rows.append(dict(tau=tau, psnr=round(r.psnr, 3),
                             ssim=round(r.ssim, 4), gmsd=round(r.gmsd, 5),
                             mean_rendered=round(r.mean_rendered, 1)))
        print(f"[{label}] sweep: {time.perf_counter() - t0:.0f}s",
              flush=True)
        return rows

    sweep = sweep_for(ring_test_views, "ring-heldout")
    sweep_g = sweep_for(global_test_views, "global-orbit")

    assert sweep[0]["psnr"] > 20.0, sweep
    assert sweep[0]["mean_rendered"] > sweep[-1]["mean_rendered"]
    spread = sweep[0]["psnr"] - sweep[-1]["psnr"]
    print(f"ring-heldout tau0 - tau15 = {spread:+.2f} dB", flush=True)
    assert spread >= 1.0, (spread, sweep)

    rec = dict(
        provenance="single v5e via remote tunnel; synthetic 9-cluster "
                   "scene, 2.25M GT leaves with structured multi-band "
                   "colors, 512x512, 72 train / 36 interleaved ring test "
                   "+ 4 never-trained orbit views; full composed pipeline "
                   "(coarse->chunks->hierarchy->post+MCMC->merge) with the "
                   "r05 compile-wall fixes (exposure stripping, shape "
                   "buckets)"
                   + (" — resumed via skip_if_exists" if resumed else ""),
        pipeline_seconds=round(t_total, 1),
        stage_walls=stage_walls,
        stage_walls_method="gap-capped consecutive deltas (120 s) per stage",
        merged_nodes=int(merged.nodes.shape[0]),
        max_tree_depth=depth,
        n_chunks=9,
        n_gt_leaves=int(pts.shape[0]),
        peak_host_rss_gb=round(rss_gb, 1),
        peak_hbm_gb=round(hbm_gb, 2),
        tau_sweep_ring_heldout=sweep,
        tau0_minus_tau15_db=round(spread, 2),
        tau_sweep_global_orbit=sweep_g)
    with open(os.path.join(ROOT, "PIPELINE_r05.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("TPU PIPELINE SCALE r05 OK", flush=True)


if __name__ == "__main__":
    main()
