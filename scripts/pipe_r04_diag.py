"""Bisect the flat ring-holdout tau curve of PIPELINE_r04 (directive #2).

The LOD machinery is proven monotone on exact hierarchies
(LODFIDELITY_r04 + tests), so the flatness comes from the TRAINED model.
Three experiments on the saved merged.dhier:

  A. tau sweep on TRAIN views — if tau0 wins there but not on holdouts,
     the fine leaves carry view-overfit detail, not scene detail.
  B. tau sweep on ring holdouts at 1024p (GT re-rendered at 1024) — if
     tau0 wins at 2x resolution, the 512p eval undersamples the detail
     the leaves carry (coarse cuts then act as a denoiser at 512p).
  C. per-chunk PRE-MERGE sweep on that chunk's own holdout views — if a
     single chunk is monotone but the merged tree is not, the merge
     (falloff/root graft) is implicated.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/tpu_pipe_scale_r04"


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
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.data import dhier as dhier_io
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.train import post as post_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from lod_fidelity_probe import structured_colors

    CFG_FULL = RasterizerConfig(backend="pallas", tile_w=16, tile_h=16,
                                max_dup=1 << 22, tight_binning=True)
    CAP = 1 << 18
    taus = [0.0, 3.0, 6.0, 15.0]

    # ---- reconstruct the GT model + cameras exactly as the scale script
    rng = np.random.default_rng(7)
    per = 55_000
    centers = np.array([[-1.5, -1.5, 5.0], [1.5, -1.5, 5.0],
                        [-1.5, 1.5, 5.0], [1.5, 1.5, 5.0]], np.float32)
    pts = np.concatenate([
        (rng.normal(size=(per, 3)) * [0.8, 0.8, 0.5] + c).astype(np.float32)
        for c in centers])
    cols = structured_colors(pts)
    gt_state = gm.create_from_points(pts, cols, capacity=CAP, sh_degree=1,
                                     opacity_init=0.8)
    act = gm.activate(gt_state)

    def cam_at(pos, look, W, H):
        fwd = look - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], axis=0)
        return make_camera(Rwc.T, -Rwc @ pos, 1.0, 1.0, W, H)

    def ring_cams(W, H):
        cams = []
        for c in centers:
            for k in range(12):
                ang = 2 * np.pi * (k + 0.5) / 12
                pos = c + np.array([1.1 * np.cos(ang), 1.1 * np.sin(ang),
                                    -3.5], np.float32)
                cams.append(cam_at(pos.astype(np.float64),
                                   c.astype(np.float64), W, H))
        return cams

    CFG_1024 = dataclasses.replace(CFG_FULL, max_dup=1 << 23)

    def render_gt(cam):
        cfg = CFG_1024 if cam.width > 512 else CFG_FULL
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=1, width=cam.width, height=cam.height, cfg=cfg,
            k_max=1024)
        assert not bool(out.truncated)
        return out.image

    merged = dhier_io.load_dhier(os.path.join(OUT, "merged.dhier"))
    cap_m = 1 << int(np.ceil(np.log2(merged.pos.shape[0] + 1)))
    st = post_mod.create_from_dhier(merged, capacity=cap_m)

    def sweep(state, cams, label, budget=1 << 19, cfg=None):
        gts, views = [], []
        for i, cam in enumerate(cams):
            img = render_gt(cam)
            gts.append(np.asarray(img))
            views.append(dataclasses.replace(cam, image=img,
                                             exposure_idx=i))
        res = eval_mod.eval_views(state, views, gts, levels=taus,
                                  level_is_tau=True, budget=budget,
                                  cfg=cfg or CFG_FULL, k_max=1024,
                                  warn=lambda *a, **k: None)
        rows = []
        for tau, r in zip(taus, res):
            print(f"[{label}] tau {tau:g}: PSNR {r.psnr:.2f} SSIM "
                  f"{r.ssim:.4f} rendered {r.mean_rendered:.0f}",
                  flush=True)
            rows.append(dict(tau=tau, psnr=round(r.psnr, 3),
                             ssim=round(r.ssim, 4),
                             mean_rendered=round(r.mean_rendered, 1)))
        return rows

    rec = {}
    skip_a = os.environ.get("DIAG_SKIP_A", "") == "1"
    # A: train views (8 of them, one per cluster x2)
    cams512 = ring_cams(512, 512)
    if not skip_a:
        train_sample = [cams512[i] for i in (1, 2, 13, 14, 25, 26, 37, 38)]
        rec["A_train_views_512"] = sweep(st, train_sample, "A train 512")

        # holdout sample at 512 (same-session pairing for B)
        hold_sample = [cams512[i] for i in (0, 3, 12, 15, 24, 27, 36, 39)]
        rec["ref_holdout_512"] = sweep(st, hold_sample, "holdout 512")

    # B: holdouts at 1024p
    cams1024 = ring_cams(1024, 1024)
    hold_1024 = [cams1024[i] for i in (0, 3, 12, 15, 24, 27, 36, 39)]
    rec["B_holdout_1024"] = sweep(st, hold_1024, "B holdout 1024",
                                  cfg=CFG_1024)

    # C: chunk (0,0) pre-merge on its own holdout cams
    cpath = os.path.join(OUT, "chunk_0_0")
    cand = [f for f in os.listdir(cpath) if f.endswith(".dhier")]
    if cand:
        d0 = dhier_io.load_dhier(os.path.join(cpath, cand[0]))
        cap0 = 1 << int(np.ceil(np.log2(d0.pos.shape[0] + 1)))
        st0 = post_mod.create_from_dhier(d0, capacity=cap0)
        rec["C_chunk00_premerge_512"] = sweep(
            st0, [cams512[i] for i in (0, 3, 6, 9)], "C chunk00 512")
    else:
        print("no chunk dhier found:", os.listdir(cpath), flush=True)

    with open(os.path.join(ROOT, "PIPEDIAG_r04.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("DIAG DONE", flush=True)


if __name__ == "__main__":
    main()
