"""Evaluation harness: granularity sweeps with PSNR/SSIM(/LPIPS).

Re-design of the reference's two evaluation protocols:
* tau sweep over a box-metric hierarchy (render_hierarchy.py:32-141):
  threshold = 2*(tau+0.5)*tanfovx/(0.5*W), tau in {0, 3, 6, 15} px;
* granularity-limit sweep over the dynamic hierarchy
  (eval_hierarchy_dynamic.py:30-73): limit in {0, 0.01, 0.1}.

Both drive render_lod over the test split and report PSNR/SSIM per level.
LPIPS is optional (see ops/lpips.py — requires local VGG weights; the
environment has no egress, so it degrades to None rather than downloading).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import render as render_mod
from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.ops import perceptual
from hlod_gaussians_tpu.ops import ssim as ssim_ops
from hlod_gaussians_tpu.utils.camera import Camera

DEFAULT_TAUS = (0.0, 3.0, 6.0, 15.0)         # render_hierarchy.py:129
DEFAULT_LIMITS = (0.0, 0.01, 0.1)            # eval_hierarchy_dynamic.py:50


@dataclasses.dataclass
class EvalResult:
    level: float
    psnr: float
    ssim: float
    lpips: Optional[float]       # None without local VGG weights
    gmsd: float                  # weights-free perceptual (lower = better)
    mean_rendered: float


def eval_views(
    state: GaussianState,
    cameras: Sequence[Camera],
    gt_images: Sequence[np.ndarray],     # [3,H,W] each
    levels: Sequence[float] = DEFAULT_LIMITS,
    *,
    level_is_tau: bool = False,
    boxes=None,                          # (box_lo, box_hi, max_side) for the
                                         # upstream box metric (tau protocol)
    budget: int = 1 << 18,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    bg=(0.0, 0.0, 0.0),
    antialiasing: bool = False,
    lpips_fn=None,
    warn=None,
) -> List[EvalResult]:
    """Sweep granularity levels over the test split.

    With ``level_is_tau`` levels are pixel granularities converted per view
    (render_hierarchy.py:56); pass ``boxes`` (e.g. from
    hierarchy.boxes.compute_node_boxes or a loaded .hier) to cut on the
    reference's projected-box metric instead of the dynamic one.
    """
    import warnings
    _warn = warn if warn is not None else (
        lambda msg: warnings.warn(msg, stacklevel=3))
    if lpips_fn is None:
        _warn("LPIPS unavailable (no local VGG weights) — reporting "
              "PSNR/SSIM only")
    assert len(cameras) == len(gt_images), (
        f"{len(cameras)} cameras vs {len(gt_images)} gt images")
    if boxes is not None:
        boxes = tuple(jnp.asarray(np.asarray(b, np.float32)) for b in boxes)
    act = gm.activate(state)
    # one parent gather for the whole sweep: per-frame cuts are gather-free
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    if boxes is not None:
        pcache = cut_mod.build_parent_cache_box(state.nodes, *boxes)
    else:
        pcache = cut_mod.build_parent_cache(
            state.nodes, act.means3d, jnp.max(act.scales.T, axis=0))
    # one child+parent feature table for the whole sweep: per-frame
    # interpolation is a single wide gather
    itab = cut_mod.build_interp_table(
        dict(means3d=act.means3d, scales=act.scales, quats=act.quats,
             opacities=act.opacities, shs=act.shs), state.nodes)
    out: List[EvalResult] = []
    for level in levels:
        psnr_sum = ssim_sum = lpips_sum = gmsd_sum = n_sum = 0.0
        n_truncated = n_capped = 0
        for cam, gt in zip(cameras, gt_images):
            if level_is_tau:
                target = float(render_mod.tau_to_threshold(
                    level, float(cam.tan_fovx), cam.width))
            else:
                target = level
            res, n_sel = render_mod.render_lod(
                act.means3d, act.scales, act.quats, act.opacities, act.shs,
                state.nodes, state.alive,
                cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
                cam.tan_fovy, jnp.asarray(np.asarray(bg, np.float32)),
                max(target, 1e-12), boxes, None, pcache, None, itab,
                sh_degree=state.sh_degree, width=cam.width, height=cam.height,
                budget=budget, n_skybox=state.n_skybox, cfg=cfg, k_max=k_max,
                antialiasing=antialiasing)
            img = jnp.clip(res.image, 0.0, 1.0)
            gt_j = jnp.asarray(gt)
            psnr_sum += float(ssim_ops.psnr(img, gt_j))
            ssim_sum += float(ssim_ops.ssim(img, gt_j))
            gmsd_sum += float(perceptual.gmsd(img, gt_j))
            if lpips_fn is not None:
                lpips_sum += float(lpips_fn(img, gt_j))
            n_truncated += int(bool(res.truncated))
            n_capped += int(float(n_sel) > budget)
            # the render drops past-budget nodes — report what rendered
            n_sum += min(float(n_sel), float(budget))
        if n_truncated or n_capped:
            _warn(f"level {level}: {n_truncated} view(s) truncated "
                  f"(cfg.max_dup) and {n_capped} over the node budget "
                  f"({budget}) — metrics are degraded; raise max_dup/"
                  "budget for exact numbers")
        m = max(len(cameras), 1)
        out.append(EvalResult(
            level=level, psnr=psnr_sum / m, ssim=ssim_sum / m,
            lpips=(lpips_sum / m) if lpips_fn is not None else None,
            gmsd=gmsd_sum / m,
            mean_rendered=n_sum / m))
    return out
