"""Render facade: project -> bin -> blend.

TPU counterpart of the reference's gaussian_renderer/__init__.py entry
points (`render`, `render_coarse`, `render_post`, `render_vanilla`): one
functional pipeline with options instead of five near-copies. Hierarchy
(parent-interpolated) rendering passes pre-interpolated parameters plus
per-Gaussian (ts, kids) for the in-kernel LOD alpha correction — mirroring
the reference's `interp_python=True` path which is what training/eval use
(gaussian_renderer/__init__.py:241-401).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
from hlod_gaussians_tpu.ops.binning import bin_gaussians
from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan, RenderOut
from hlod_gaussians_tpu.utils.camera import Camera


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "use_lod"))
def render_arrays(
    means3d: jnp.ndarray,       # [N,3]
    scales: jnp.ndarray,        # [N,3] linear (activated)
    quats: jnp.ndarray,         # [N,4]
    opacities: jnp.ndarray,     # [N] in [0,1] (activated)
    shs: jnp.ndarray,           # [N,K,3]
    valid: jnp.ndarray,         # [N] bool alive mask
    world_view: jnp.ndarray,    # [4,4]
    full_proj: jnp.ndarray,     # [4,4]
    campos: jnp.ndarray,        # [3]
    tan_fovx, tan_fovy,
    bg: jnp.ndarray,            # [3]
    ts: Optional[jnp.ndarray] = None,
    kids: Optional[jnp.ndarray] = None,
    *,
    sh_degree: int,
    width: int, height: int,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_lod: bool = False,
) -> RenderOut:
    """Render activated Gaussian arrays. Fully differentiable."""
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    cov6 = gaussian_math.compute_cov3d(scales, quats)
    max_scale = jnp.max(scales, axis=-1)
    proj = gaussian_math.project_gaussians(
        means3d, cov6, opacities, world_view, full_proj,
        width, height, focal_x, focal_y, tan_fovx, tan_fovy,
        dilation=cfg.dilation, antialiasing=antialiasing, near=cfg.near,
        valid_in=valid, big_limit=cfg.big_limit, max_scale=max_scale)

    color = sh_ops.sh_color(sh_degree, shs, means3d, campos)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         width, height, cfg.tile_w, cfg.tile_h, cfg.max_dup)

    invdepth_g = 1.0 / jnp.maximum(proj.depth, 1e-6)
    return rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invdepth_g, bg,
        ts if use_lod else None, kids if use_lod else None,
        width=width, height=height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        k_max=k_max, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min)


def render(gaussian_arrays, camera: Camera, bg, *, sh_degree: int,
           cfg: RasterizerConfig = RasterizerConfig(), k_max: int = 1024,
           antialiasing: bool = False) -> RenderOut:
    """Convenience wrapper over render_arrays for a Camera + param dict."""
    g = gaussian_arrays
    return render_arrays(
        g["means3d"], g["scales"], g["quats"], g["opacities"], g["shs"],
        g["valid"], camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, jnp.asarray(bg),
        sh_degree=sh_degree, width=camera.width, height=camera.height,
        cfg=cfg, k_max=k_max, antialiasing=antialiasing)
