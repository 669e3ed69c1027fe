"""Render facade: project -> bin -> blend.

TPU counterpart of the reference's gaussian_renderer/__init__.py entry
points (`render`, `render_coarse`, `render_post`, `render_vanilla`): one
functional pipeline with options instead of five near-copies. Hierarchy
(parent-interpolated) rendering passes pre-interpolated parameters plus
per-Gaussian (ts, kids) for the in-kernel LOD alpha correction — mirroring
the reference's `interp_python=True` path which is what training/eval use
(gaussian_renderer/__init__.py:241-401).

``xy_offset`` is the differentiable screen-space hook playing the role of
the reference's ``screenspace_points`` tensor (gaussian_renderer/__init__.py:45-52):
a zero [N,2] array added to the projected means so that
``jax.grad(..., argnums=xy_offset)`` yields the per-Gaussian 2D position
gradients that drive densification (scene/gaussian_model.py:1522-1530).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
from hlod_gaussians_tpu.ops.binning import bin_gaussians
from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan
from hlod_gaussians_tpu.utils.camera import Camera


class RenderResult(NamedTuple):
    image: jnp.ndarray        # [3, H, W] color (bg composited, pre-exposure)
    invdepth: jnp.ndarray     # [H, W] expected inverse depth
    final_t: jnp.ndarray      # [H, W] final transmittance
    n_contrib: jnp.ndarray    # [H, W] int32
    seen: jnp.ndarray         # [N] bool — Gaussian contributed to some pixel
    radii: jnp.ndarray        # [N] int32 — screen-space radius (0 = culled)
    visible: jnp.ndarray      # [N] bool — survived culling (radii > 0)
    truncated: jnp.ndarray    # scalar bool — a tile exceeded its entry budget


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "use_lod"))
def render_arrays(
    means3d: jnp.ndarray,       # [N,3]
    scales: jnp.ndarray,        # [N,3] linear (activated)
    quats: jnp.ndarray,         # [N,4] normalized
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
    xy_offset: Optional[jnp.ndarray] = None,
    *,
    sh_degree: int,
    width: int, height: int,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_lod: bool = False,
) -> RenderResult:
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

    xy = proj.xy if xy_offset is None else proj.xy + xy_offset

    color = sh_ops.sh_color(sh_degree, shs, means3d, campos)

    bins = bin_gaussians(
        jax.lax.stop_gradient(xy), jax.lax.stop_gradient(proj.depth),
        proj.radius, proj.valid,
        width, height, cfg.tile_w, cfg.tile_h, cfg.max_dup)

    invdepth_g = 1.0 / jnp.maximum(proj.depth, 1e-6)
    out = rasterize_scan(
        bins, xy, proj.conic, proj.opacity, color, invdepth_g, bg,
        ts if use_lod else None, kids if use_lod else None,
        width=width, height=height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        k_max=k_max, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min)
    return RenderResult(
        image=out.image, invdepth=out.invdepth, final_t=out.final_t,
        n_contrib=out.n_contrib, seen=out.seen, radii=proj.radius,
        visible=proj.valid, truncated=out.truncated)


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """Per-image 3x4 affine color transform (reference
    gaussian_renderer/__init__.py:150-153): out = A @ rgb + b per pixel."""
    c, h, w = image.shape
    flat = image.reshape(3, -1)
    out = exposure[:3, :3] @ flat + exposure[:3, 3:4]
    return out.reshape(c, h, w)


def render(gaussian_arrays, camera: Camera, bg, *, sh_degree: int,
           cfg: RasterizerConfig = RasterizerConfig(), k_max: int = 1024,
           antialiasing: bool = False) -> RenderResult:
    """Convenience wrapper over render_arrays for a Camera + param dict."""
    g = gaussian_arrays
    return render_arrays(
        g["means3d"], g["scales"], g["quats"], g["opacities"], g["shs"],
        g["valid"], camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, jnp.asarray(bg),
        sh_degree=sh_degree, width=camera.width, height=camera.height,
        cfg=cfg, k_max=k_max, antialiasing=antialiasing)
