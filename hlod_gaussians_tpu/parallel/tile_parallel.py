"""Tile-parallel rendering: one frame sharded across chips.

The image-space analogue of sequence parallelism (SURVEY §5): per-tile
blends are independent, so the tile grid shards across the `tile` mesh axis
— every device projects + bins the (replicated) Gaussians against ITS
horizontal band of the image and blends only its own tiles. The only
cross-chip traffic is the implicit gather of the final image shards; in
training, parameter gradients all-reduce over the same axis.

Implemented with `shard_map` over a 1-D tile mesh: the band decomposition
keeps every shape static per shard (bands = whole tile rows).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
from hlod_gaussians_tpu.ops.binning import align_bins, bin_gaussians, tile_grid


def render_tile_parallel(
    means3d, scales, quats, opacities, shs, valid,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    mesh: Mesh,
    *,
    sh_degree: int, width: int, height: int,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    axis: str = "tile",
):
    """Render one frame with the pixel rows sharded over `axis`.

    Gaussians are replicated; each device culls/bins against its band and
    blends its own tiles. Returns the assembled [3, H, W] image.
    """
    n_dev = mesh.shape[axis]
    gw, gh = tile_grid(width, height, cfg.tile_w, cfg.tile_h)
    assert gh % n_dev == 0, f"tile rows {gh} must divide over {n_dev} devices"
    band_h = (gh // n_dev) * cfg.tile_h

    from jax import shard_map

    def band(fn_idx, xy):
        """Shift projected y into band-local coordinates."""
        return xy - jnp.asarray([0.0, band_h]) * fn_idx

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False)
    def _render(means3d, scales, quats, opacities, shs, valid,
                world_view, full_proj, campos, tfx, tfy, bg):
        idx = jax.lax.axis_index(axis)
        focal_x = width / (2.0 * tfx)
        focal_y = height / (2.0 * tfy)
        cov6 = gaussian_math.compute_cov3d(scales, quats)
        proj = gaussian_math.project_gaussians(
            means3d, cov6, opacities, world_view, full_proj,
            width, height, focal_x, focal_y, tfx, tfy,
            dilation=cfg.dilation, near=cfg.near, valid_in=valid)
        color = sh_ops.sh_color(sh_degree, shs, means3d, campos)

        # band-local pixel space: shift y so this device's band starts at 0
        xy_local = proj.xy - jnp.stack(
            [jnp.zeros(()), (band_h * idx).astype(jnp.float32)])
        in_band = ((xy_local[:, 1] + proj.radius) >= 0) \
            & ((xy_local[:, 1] - proj.radius) < band_h)
        valid_b = proj.valid & in_band

        if cfg.backend == "pallas":
            from hlod_gaussians_tpu.ops import rasterize_pallas as rp
            from hlod_gaussians_tpu.ops.rasterize import rasterize_tiles
            bins = bin_gaussians(
                jax.lax.stop_gradient(xy_local),
                jax.lax.stop_gradient(proj.depth), proj.radius, valid_b,
                width, band_h, cfg.tile_w, cfg.tile_h, cfg.max_dup // n_dev)
            abins = align_bins(bins, gw * (gh // n_dev), rp.CHUNK)
            out = rasterize_tiles(
                abins, xy_local, proj.conic, proj.opacity, color,
                1.0 / jnp.maximum(proj.depth, 1e-6), bg,
                width=width, height=band_h, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min)
        else:
            from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan
            bins = bin_gaussians(
                jax.lax.stop_gradient(xy_local),
                jax.lax.stop_gradient(proj.depth), proj.radius, valid_b,
                width, band_h, cfg.tile_w, cfg.tile_h, cfg.max_dup // n_dev)
            out = rasterize_scan(
                bins, xy_local, proj.conic, proj.opacity, color,
                1.0 / jnp.maximum(proj.depth, 1e-6), bg,
                width=width, height=band_h, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, k_max=k_max, t_eps=cfg.t_eps,
                alpha_min=cfg.alpha_min)
        return out.image  # [3, band_h, width] -> stacked over axis

    img = _render(means3d, scales, quats, opacities, shs, valid,
                  world_view, full_proj, campos,
                  jnp.asarray(tan_fovx, jnp.float32),
                  jnp.asarray(tan_fovy, jnp.float32), jnp.asarray(bg))
    # out_specs P(axis) shards the leading dim; reassemble to [3, H, W]
    return img.reshape(n_dev, 3, band_h, width).transpose(1, 0, 2, 3) \
        .reshape(3, n_dev * band_h, width)[:, :height]
