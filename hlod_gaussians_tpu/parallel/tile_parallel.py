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
from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                            bin_gaussians_aligned, tile_grid)


def render_tile_parallel(
    means3d, scales, quats, opacities, shs, valid,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    mesh: Mesh,
    ts=None, kids=None,
    *,
    sh_degree: int, width: int, height: int,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    axis: str = "tile",
):
    """Render one frame with the pixel rows sharded over `axis`.

    Gaussians are replicated; each device culls/bins against its band and
    blends its own tiles. Optional (ts, kids) enable the in-kernel LOD
    alpha correction (hierarchy rendering). Returns the assembled
    [3, H, W] image.
    """
    n_dev = mesh.shape[axis]
    gw, gh = tile_grid(width, height, cfg.tile_w, cfg.tile_h)
    assert gh % n_dev == 0, f"tile rows {gh} must divide over {n_dev} devices"
    band_h = (gh // n_dev) * cfg.tile_h

    from jax import shard_map

    use_lod = ts is not None and kids is not None

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) * 14,
        out_specs=(P(axis), P(axis)),
        check_vma=False)
    def _render(means3d, scales, quats, opacities, shs, valid,
                world_view, full_proj, campos, tfx, tfy, bg, ts_r, kids_r):
        idx = jax.lax.axis_index(axis)
        focal_x = width / (2.0 * tfx)
        focal_y = height / (2.0 * tfy)
        cov6 = gaussian_math.compute_cov3d(scales, quats)
        # tight alpha-aware extents exactly as the single-chip production
        # path (render.py): ext/reff2 are relative half-extents, invariant
        # to the band-local y shift below
        tight = cfg.backend == "pallas" and cfg.tight_binning
        max_scale = jnp.max(scales, axis=-1)
        proj = gaussian_math.project_gaussians(
            means3d, cov6, opacities, world_view, full_proj,
            width, height, focal_x, focal_y, tfx, tfy,
            dilation=cfg.dilation, near=cfg.near, valid_in=valid,
            big_limit=cfg.big_limit, max_scale=max_scale)
        color = sh_ops.sh_color(sh_degree, shs, means3d, campos)

        # band-local pixel space: shift y so this device's band starts at 0.
        # The band membership test uses the tight y half-extent when
        # available (strictly contains every pixel the blend can touch),
        # else the reference's 3-sigma circle radius.
        xy_local = proj.xy - jnp.stack(
            [jnp.zeros(()), (band_h * idx).astype(jnp.float32)])
        r_y = proj.ext[:, 1] if tight else proj.radius
        in_band = ((xy_local[:, 1] + r_y) >= 0) \
            & ((xy_local[:, 1] - r_y) < band_h)
        valid_b = proj.valid & in_band

        if cfg.backend == "pallas":
            from hlod_gaussians_tpu.ops import rasterize_pallas as rp
            from hlod_gaussians_tpu.ops.rasterize import rasterize_tiles
            abins = bin_gaussians_aligned(
                jax.lax.stop_gradient(xy_local),
                jax.lax.stop_gradient(proj.depth), proj.radius, valid_b,
                width, band_h, cfg.tile_w, cfg.tile_h, cfg.max_dup // n_dev,
                rp.CHUNK,
                ext=jax.lax.stop_gradient(proj.ext) if tight else None,
                reff2=jax.lax.stop_gradient(proj.reff2) if tight else None)
            out = rasterize_tiles(
                abins, xy_local, proj.conic, proj.opacity, color,
                1.0 / jnp.maximum(proj.depth, 1e-6), bg,
                ts_r if use_lod else None, kids_r if use_lod else None,
                width=width, height=band_h, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min,
                tpb=cfg.tpb,
                interpret=jax.default_backend() == "cpu")
        else:
            from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan
            bins = bin_gaussians(
                jax.lax.stop_gradient(xy_local),
                jax.lax.stop_gradient(proj.depth), proj.radius, valid_b,
                width, band_h, cfg.tile_w, cfg.tile_h, cfg.max_dup // n_dev)
            out = rasterize_scan(
                bins, xy_local, proj.conic, proj.opacity, color,
                1.0 / jnp.maximum(proj.depth, 1e-6), bg,
                ts_r if use_lod else None, kids_r if use_lod else None,
                width=width, height=band_h, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, k_max=k_max, t_eps=cfg.t_eps,
                alpha_min=cfg.alpha_min)
        # [3, band_h, width] + per-band truncation flag, stacked over axis
        return out.image, out.truncated[None]

    n = means3d.shape[0]
    img, trunc = _render(means3d, scales, quats, opacities, shs, valid,
                         world_view, full_proj, campos,
                         jnp.asarray(tan_fovx, jnp.float32),
                         jnp.asarray(tan_fovy, jnp.float32), jnp.asarray(bg),
                         jnp.ones((n,), jnp.float32) if ts is None else ts,
                         jnp.ones((n,), jnp.int32) if kids is None else kids)
    # out_specs P(axis) shards the leading dim; reassemble to [3, H, W].
    # `truncated` = any band overflowed its max_dup/n_dev entry slots
    # (band-local binning capacity) — callers must surface it, same
    # discipline as RenderResult.truncated.
    img = img.reshape(n_dev, 3, band_h, width).transpose(1, 0, 2, 3) \
        .reshape(3, n_dev * band_h, width)[:, :height]
    return img, jnp.any(trunc)


def render_lod_tile_parallel(
    means3d, scales, quats, opacities, shs, nodes, alive,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    target_size, mesh: Mesh,
    boxes=None, pcache=None, interp_table=None,
    *,
    sh_degree: int, width: int, height: int,
    n_skybox: int = 0,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    axis: str = "tile",
    use_frustum: bool = True,
):
    """One hierarchical-LOD frame sharded across chips: replicated
    granularity cut (render.py::_compute_cut — the SAME selection rule as
    every other LOD entry point) + masked InterpTable lerp (cheap,
    elementwise), then the band-sharded blend of render_tile_parallel with
    the in-kernel LOD alpha correction. The multi-chip real-time story for
    big trees: the O(pixels) blend — the dominant per-frame cost — splits
    across the mesh while the O(nodes) cut stays replicated (~3 ms at 1M
    nodes). Skybox rows (depth = -1, excluded from every cut) are
    re-included via the mask with t = 1 — they live in the same arrays, so
    no concat is needed. Returns ([3, H, W] image, n_selected,
    truncated)."""
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.render import _compute_cut

    cut = _compute_cut(None, boxes, nodes, means3d, scales, alive, campos,
                       world_view, target_size, pcache, use_frustum)
    if interp_table is None:
        interp_table = cut_mod.build_interp_table(
            dict(means3d=means3d, scales=scales, quats=quats,
                 opacities=opacities, shs=shs), nodes)
    mask = cut.render_mask
    n_selected = jnp.sum(mask)
    ts = cut.ts
    if n_skybox > 0:
        sky = jnp.arange(means3d.shape[0]) < n_skybox
        mask = mask | (sky & alive)
        ts = jnp.where(sky, 1.0, ts)        # pass-through, no parent blend
    interp = cut_mod.interpolate_all_masked(interp_table, ts, mask)
    q = interp["quats"]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    img, truncated = render_tile_parallel(
        interp["means3d"], interp["scales"], q, interp["opacities"],
        interp["shs"], mask, world_view, full_proj, campos, tan_fovx,
        tan_fovy, bg, mesh, jnp.where(mask, ts, 1.0),
        jnp.maximum(cut.kids, 1),
        sh_degree=sh_degree, width=width, height=height, cfg=cfg,
        k_max=k_max, axis=axis)
    return img, n_selected, truncated
