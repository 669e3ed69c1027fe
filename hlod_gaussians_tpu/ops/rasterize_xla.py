"""Reference-quality XLA rasterizer: sequential front-to-back tile blending.

This is the semantic twin of the CUDA renderCUDA blend loop
(hierarchy-rasterizer/cuda_rasterizer/forward.cu:450-596) expressed as a
`lax.scan` over per-tile entry slots: step k processes the k-th depth-sorted
Gaussian of EVERY tile simultaneously as dense [tiles, pixels] vector math.
Skips (power>0, alpha<1/255) and the early-out (T < 1e-4 => pixel done,
entry NOT applied) are encoded as masks, so results match the CUDA
serial-per-pixel semantics bit-for-bit in exact arithmetic.

Backward is plain JAX autodiff through the scan — used as the ground truth
for the hand-derived Pallas backward and for small-scene CPU tests. The
Pallas kernels in rasterize_pallas.py are the production TPU path.

Also implements the LOD alpha correction (forward.cu:546-554):
    kidsqrt_alpha = 1 - (1 - alpha)^(1/kids)
    alpha' = t * alpha + (1 - t) * kidsqrt_alpha
and blends inverse depth as a fourth channel (forward.cu:573-574).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu.ops.binning import TileBins, tile_grid


class RenderOut(NamedTuple):
    image: jnp.ndarray        # [3, H, W] color (bg composited)
    invdepth: jnp.ndarray     # [H, W] expected inverse depth
    final_t: jnp.ndarray      # [H, W] final transmittance
    n_contrib: jnp.ndarray    # [H, W] int32 — last contributing entry (1-based)
    seen: jnp.ndarray         # [N] bool — Gaussian contributed to some pixel
    truncated: jnp.ndarray    # scalar bool — some tile exceeded k_max entries


def lod_alpha(my_alpha, t, inv_kids):
    """LOD alpha correction (forward.cu:546-554)."""
    kidsqrt_alpha = 1.0 - jnp.power(1.0 - my_alpha, inv_kids)
    return t * my_alpha + (1.0 - t) * kidsqrt_alpha


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "k_max", "t_eps",
                     "alpha_min", "remat_chunk"))
def rasterize_scan(
    bins: TileBins,
    xy: jnp.ndarray,          # [N,2] pixel-space means
    conic: jnp.ndarray,       # [N,3]
    opacity: jnp.ndarray,     # [N]
    color: jnp.ndarray,       # [N,3]
    invdepth_g: jnp.ndarray,  # [N] per-Gaussian inverse depth (1/view_z)
    bg: jnp.ndarray,          # [3]
    ts: Optional[jnp.ndarray] = None,    # [N] interpolation weights or None
    kids: Optional[jnp.ndarray] = None,  # [N] sibling counts or None
    *,
    width: int, height: int, tile_w: int, tile_h: int, k_max: int,
    t_eps: float = 1e-4, alpha_min: float = 1.0 / 255.0,
    remat_chunk: int = 32,
) -> RenderOut:
    n = xy.shape[0]
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    num_tiles = gw * gh
    p = tile_w * tile_h

    # pixel centers per (tile, pixel-slot)
    t_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tx, ty = t_idx % gw, t_idx // gw
    p_idx = jnp.arange(p, dtype=jnp.int32)
    px = tx[:, None] * tile_w + p_idx[None, :] % tile_w     # [T,P]
    py = ty[:, None] * tile_h + p_idx[None, :] // tile_w
    pixf_x = px.astype(jnp.float32)
    pixf_y = py.astype(jnp.float32)
    inside = (px < width) & (py < height)

    max_dup = bins.sorted_gid.shape[0]

    use_lod = ts is not None and kids is not None
    if use_lod:
        inv_kids_g = 1.0 / jnp.maximum(kids, 1).astype(jnp.float32)
        ts_g = ts
    else:
        inv_kids_g = jnp.ones((n,), jnp.float32)
        ts_g = jnp.ones((n,), jnp.float32)

    color4 = jnp.concatenate([color, invdepth_g[:, None]], axis=-1)  # [N,4]

    def step(carry, k):
        t_run, done, acc, last_contrib, seen = carry
        entry = bins.tile_starts + k                        # [T]
        valid_entry = k < bins.tile_counts
        e_clamped = jnp.clip(entry, 0, max_dup - 1)
        gid = bins.sorted_gid[e_clamped]                    # [T]

        g_xy = xy[gid]                                      # [T,2]
        g_con = conic[gid]                                  # [T,3]
        g_op = opacity[gid]                                 # [T]
        g_c4 = color4[gid]                                  # [T,4]
        g_t = ts_g[gid]
        g_ik = inv_kids_g[gid]

        dx = g_xy[:, 0:1] - pixf_x                          # [T,P]
        dy = g_xy[:, 1:2] - pixf_y
        power = (-0.5 * (g_con[:, 0:1] * dx * dx + g_con[:, 2:3] * dy * dy)
                 - g_con[:, 1:2] * dx * dy)
        my_alpha = jnp.minimum(0.99, g_op[:, None] * jnp.exp(power))
        alpha = lod_alpha(my_alpha, g_t[:, None], g_ik[:, None]) if use_lod else my_alpha

        pre = (valid_entry[:, None] & inside & (power <= 0.0)
               & (alpha >= alpha_min) & (~done))
        test_t = t_run * (1.0 - alpha)
        trigger = pre & (test_t < t_eps)
        apply = pre & (~trigger)

        w = jnp.where(apply, alpha * t_run, 0.0)            # [T,P]
        acc = acc + w[:, :, None] * g_c4[:, None, :]
        t_run = jnp.where(apply, test_t, t_run)
        done = done | trigger
        last_contrib = jnp.where(apply, k + 1, last_contrib)
        seen = seen.at[gid].max(jnp.any(apply, axis=1))
        return (t_run, done, acc, last_contrib, seen), None

    fdtype = jnp.result_type(xy.dtype, conic.dtype, opacity.dtype, color.dtype)
    init = (
        jnp.ones((num_tiles, p), fdtype),
        jnp.zeros((num_tiles, p), bool),
        jnp.zeros((num_tiles, p, 4), fdtype),
        jnp.zeros((num_tiles, p), jnp.int32),
        jnp.zeros((n,), bool),
    )
    # Chunked scan with rematerialization: autodiff through a flat k_max-step
    # scan would store O(k_max) per-step [tiles, pixels] residuals (tens of GB
    # at 1080p). Grouping `remat_chunk` entries per outer step and
    # checkpointing the group bounds stored state to O(k_max / remat_chunk)
    # outer carries; inner steps are recomputed in backward — the same
    # trade the reference CUDA backward makes by re-traversing the tile list
    # (backward.cu:498-721).
    chunk = max(1, min(remat_chunk, k_max))
    n_chunks = -(-k_max // chunk)
    # the scan actually processes n_chunks*chunk entries per tile; flag
    # truncation against that bound, not k_max, so a tile fully rendered
    # within the rounded-up budget is not reported truncated
    k_bound = n_chunks * chunk

    def chunk_step(carry, k0):
        return jax.lax.scan(step, carry, k0 + jnp.arange(chunk, dtype=jnp.int32))

    (t_run, done, acc, last_contrib, seen), _ = jax.lax.scan(
        jax.checkpoint(chunk_step), init,
        jnp.arange(n_chunks, dtype=jnp.int32) * chunk)

    out4 = acc + t_run[:, :, None] * jnp.concatenate([bg, jnp.zeros(1)])[None, None, :]

    def untile(x):
        """[T, P, ...] -> [H, W, ...]"""
        extra = x.shape[2:]
        x = x.reshape((gh, gw, tile_h, tile_w) + extra)
        x = jnp.swapaxes(x, 1, 2).reshape((gh * tile_h, gw * tile_w) + extra)
        return x[:height, :width]

    img = untile(out4)
    truncated = jnp.any(bins.tile_counts > k_bound) | bins.overflow
    return RenderOut(
        image=jnp.moveaxis(img[..., :3], -1, 0),
        invdepth=img[..., 3],
        final_t=untile(t_run),
        n_contrib=untile(last_contrib),
        seen=seen,
        truncated=truncated,
    )
