"""Tile binning: duplicate Gaussians per overlapped tile and sort by depth.

TPU-native replacement for the CUDA duplicateWithKeys + CUB radix sort +
identifyTileRanges pipeline (reference rasterizer_impl.cu:70-142,319-373).

The CUDA version builds a dynamically-sized (tileID<<32 | depth-bits) key list
and radix-sorts it. Here the duplicated list has a static capacity `max_dup`
(validity masked), is built with `jnp.repeat(..., total_repeat_length=...)`,
and is sorted with a two-key lexicographic `jax.lax.sort` on
(tile_id, depth) — all fixed-shape XLA ops that run well on TPU.

Tile ranges come from a vectorized dual `searchsorted` instead of the
identifyTileRanges scatter kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    sorted_gid: jnp.ndarray    # [max_dup] int32 gaussian index per dup entry
    sorted_tile: jnp.ndarray   # [max_dup] int32 tile id (== num_tiles for padding)
    tile_starts: jnp.ndarray   # [num_tiles] int32 first dup entry of tile
    tile_counts: jnp.ndarray   # [num_tiles] int32 entries in tile
    num_dup: jnp.ndarray       # scalar int32 — total real dup entries
    overflow: jnp.ndarray      # scalar bool — true if max_dup was exceeded


def tile_grid(width: int, height: int, tile_w: int, tile_h: int):
    gw = -(-width // tile_w)
    gh = -(-height // tile_h)
    return gw, gh


def compute_rects(xy, radius, width: int, height: int, tile_w: int, tile_h: int):
    """Per-Gaussian tile rectangle (reference auxiliary.h getRect).

    Returns (min_x, min_y, w, h) in tile units, already clipped to the grid.
    """
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    r = radius.astype(jnp.float32)
    min_x = jnp.clip(jnp.floor((xy[..., 0] - r) / tile_w), 0, gw).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((xy[..., 1] - r) / tile_h), 0, gh).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((xy[..., 0] + r + tile_w - 1) / tile_w), 0, gw).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((xy[..., 1] + r + tile_h - 1) / tile_h), 0, gh).astype(jnp.int32)
    return min_x, min_y, jnp.maximum(max_x - min_x, 0), jnp.maximum(max_y - min_y, 0)


class AlignedBins(NamedTuple):
    """Chunk-aligned dup-entry layout for the Pallas blend kernels: every
    tile's range starts at a multiple of `chunk` so per-tile DMA slices of
    the entry/gradient buffers never overlap across tiles."""

    entry_gid: jnp.ndarray    # [cap] int32 gaussian index per entry (garbage in padding)
    tile_starts: jnp.ndarray  # [num_tiles] int32, chunk-aligned
    tile_counts: jnp.ndarray  # [num_tiles] int32 true counts
    overflow: jnp.ndarray     # scalar bool


def align_bins(bins: TileBins, num_tiles: int, chunk: int) -> AlignedBins:
    """Re-pack the sorted dup list so each tile's range is chunk-aligned.

    Output capacity is the static worst case max_dup + num_tiles * (chunk-1),
    rounded up to a multiple of `chunk`.
    """
    max_dup = bins.sorted_gid.shape[0]
    cap = max_dup + num_tiles * (chunk - 1)
    cap = -(-cap // chunk) * chunk

    padded = -(-bins.tile_counts // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])

    # rank of each entry within its tile; both per-tile lookups via one
    # stacked 2-D gather (1-D gathers scalarize on TPU)
    pos = jnp.arange(max_dup, dtype=jnp.int32)
    tile = bins.sorted_tile
    in_range = tile < num_tiles
    tile_c = jnp.clip(tile, 0, num_tiles - 1)
    tbl = jnp.stack([aligned_starts, bins.tile_starts], axis=0)   # [2, NT]
    gtb = jax.lax.optimization_barrier(tbl[:, tile_c])
    rank = pos - gtb[1]
    dst = jnp.where(in_range, gtb[0] + rank, cap)

    # 2-D scatter (leading unit row) keeps the fast scatter path
    entry_gid = jnp.zeros((1, cap), jnp.int32).at[:, dst].set(
        bins.sorted_gid[None], mode="drop")[0]
    return AlignedBins(entry_gid=entry_gid, tile_starts=aligned_starts,
                       tile_counts=bins.tile_counts, overflow=bins.overflow)


def bin_gaussians(xy, depth, radius, valid, width: int, height: int,
                  tile_w: int, tile_h: int, max_dup: int) -> TileBins:
    """Build the sorted (tile, depth) dup list with static shapes.

    TPU notes: all per-gaussian lookups go through ONE stacked [K, N]
    gather — separate 1-D gathers lower to a scalarized fusion that is
    ~12x slower at 2M entries; likewise integer div/mod by vector divisors
    scalarizes, so the rect decomposition runs in (exact) f32. The dup-list
    expansion is a searchsorted over the cumulative-counts table instead of
    jnp.repeat's internal gather chain, and tile ranges come from a
    segment-sum + exclusive cumsum over the sorted tile ids instead of two
    large searchsorted calls.
    """
    n = xy.shape[0]
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    num_tiles = gw * gh

    min_x, min_y, rw, rh = compute_rects(xy, radius, width, height, tile_w, tile_h)
    touched = jnp.where(valid, rw * rh, 0).astype(jnp.int32)

    offsets = jnp.cumsum(touched)
    total = offsets[-1]
    offsets_exc = (offsets - touched).astype(jnp.float32)
    overflow = total > max_dup

    slot = jnp.arange(max_dup, dtype=jnp.int32)
    # dup slot -> source gaussian (a jnp.searchsorted over the cumulative
    # counts would be 17 rounds of scalarizing 1-D gathers; repeat is faster)
    gid_c = jnp.repeat(jnp.arange(n, dtype=jnp.int32), touched,
                       total_repeat_length=max_dup)

    attrs = jnp.stack([
        offsets_exc, min_x.astype(jnp.float32), min_y.astype(jnp.float32),
        jnp.maximum(rw, 1).astype(jnp.float32), depth.astype(jnp.float32),
    ], axis=0)                                   # [5, N]
    g = jax.lax.optimization_barrier(attrs[:, gid_c])   # one fast 2-D gather

    in_range = slot < total
    rank = slot.astype(jnp.float32) - g[0]
    g_rw = g[3]
    ty_rel = jnp.floor(rank / g_rw)
    tx = g[1] + rank - ty_rel * g_rw
    ty = g[2] + ty_rel
    tile_id = jnp.where(in_range, ty * gw + tx,
                        float(num_tiles)).astype(jnp.int32)

    d = jnp.where(in_range, g[4], jnp.inf)
    sorted_tile, _, sorted_gid = jax.lax.sort((tile_id, d, gid_c), num_keys=2)

    ones = jnp.where(in_range, 1, 0)
    counts_all = jax.ops.segment_sum(ones, tile_id,
                                     num_segments=num_tiles + 1,
                                     indices_are_sorted=False)
    tile_counts = counts_all[:num_tiles].astype(jnp.int32)
    tile_starts = (jnp.cumsum(tile_counts) - tile_counts).astype(jnp.int32)

    return TileBins(sorted_gid=sorted_gid, sorted_tile=sorted_tile,
                    tile_starts=tile_starts,
                    tile_counts=tile_counts,
                    num_dup=jnp.minimum(total, max_dup),
                    overflow=overflow)
