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

    # rank of each entry within its tile
    pos = jnp.arange(max_dup, dtype=jnp.int32)
    tile = bins.sorted_tile
    in_range = tile < num_tiles
    tile_c = jnp.clip(tile, 0, num_tiles - 1)
    rank = pos - bins.tile_starts[tile_c]
    dst = jnp.where(in_range, aligned_starts[tile_c] + rank, cap)

    entry_gid = jnp.zeros((cap,), jnp.int32).at[dst].set(
        bins.sorted_gid, mode="drop")
    return AlignedBins(entry_gid=entry_gid, tile_starts=aligned_starts,
                       tile_counts=bins.tile_counts, overflow=bins.overflow)


def bin_gaussians(xy, depth, radius, valid, width: int, height: int,
                  tile_w: int, tile_h: int, max_dup: int) -> TileBins:
    """Build the sorted (tile, depth) dup list with static shapes."""
    n = xy.shape[0]
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    num_tiles = gw * gh

    min_x, min_y, rw, rh = compute_rects(xy, radius, width, height, tile_w, tile_h)
    touched = jnp.where(valid, rw * rh, 0).astype(jnp.int32)

    offsets = jnp.cumsum(touched)
    total = offsets[-1]
    offsets_exc = offsets - touched
    overflow = total > max_dup

    gid = jnp.repeat(jnp.arange(n, dtype=jnp.int32), touched,
                     total_repeat_length=max_dup)
    slot = jnp.arange(max_dup, dtype=jnp.int32)
    in_range = slot < total
    rank = slot - offsets_exc[gid]

    g_rw = jnp.maximum(rw[gid], 1)
    # integer div/mod by a VECTOR divisor scalarizes on TPU (~100x slower
    # than float math); ranks and widths are far below 2^24, so f32 division
    # is exact enough for a correct floor
    ty_rel = jnp.floor(rank.astype(jnp.float32)
                       / g_rw.astype(jnp.float32)).astype(jnp.int32)
    tx = min_x[gid] + rank - ty_rel * g_rw
    ty = min_y[gid] + ty_rel
    tile_id = jnp.where(in_range, ty * gw + tx, num_tiles).astype(jnp.int32)

    d = jnp.where(in_range, depth[gid], jnp.inf).astype(jnp.float32)
    sorted_tile, _, sorted_gid = jax.lax.sort((tile_id, d, gid), num_keys=2)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    tile_ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)

    return TileBins(sorted_gid=sorted_gid, sorted_tile=sorted_tile,
                    tile_starts=tile_starts,
                    tile_counts=tile_ends - tile_starts,
                    num_dup=jnp.minimum(total, max_dup),
                    overflow=overflow)
