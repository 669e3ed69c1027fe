"""High-level Pallas rasterization path with a hand-derived custom VJP.

Glue between the XLA preprocessing (projection, SH, binning — all
autodiff-traced) and the Pallas blend kernels (ops/rasterize_pallas.py).

Two hand-built custom-VJP boundaries replace what stock autodiff would do
with far more expensive ops:

* `_blend` — forward/backward Pallas kernels over the dense per-entry
  feature matrix (the CUDA renderCUDA fwd/bwd pair, forward.cu:450-596,
  backward.cu:498-721).
* `_expand` — the per-entry gather ``feats[:, entry_gid]``. Its stock VJP is
  a 4M-entry scatter-add (~70 ms at 1080p); instead, entries were generated
  per-Gaussian CONTIGUOUSLY (ops/binning.py), so the reduction becomes: map
  kernel gradients back to generation order (one wide gather via the
  `gen_to_slot` permutation), one cumulative sum, and per-Gaussian boundary
  differences — ~3x faster, and MATHEMATICALLY equal because every entry
  belongs to one Gaussian. Numerically the boundary difference of the f32
  running sum cancels to ~|prefix|*2^-24 absolute per segment (a late,
  faint Gaussian atop a large signed prefix can lose relative precision —
  below SGD noise in practice; a per-segment pairwise reduction is the
  upgrade path if gradient drift ever shows). This replaces the CUDA
  backward's global atomics (backward.cu:580-721), whose float atomics are
  themselves order-nondeterministic, with deterministic segment sums.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.ops import rasterize_pallas as rp
from hlod_gaussians_tpu.ops.binning import (AlignedBins,
                                            bin_gaussians_aligned, tile_grid)
from hlod_gaussians_tpu.ops.rasterize_xla import RenderOut


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(cfg, entry_data, tile_starts, tile_counts):
    (num_tiles, gw, tile_h, tile_w, width, height, t_eps, alpha_min,
     use_lod, want_seen, tpb, interleave, interpret) = cfg
    return rp.blend_forward(
        entry_data, tile_starts, tile_counts, num_tiles=num_tiles, gw=gw,
        tile_h=tile_h, tile_w=tile_w, width=width, height=height,
        t_eps=t_eps, alpha_min=alpha_min, use_lod=use_lod,
        want_seen=want_seen, tpb=tpb, interleave=interleave,
        interpret=interpret)


def _blend_fwd(cfg, entry_data, tile_starts, tile_counts):
    out = _blend(cfg, entry_data, tile_starts, tile_counts)
    img4, final_t, n_contrib, _seen = out
    return out, (entry_data, tile_starts, tile_counts, final_t, n_contrib)


def _blend_bwd(cfg, res, g):
    (num_tiles, gw, tile_h, tile_w, width, height, t_eps, alpha_min,
     use_lod, want_seen, tpb, interleave, interpret) = cfg
    entry_data, tile_starts, tile_counts, final_t, n_contrib = res
    g_img4, g_final_t, _g_nc, _g_seen = g
    egrads = rp.blend_backward(
        entry_data, tile_starts, tile_counts, final_t, n_contrib,
        g_img4, g_final_t, num_tiles=num_tiles, gw=gw, tile_h=tile_h,
        tile_w=tile_w, width=width, height=height, alpha_min=alpha_min,
        use_lod=use_lod, tpb=tpb, interleave=interleave,
        interpret=interpret)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return egrads, zero_i(tile_starts), zero_i(tile_counts)


_blend.defvjp(_blend_fwd, _blend_bwd)


@jax.custom_vjp
def _expand(feats, abins: AlignedBins):
    """[16, N] per-Gaussian features -> [16, cap] per-entry matrix."""
    return feats[:, abins.entry_gid]


def _expand_fwd(feats, abins):
    return _expand(feats, abins), (abins, feats.shape[1])


def _expand_bwd(res, egrads):
    abins, n = res
    cap = egrads.shape[1]
    md = abins.gen_to_slot.shape[0]
    if md == 0:
        raise ValueError(
            "this render was binned with need_grads=False (cfg.inference) "
            "— it cannot be differentiated; render with a training config")
    # NOTE: only rows 0:10 carry real gradients, but every minor-axis
    # gather needs a multiple-of-8 row count to stay on the fast path
    # (a [10, md] gather scalarizes: measured 1.1 s) — so the reduction
    # keeps all 16 rows
    ng = 16
    # kernel gradients -> generation order (contiguous per sorted Gaussian)
    ggen = egrads[:ng, jnp.clip(abins.gen_to_slot, 0, cap - 1)]  # [16, md]
    ggen = jnp.where(abins.gen_valid[None, :], ggen, 0.0)
    cs = jnp.cumsum(ggen, axis=1)
    # per-sorted-Gaussian segment sums by boundary differences
    off = abins.gen_offsets
    cnt = abins.gen_counts
    end = jnp.clip(off + cnt - 1, 0, md - 1)
    lo = jnp.clip(off - 1, 0, md - 1)
    seg = cs[:, end] - jnp.where((off > 0)[None, :], cs[:, lo], 0.0)
    seg = jnp.where((cnt > 0)[None, :], seg, 0.0)               # [16, N]
    # un-permute seg (row g belongs to Gaussian order[g]) by GATHER through
    # the inverse permutation (built with a 1-key sort — an int scatter
    # scalarizes); multi-row minor-axis scatters are 5-10x a gather (see
    # ops/binning.py layout notes)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, inv_order = jax.lax.sort((abins.order, iota), num_keys=1)
    gfeats = jax.lax.optimization_barrier(seg[:, inv_order])
    z = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), abins)
    return gfeats, z


_expand.defvjp(_expand_fwd, _expand_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "t_eps",
                     "alpha_min", "want_seen", "tpb", "interleave",
                     "interpret"))
def rasterize_tiles(
    abins: AlignedBins,
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
    want_seen: bool = False,
    tpb: int = 4,
    interleave: bool = True,
    interpret: bool = False,
) -> RenderOut:
    """Pallas twin of rasterize_scan (same RenderOut contract). With
    ``want_seen`` the kernel emits exact per-entry applied flags that reduce
    to the per-Gaussian `seen` of the CUDA forward (forward.cu:568)."""
    n = xy.shape[0]
    gw, gh = tile_grid(width, height, tile_w, tile_h)
    num_tiles = gw * gh
    use_lod = ts is not None and kids is not None

    # the compact (packed) layout is only legal with the SEQUENTIAL kernels:
    # interleaved tiles would clobber the boundary chunk they share with a
    # neighbour still in flight (ADVICE r04). The marker type survives jit.
    from hlod_gaussians_tpu.ops.binning import CompactBins
    if isinstance(abins, CompactBins):
        interleave = False

    if use_lod:
        t_col = ts
        # kids >= 1 guard: raw NODE_CHILD_COUNT is 0 for leaves; 1/0
        # keeps the forward finite but NaNs the power's backward
        ik_col = 1.0 / jnp.maximum(kids, 1).astype(jnp.float32)
    else:
        t_col = jnp.ones((n,), jnp.float32)
        ik_col = jnp.ones((n,), jnp.float32)

    feats = jnp.stack([
        xy[:, 0], xy[:, 1],
        # pre-scaled quadratic coefficients: power = s0 dx^2 + s1 dxdy
        # + s2 dy^2 inside the kernels; dconic chains through this scaling
        -0.5 * conic[:, 0], -conic[:, 1], -0.5 * conic[:, 2],
        opacity, color[:, 0], color[:, 1], color[:, 2], invdepth_g,
        t_col, ik_col,
        jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
    ], axis=0)                                   # [16, N]
    entry_data = _expand(feats, abins)

    cfg = (num_tiles, gw, tile_h, tile_w, width, height, float(t_eps),
           float(alpha_min), use_lod, want_seen, tpb, interleave, interpret)
    img4_t, final_t_t, n_contrib_t, seen_e = _blend(
        cfg, entry_data, abins.tile_starts, abins.tile_counts)

    def untile(x):
        """[T, pix] -> [H, W]"""
        x = x.reshape(gh, gw, tile_h, tile_w)
        x = jnp.swapaxes(x, 1, 2).reshape(gh * tile_h, gw * tile_w)
        return x[:height, :width]

    img4 = jax.vmap(untile, in_axes=1, out_axes=0)(img4_t)   # [4, H, W]
    final_t = untile(final_t_t[:, 0, :])
    n_contrib = untile(n_contrib_t[:, 0, :])

    image = img4[:3] + final_t[None] * bg[:, None, None]
    invdepth = img4[3]

    if want_seen and seen_e is not None:
        flags = jax.lax.stop_gradient(seen_e)                 # [1, cap]
        # lanes past the real entries (dropped tail / never-written
        # region) hold garbage — mask to the packed entry count
        cap = flags.shape[1]
        end = abins.tile_starts[-1] + abins.tile_counts[-1]
        lane_ok = (jnp.arange(cap, dtype=jnp.int32) < end)[None, :]
        flags = jnp.where(lane_ok, flags, 0.0)
        seenf = jnp.zeros((1, n), jnp.float32).at[
            :, abins.entry_gid].max(flags, mode="drop")[0]
        seen = seenf > 0.0
    else:
        seen = jnp.zeros((n,), bool)

    return RenderOut(image=image, invdepth=invdepth, final_t=final_t,
                     n_contrib=n_contrib, seen=seen,
                     truncated=abins.overflow)


def rasterize_pallas_full(xy, depth, radius, valid, conic, opacity, color,
                          invdepth_g, bg, ts=None, kids=None, *,
                          width: int, height: int, tile_w: int, tile_h: int,
                          max_dup: int, t_eps: float = 1e-4,
                          alpha_min: float = 1.0 / 255.0,
                          ext=None, reff2=None,
                          want_seen: bool = False,
                          tpb: int = 4,
                          layout: str = "aligned",
                          interpret: bool = False) -> RenderOut:
    """bin + align + blend in one call (binning is not differentiated).

    ALIGNED layout by default: the compact layout was measured SLOWER
    end-to-end (+4.8 ms at bench shapes with the CORRECT sequential
    kernels — fwd +3.3 / bwd +4.0 ms against binning -1.9, gather -0.6;
    scripts/profile3.py round-5 re-measure after the r04 A/B was found to
    have driven the aligned-only interleaved kernels on unaligned starts,
    ADVICE r04). layout="compact" keeps the packed path exercised; it
    forces the SEQUENTIAL kernels (the boundary read-modify-write needs
    the predecessor tile complete, which tile interleaving breaks) — the
    CompactBins marker type enforces this in rasterize_tiles."""
    if layout == "compact":
        from hlod_gaussians_tpu.ops.binning import bin_gaussians_compact
        abins = bin_gaussians_compact(
            jax.lax.stop_gradient(xy), jax.lax.stop_gradient(depth), radius,
            valid, width, height, tile_w, tile_h, max_dup,
            ext=None if ext is None else jax.lax.stop_gradient(ext),
            reff2=None if reff2 is None else jax.lax.stop_gradient(reff2))
    else:
        abins = bin_gaussians_aligned(
            jax.lax.stop_gradient(xy), jax.lax.stop_gradient(depth), radius,
            valid, width, height, tile_w, tile_h, max_dup, rp.CHUNK,
            ext=None if ext is None else jax.lax.stop_gradient(ext),
            reff2=None if reff2 is None else jax.lax.stop_gradient(reff2))
    return rasterize_tiles(abins, xy, conic, opacity, color, invdepth_g, bg,
                           ts, kids, width=width, height=height,
                           tile_w=tile_w, tile_h=tile_h, t_eps=t_eps,
                           alpha_min=alpha_min, want_seen=want_seen,
                           tpb=tpb, interleave=layout != "compact",
                           interpret=interpret)
