"""Pallas TPU rasterizer: per-tile front-to-back blending kernels.

The production blend path — the TPU counterpart of the CUDA renderCUDA
kernels (hierarchy-rasterizer/cuda_rasterizer/forward.cu:450-596 forward,
backward.cu:498-721 backward), re-derived for the TPU's vector/matrix units
instead of translated:

* The CUDA kernel is a scalar front-to-back loop per pixel thread. Here each
  tile's entry list is processed in chunks of 128 as a dense
  ``[entries(sublanes) x pixels(lanes)]`` matrix, and the *sequential* alpha
  compositing becomes a closed-form **cumulative product** computed by a
  log-depth multiplicative scan on the VPU (``linear=True``, the forward default):

      T_before(k) = T_in * prod_{j<k}(1 - a_j)

  The log-space variant (``linear=False``: ``exp(scan-or-tril-matmul of
  log1p(-a))``) is retained for A/B. Measured on v5e: ISOLATED kernel
  timings disagree with the full training step — bwd-linear loses in
  isolation (17.13 -> 18.65 ms, the f32 divide) but the FULL fused step
  wins by ~3 ms (44.7-45.2 -> 41.9 ms; XLA overlaps the extra VPU work
  where the isolated program cannot). Decisions here go by the full
  step: both kernels default to linear. Pixel color is one weighted
  accumulation ``acc += sum_k w_k * c_k`` — an MXU matmul. No per-entry
  scalar extraction, no serial dependency chains on the VPU.
* Early-stop semantics match the CUDA kernel exactly: an entry is applied
  iff the inclusive product stays >= t_eps; the first entry that would cross
  the threshold is dropped and the pixel is saturated from then on
  (monotonicity of T makes the masked closed form equal to the sticky
  `done` flag of the serial loop, forward.cu:561-566). The linear chain
  product may underflow to exact 0 after saturation — every comparison
  stays correct there. The backward's reconstruction products run over
  APPLIED factors only, which keep T >= t_eps, so they cannot underflow.
* Binning stays XLA (ops/binning.py). Both layouts are supported: the
  packed compact layout (bin_gaussians_compact — tiles walk a
  floor-aligned DMA window; the one boundary chunk shared with the
  previous tile is read-modify-written, legal because grid programs run
  sequentially and each tile drains its DMAs) and the CHUNK-aligned
  layout (align_bins / bin_gaussians_aligned — exclusive per-tile slices,
  ofs == 0 everywhere). No atomics either way, unlike the CUDA backward.
* Per-entry inputs are pre-gathered by XLA into ``entry_data
  [16, cap]`` (x, y, -cxx/2, -cxy, -cyy/2, opacity, r, g, b, invdepth,
  t_lod, inv_kids, pad...) — the conic rows carry the PRE-SCALED quadratic
  coefficients so the per-pixel `power` is a pure fma chain (the scaling's
  gradient chain rides the feature-stack autodiff); gradient flow back to the per-Gaussian arrays is a
  hand-built generation-order segment reduction (ops/rasterize.py).
* The pixel count per tile (tile_w*tile_h) is a parameter: 256-pixel (16x16)
  tiles halve the sequential program count and the dup-entry total versus
  128-pixel tiles at the cost of wider [CHUNK, PIX] vector ops — the sweet
  spot is measured, not assumed (scripts/profile_raster.py).
* Backward walks chunks in reverse, reconstructing transmittance by
  division from the saved ``final_t`` exactly like the CUDA backward, using
  the saved per-pixel ``n_contrib`` to decide which entries were applied.
  It only processes chunks up to the tile's max ``n_contrib`` (later chunks
  have all-zero gradients and are zero-filled by DMA), and overlaps the
  per-chunk gradient write-out DMA with the next chunk's compute.

LOD alpha correction (forward.cu:546-554) is applied in-kernel:
    kidsqrt_alpha = 1 - (1 - alpha)^(1/kids)
    alpha' = t * alpha + (1 - t) * kidsqrt_alpha
with the matching opacity chain rule in backward (backward.cu:711-715).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# entry_data columns
_EX, _EY, _ECXX, _ECXY, _ECYY, _EOP, _ER, _EG, _EB, _EID, _ET, _EIK = range(12)
N_ENTRY_COLS = 16   # 12 used, padded for DMA-friendly rows
N_GRAD_COLS = 16    # dgx dgy dcxx dcxy dcyy dop dr dg db dinvd + pad

CHUNK = 128         # entries per chunk == sublane count of the chunk matrix

_LOG_EPS = -80.0    # log-space floor: exp(-80) ~ 1.8e-35, safely below t_eps


def _pixel_xy(tile_id, gw: int, tile_h: int, tile_w: int, pix: int):
    """Pixel centers of the tile as [1, pix] lane vectors."""
    tx = tile_id % gw
    ty = tile_id // gw
    p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    px = tx * tile_w + p % tile_w
    py = ty * tile_h + p // tile_w
    return px, py


def _tri_strict():
    """[CHUNK, CHUNK] strict lower-triangular ones: (A^T L)_k = sum_{j<k}."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c < r).astype(jnp.bfloat16)


def _usq_strict():
    """[CHUNK, CHUNK] strict upper-triangular ones: (U M)_k = sum_{j>k}."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c > r).astype(jnp.bfloat16)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _mm_mask(mask_bf, b):
    """``mask @ b`` where ``mask`` is exactly bf16-representable (0/1 masks).

    HIGHEST f32 matmul costs 6 bf16 MXU passes. With one operand exact in
    bf16, a Dekker 3-way split of the f32 operand is EXACT
    (b == b0+b1+b2 bitwise: 8+16/8+24 mantissa-bit windows, each residual
    representable), so three native single-pass bf16 matmuls with f32
    accumulation reproduce the HIGHEST result to accumulation-order rounding
    — Mosaic doesn't expose Precision.HIGH, hence the manual split."""
    b0f = b.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = b - b0f
    b1 = r1.astype(jnp.bfloat16)
    b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x: jax.lax.dot_general(
        mask_bf, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return (dot(b0f.astype(jnp.bfloat16)) + dot(b1)) + dot(b2)


def _mm_dekker(a, b):
    """``a @ b`` with BOTH operands exactly 3-way Dekker-split and the six
    non-negligible cross products folded into ONE bf16 matmul over a
    6x-wide contraction: lhs = [a0 a0 a0 a1 a1 a2], rhs = [b0;b1;b2;b0;b1;b0]
    covers (i,j) with i+j <= 2; the dropped (1,2)/(2,1)/(2,2) terms are
    <= 2^-27 relative — below the f32 accumulation rounding. Every bf16xbf16
    product is exact in f32 (8+8 <= 24 mantissa bits), so the result matches
    a HIGHEST f32 matmul at one single-pass matmul with K x6 instead of
    HIGHEST's 6 full passes. Only worthwhile for SMALL K (the suffix/color
    matmuls keep _mm_mask)."""
    def split3(x):
        x0 = x.astype(jnp.bfloat16)
        r1 = x - x0.astype(jnp.float32)
        x1 = r1.astype(jnp.bfloat16)
        x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        return x0, x1, x2

    a0, a1, a2 = split3(a)
    b0, b1, b2 = split3(b)
    lhs = jnp.concatenate([a0, a0, a0, a1, a1, a2], axis=1)
    rhs = jnp.concatenate([b0, b1, b2, b0, b1, b0], axis=0)
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _shift_down(x, s: int):
    """[CHUNK, pix] -> rows shifted down by ``s`` sublanes, zero-filled."""
    return jnp.concatenate(
        [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0)


def _shift_up(x, s: int):
    return jnp.concatenate(
        [x[s:], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0)


def _scan_ex(x):
    """Exclusive prefix sum over sublanes (== ``tril_strict @ x``) as a
    log-depth Hillis-Steele shift-and-add on the VPU — 7 shifted adds of
    [CHUNK, pix] instead of a 3-pass Dekker MXU matmul. The MXU is the
    contended unit in both blend kernels (the quadratic-basis counter-finding,
    docs/KERNEL_DESIGN.md), so prefix sums move OFF it; plain f32 adds are
    also strictly more accurate than the bf16-split matmul."""
    y = _shift_down(x, 1)
    s = 1
    while s < CHUNK:
        y = y + _shift_down(y, s)
        s *= 2
    return y


def _shift_down_ones(x, s: int):
    return jnp.concatenate(
        [jnp.ones((s, x.shape[1]), x.dtype), x[:-s]], axis=0)


def _scan_ex_prod(x):
    """Exclusive prefix PRODUCT over sublanes (Hillis-Steele with multiplies,
    identity fill = 1). The linear-space transmittance formulation: the
    serial T recurrence is a cumulative product directly, skipping the
    log1p/exp round trips of the log-space form (~6 VPU ops per
    entry-pixel in forward, ~3 in backward) at equal scan cost."""
    y = _shift_down_ones(x, 1)
    s = 1
    while s < CHUNK:
        y = y * _shift_down_ones(y, s)
        s *= 2
    return y


def _scan_suf(x):
    """Strict suffix sum over sublanes (== ``usq_strict @ x``), VPU scan."""
    y = _shift_up(x, 1)
    s = 1
    while s < CHUNK:
        y = y + _shift_up(y, s)
        s *= 2
    return y


def _mm_split22(a, b):
    """``a @ b`` via a 2x2 Dekker split dropping the tail x tail term:
    3 single-pass bf16 matmuls, relative error ~2^-17 per term (vs 2^-24
    for HIGHEST's 6 passes). Used ONLY for the forward color accumulation,
    where every term is non-negative so the absolute error of the sum is
    bounded by |result| * 2^-17 ~ 8e-6 — inside the golden/parity
    tolerances. NOT safe for cancelling sums (use _mm / _mm_mask there)."""
    a0 = a.astype(jnp.bfloat16)
    a1 = (a - a0.astype(jnp.float32)).astype(jnp.bfloat16)
    b0 = b.astype(jnp.bfloat16)
    b1 = (b - b0.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return dot(a0, b0) + (dot(a0, b1) + dot(a1, b0))


def _chunk_alpha(chunk, pxf, pyf, count, base_k, *, alpha_min, use_lod,
                 inside=None):
    """Shared forward math: per-(entry, pixel) effective alpha + masks.

    chunk: [CHUNK, N_ENTRY_COLS]; returns (alpha [CHUNK, pix] pre-masked,
    pre mask, aux dict for backward reuse). `inside` ([1, pix] bool) is
    folded into the mask (cheaper than a float multiply afterwards).
    """
    col = lambda i: chunk[:, i:i + 1]                        # [CHUNK,1]
    gx, gy = col(_EX), col(_EY)
    # s0 = -cxx/2, s1 = -cxy, s2 = -cyy/2 (pre-scaled at the feats stack)
    s0, s1, s2 = col(_ECXX), col(_ECXY), col(_ECYY)
    op = col(_EOP)

    dx = gx - pxf                                            # [CHUNK, pix]
    dy = gy - pyf
    power = dx * (s0 * dx + s1 * dy) + (s2 * dy) * dy
    G = jnp.exp(power)
    opG = op * G
    my_alpha = jnp.minimum(0.99, opG)

    if use_lod:
        t_lod, ik = col(_ET), col(_EIK)
        lg1m = jnp.log(jnp.maximum(1.0 - my_alpha, 1e-12))
        pw = jnp.exp(ik * lg1m)
        alpha = t_lod * my_alpha + (1.0 - t_lod) * (1.0 - pw)
        dalpha_dmy = t_lod + (1.0 - t_lod) * ik * pw / jnp.maximum(
            1.0 - my_alpha, 1e-12)
    else:
        alpha = my_alpha
        dalpha_dmy = None                 # identity chain when not LOD

    k = base_k + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    # k >= 0 excludes the previous tile's entries at the head of a
    # floor-aligned window (compact unaligned layout); [CHUNK,1] row masks
    # broadcast into the pixel mask for free
    pre = (power <= 0.0) & (alpha >= alpha_min) & (k >= 0) & (k < count)
    if inside is not None:
        pre = pre & inside
    aux = dict(dx=dx, dy=dy, G=G, opG=opG, power=power, k=k,
               dalpha_dmy=dalpha_dmy, s0=s0, s1=s1, s2=s2)
    return jnp.where(pre, alpha, 0.0), pre, aux


def _forward_kernel(starts_ref, counts_ref,
                    entries_hbm,                      # [16, cap] HBM
                    img_ref, ft_ref, nc_ref,          # VMEM out blocks
                    seen_hbm,                         # [1, cap] HBM out | None
                    chunk_vmem, sem, seen_vmem, seen_sem,
                    seen_rmw_vmem, seen_rmw_sem,
                    *, tpb: int, gw: int, tile_h: int, tile_w: int,
                    width: int, height: int, t_eps: float, alpha_min: float,
                    use_lod: bool, want_seen: bool, scan_impl: bool,
                    linear: bool):
    # `tpb` tiles are processed per grid program: Pallas TPU grid steps run
    # sequentially with a ~2-4us fixed cost each (block DMAs + bookkeeping);
    # batching tiles amortizes that overhead across the whole 1080p grid.
    # program_id must stay at kernel top level (the CPU interpreter does not
    # substitute it inside fori_loop body jaxprs).
    base = pl.program_id(0) * tpb

    def one_tile(j, _):
        _forward_tile(base + j, j, starts_ref, counts_ref, entries_hbm,
                      img_ref, ft_ref, nc_ref, seen_hbm, chunk_vmem, sem,
                      seen_vmem, seen_sem, seen_rmw_vmem, seen_rmw_sem,
                      gw=gw, tile_h=tile_h,
                      tile_w=tile_w, width=width, height=height, t_eps=t_eps,
                      alpha_min=alpha_min, use_lod=use_lod,
                      want_seen=want_seen, scan_impl=scan_impl,
                      linear=linear)
        return _

    jax.lax.fori_loop(0, tpb, one_tile, 0)


def _forward_tile(t, j, starts_ref, counts_ref, entries_hbm, img_ref, ft_ref,
                  nc_ref, seen_hbm, chunk_vmem, sem, seen_vmem, seen_sem,
                  seen_rmw_vmem, seen_rmw_sem,
                  *, gw: int, tile_h: int, tile_w: int,
                  width: int, height: int, t_eps: float, alpha_min: float,
                  use_lod: bool, want_seen: bool, scan_impl: bool,
                  linear: bool):
    start = starts_ref[t]
    count = counts_ref[t]
    pix = tile_h * tile_w

    # compact (unaligned) ranges: walk the floor-aligned WINDOW around the
    # tile's [start, start+count) slice; `ofs` head entries belong to the
    # PREVIOUS tile and are masked out via k >= 0. Aligned layouts
    # degenerate to ofs == 0.
    astart = (start // CHUNK) * CHUNK
    ofs = start - astart

    px, py = _pixel_xy(t, gw, tile_h, tile_w, pix)
    inside = (px < width) & (py < height)                    # [1, pix]
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)

    n_chunks = pl.cdiv(ofs + count, CHUNK)
    tril = _tri_strict()

    def dma(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[slot], sem.at[slot])

    def seen_dma(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            seen_vmem.at[slot], seen_hbm.at[:, pl.ds(off, CHUNK)],
            seen_sem.at[slot])

    def seen_rmw_dma():
        # read the boundary chunk's flags (written by the previous tile —
        # grid programs run sequentially, its DMAs drained at tile end)
        return pltpu.make_async_copy(
            seen_hbm.at[:, pl.ds(pl.multiple_of(astart, CHUNK), CHUNK)],
            seen_rmw_vmem, seen_rmw_sem)

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()
    if want_seen:
        @pl.when((n_chunks > 0) & (ofs > 0))
        def _():
            seen_rmw_dma().start()

    def body(c, carry):
        # TWO transmittance chains cross chunks (the sticky-early-stop
        # subtlety, forward.cu:561-566):
        #   logT_chain — includes EVERY pre entry's factor, applied or not.
        #     The serial loop's sticky `done` falls out of it: the applied
        #     set is exactly the prefix of pre entries before the first
        #     t_eps crossing, and because factors are <= 1 the chain stays
        #     below t_eps forever after that crossing — including across
        #     chunk boundaries. (Carrying only the applied product would
        #     let a small-alpha entry in a LATER chunk re-apply after a
        #     crossing: T_applied never goes below t_eps.)
        #   logT — applied-only product, the reference's T: feeds w and
        #     the final_T output. Up to the first crossing the two chains
        #     are equal, so log_before (= chain prefix) is the correct
        #     render transmittance wherever apply is true.
        logT, logT_chain, acc4, n_contrib = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()
        dma(slot, c).wait()
        if want_seen:
            # the slot's previous flag write must land before we reuse it
            @pl.when(c >= 2)
            def _():
                seen_dma(slot, c - 2).wait()

        # float-masked saturation vote (bool-select lowering is unsupported)
        if linear:
            saturated = jnp.max(jnp.where(inside, logT_chain, 0.0)) < t_eps
        else:
            saturated = jnp.max(
                jnp.where(inside, logT_chain, _LOG_EPS)) < jnp.log(t_eps)

        def process(args):
            # in linear mode the two carries hold T / T_chain directly
            # (not their logs); names kept to share the surrounding plumbing
            logT, logT_chain, acc4, n_contrib = args
            chunk = jnp.transpose(chunk_vmem[slot])   # [CHUNK, 16]
            alpha, pre, aux = _chunk_alpha(
                chunk, pxf, pyf, count, c * CHUNK - ofs,
                alpha_min=alpha_min, use_lod=use_lod, inside=inside)

            if linear:
                # linear-space transmittance: the serial recurrence is a
                # cumulative PRODUCT computed by one multiplicative scan —
                # no log1p/exp round trips. The chain may underflow to
                # exact 0 after saturation; every comparison below is
                # still correct there (0 < t_eps).
                one_m = 1.0 - alpha                         # 1 where masked
                cum_ex = _scan_ex_prod(one_m)
                t_before = logT_chain * cum_ex              # [CHUNK, pix]
                t_incl = t_before * one_m
                # applied iff the inclusive CHAIN product stays above t_eps
                apply = pre & (t_incl >= t_eps)
                w = jnp.where(apply, alpha * t_before, 0.0)
            else:
                lg = jnp.log1p(-alpha)                      # 0 where masked
                # exclusive prefix: VPU scan keeps the contended MXU free
                cum_ex = _scan_ex(lg) if scan_impl else _mm_mask(tril, lg)
                log_before = logT_chain + cum_ex            # [CHUNK, pix]
                log_incl = log_before + lg
                # applied iff the inclusive CHAIN product stays above t_eps
                # (pre => alpha >= alpha_min > 0)
                apply = pre & (log_incl >= jnp.log(t_eps))
                w = jnp.where(apply, alpha * jnp.exp(log_before), 0.0)

            # all 4 channel accumulations in ONE [4, CHUNK] @ [CHUNK, pix]
            # matmul; the [4, CHUNK] color rows come straight from the
            # untransposed DMA buffer
            c4 = chunk_vmem[slot][_ER:_EID + 1]             # [4, CHUNK]
            acc4 += _mm_split22(c4, w)

            if linear:
                # Mosaic has no reduce_prod lowering; both chunk totals
                # fall out of monotonicity instead: inclusive products are
                # non-increasing along rows, so the chunk-end value is the
                # row MINIMUM (reduce via the proven max lowering).
                # t_incl already carries T_chain, so these are absolute.
                logT_chain = -jnp.max(-t_incl, axis=0, keepdims=True)
                # applied-only T: the last applied entry's inclusive value
                # (equal to the applied chain up to the sticky crossing);
                # no applied entries => +BIG => T unchanged
                logT = jnp.minimum(
                    logT,
                    -jnp.max(jnp.where(apply, -t_incl, -3.0e38),
                             axis=0, keepdims=True))
            else:
                lg_applied = jnp.where(apply, lg, 0.0)
                logT = logT + jnp.sum(lg_applied, axis=0, keepdims=True)
                logT_chain = logT_chain + jnp.sum(lg, axis=0, keepdims=True)

            kk = aux["k"] + 1
            n_contrib = jnp.maximum(
                n_contrib,
                jnp.max(jnp.where(apply, kk, 0), axis=0, keepdims=True))
            if want_seen:
                flag = jnp.max(jnp.where(apply, 1.0, 0.0), axis=1)  # [CHUNK]
                seen_vmem[slot, 0] = flag
            return logT, logT_chain, acc4, n_contrib

        def skip(args):
            if want_seen:
                seen_vmem[slot, 0] = jnp.zeros((CHUNK,), jnp.float32)
            return args

        out = jax.lax.cond(saturated, skip, process,
                           (logT, logT_chain, acc4, n_contrib))
        if want_seen:
            # boundary chunk: MERGE with the previous tile's flags (its
            # rows carry zeros in our flag vector and vice versa) so the
            # shared chunk accumulates both tiles' entries
            @pl.when((c == 0) & (ofs > 0))
            def _():
                seen_rmw_dma().wait()
                seen_vmem[slot, 0] = jnp.maximum(seen_vmem[slot, 0],
                                                 seen_rmw_vmem[0])
            seen_dma(slot, c).start()
        return out

    pix_i = (jnp.ones((1, pix), jnp.float32) if linear
             else jnp.zeros((1, pix), jnp.float32))
    init = (pix_i, pix_i, jnp.zeros((4, pix), jnp.float32),
            jnp.zeros((1, pix), jnp.int32))
    logT, logT_chain, acc4, n_contrib = jax.lax.fori_loop(
        0, n_chunks, body, init)

    if want_seen:
        @pl.when(n_chunks >= 1)
        def _():
            seen_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        @pl.when(n_chunks >= 2)
        def _():
            seen_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    img_ref[j] = acc4
    ft_ref[j] = logT if linear else jnp.exp(logT)
    nc_ref[j] = n_contrib


def _forward_kernel_il(starts_ref, counts_ref, entries_hbm,
                       img_ref, ft_ref, nc_ref, seen_hbm,
                       chunk_vmem, sem, seen_vmem, seen_sem,
                       seen_rmw_vmem, seen_rmw_sem,
                       *, tpb: int, gw: int, tile_h: int, tile_w: int,
                       width: int, height: int, t_eps: float,
                       alpha_min: float, use_lod: bool, want_seen: bool,
                       linear: bool):
    """Tile-INTERLEAVED forward walk (round-4 latency finding).

    The sequential per-tile walk is LATENCY-bound, not throughput-bound:
    the loop-carried transmittance chain (carry -> t_before -> row-min ->
    carry) serializes ~9 us per chunk across ~3.7k chunks
    (scripts/probe_fwd_ablate.py: all-chunk walk with a real carry costs
    33.8 ms vs ~1 ms of throughput-equivalent math). Here the program's
    `tpb` tiles advance through the chunk loop IN LOCKSTEP — a static x4
    unroll with four independent carry chains per iteration — so the
    machine overlaps dependent ops of different tiles (measured 10.47 ->
    8.38 ms with bit-identical images, scripts/probe_fwd_interleave.py,
    before the group saturation skip re-added below). Finished/saturated
    tiles ride along with `where`-masked carries; a whole-group
    saturation cond restores the chunk pruning of the sequential path
    (skipped when want_seen: every walked chunk's flags must land).
    """
    base = pl.program_id(0) * tpb
    pix = tile_h * tile_w

    starts = [starts_ref[base + j] for j in range(tpb)]
    counts = [counts_ref[base + j] for j in range(tpb)]
    astarts = [(s // CHUNK) * CHUNK for s in starts]
    ofss = [s - a for s, a in zip(starts, astarts)]
    pxy = [_pixel_xy(base + j, gw, tile_h, tile_w, pix) for j in range(tpb)]
    insides = [(px < width) & (py < height) for px, py in pxy]
    pxfs = [px.astype(jnp.float32) for px, _ in pxy]
    pyfs = [py.astype(jnp.float32) for _, py in pxy]
    ncs = [pl.cdiv(ofss[j] + counts[j], CHUNK) for j in range(tpb)]
    max_nc = ncs[0]
    for j in range(1, tpb):
        max_nc = jnp.maximum(max_nc, ncs[j])

    def dma(j, slot, c):
        off = pl.multiple_of(astarts[j] + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[j, slot], sem.at[j, slot])

    def seen_dma(j, slot, c):
        off = pl.multiple_of(astarts[j] + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            seen_vmem.at[j, slot], seen_hbm.at[:, pl.ds(off, CHUNK)],
            seen_sem.at[j, slot])

    def seen_rmw_dma(j):
        return pltpu.make_async_copy(
            seen_hbm.at[:, pl.ds(pl.multiple_of(astarts[j], CHUNK), CHUNK)],
            seen_rmw_vmem.at[j], seen_rmw_sem.at[j])

    for j in range(tpb):
        @pl.when(ncs[j] > 0)
        def _(j=j):
            dma(j, 0, 0).start()
        if want_seen:
            @pl.when((ncs[j] > 0) & (ofss[j] > 0))
            def _(j=j):
                seen_rmw_dma(j).start()

    def tile_math(j, c, T, T_chain, acc4, n_contrib):
        # linear formulation only (see _forward_tile for the commentary);
        # the log-space path lives in the sequential kernel
        chunk = jnp.transpose(chunk_vmem[j, c % 2])
        alpha, pre, aux = _chunk_alpha(
            chunk, pxfs[j], pyfs[j], counts[j], c * CHUNK - ofss[j],
            alpha_min=alpha_min, use_lod=use_lod, inside=insides[j])
        one_m = 1.0 - alpha
        cum_ex = _scan_ex_prod(one_m)
        t_before = T_chain * cum_ex
        t_incl = t_before * one_m
        apply = pre & (t_incl >= t_eps)
        w = jnp.where(apply, alpha * t_before, 0.0)
        c4 = chunk_vmem[j, c % 2][_ER:_EID + 1]
        acc4 = acc4 + _mm_split22(c4, w)
        T_chain = -jnp.max(-t_incl, axis=0, keepdims=True)
        T = jnp.minimum(
            T, -jnp.max(jnp.where(apply, -t_incl, -3.0e38),
                        axis=0, keepdims=True))
        n_contrib = jnp.maximum(
            n_contrib,
            jnp.max(jnp.where(apply, aux["k"] + 1, 0), axis=0,
                    keepdims=True))
        flag = (jnp.max(jnp.where(apply, 1.0, 0.0), axis=1)
                if want_seen else None)
        return T, T_chain, acc4, n_contrib, flag

    def body(c, carry):
        Ts, Tcs, accs, nconts = carry
        slot = c % 2
        for j in range(tpb):
            @pl.when(c + 1 < ncs[j])
            def _(j=j):
                dma(j, (c + 1) % 2, c + 1).start()
        for j in range(tpb):
            @pl.when(c < ncs[j])
            def _(j=j):
                dma(j, slot, c).wait()
            if want_seen:
                @pl.when((c >= 2) & (c - 2 < ncs[j]))
                def _(j=j):
                    seen_dma(j, slot, c - 2).wait()

        lives = [
            (c < ncs[j]) & (jnp.max(
                jnp.where(insides[j], Tcs[j], 0.0)) >= t_eps)
            for j in range(tpb)]

        def group(args):
            Ts, Tcs, accs, nconts = args
            outs = []
            flags = []
            for j in range(tpb):
                T2, Tc2, a2, n2, flag = tile_math(
                    j, c, Ts[j], Tcs[j], accs[j], nconts[j])
                outs.append((jnp.where(lives[j], T2, Ts[j]),
                             jnp.where(lives[j], Tc2, Tcs[j]),
                             jnp.where(lives[j], a2, accs[j]),
                             jnp.where(lives[j], n2, nconts[j])))
                flags.append(flag)
            Ts2, Tcs2, accs2, nconts2 = zip(*outs)
            return (tuple(Ts2), tuple(Tcs2), tuple(accs2),
                    tuple(nconts2)), flags

        if want_seen:
            # no group skip: every walked chunk's flags must be written
            # (dead tiles write zeros, like the sequential skip branch)
            out, flags = group((Ts, Tcs, accs, nconts))
            for j in range(tpb):
                livef = jnp.where(lives[j], 1.0, 0.0)
                seen_vmem[j, slot, 0] = flags[j] * livef

                @pl.when((c == 0) & (ofss[j] > 0) & (ncs[j] > 0))
                def _(j=j):
                    # boundary chunk: merge the previous tile's flags
                    seen_rmw_dma(j).wait()
                    seen_vmem[j, slot, 0] = jnp.maximum(
                        seen_vmem[j, slot, 0], seen_rmw_vmem[j, 0])

                @pl.when(c < ncs[j])
                def _(j=j):
                    seen_dma(j, slot, c).start()
            return out

        any_live = lives[0]
        for j in range(1, tpb):
            any_live = any_live | lives[j]
        return jax.lax.cond(
            any_live, lambda a: group(a)[0], lambda a: a,
            (Ts, Tcs, accs, nconts))

    ones = tuple(jnp.ones((1, pix), jnp.float32) for _ in range(tpb))
    init = (ones, ones,
            tuple(jnp.zeros((4, pix), jnp.float32) for _ in range(tpb)),
            tuple(jnp.zeros((1, pix), jnp.int32) for _ in range(tpb)))
    Ts, Tcs, accs, nconts = jax.lax.fori_loop(0, max_nc, body, init)

    if want_seen:
        # drain: the in-loop wait at iteration c covers starts <= c-2, so
        # only starts at max_nc-2 / max_nc-1 (tiles reaching that far) are
        # still outstanding
        for j in range(tpb):
            @pl.when((max_nc >= 2) & (ncs[j] >= max_nc - 1))
            def _(j=j):
                seen_dma(j, max_nc % 2, 0).wait()

            @pl.when((ncs[j] > 0) & (ncs[j] >= max_nc))
            def _(j=j):
                seen_dma(j, (max_nc - 1) % 2, 0).wait()

    for j in range(tpb):
        img_ref[j] = accs[j]
        ft_ref[j] = Ts[j]
        nc_ref[j] = nconts[j]


def _pad_tiles(tile_starts, tile_counts, num_tiles: int, tpb: int):
    """Pad the per-tile range tables to a multiple of tpb (count 0 => the
    padded tiles do no work and write default outputs)."""
    t_pad = -(-num_tiles // tpb) * tpb
    if t_pad != num_tiles:
        z = jnp.zeros((t_pad - num_tiles,), jnp.int32)
        tile_starts = jnp.concatenate([tile_starts, z])
        tile_counts = jnp.concatenate([tile_counts, z])
    return tile_starts, tile_counts, t_pad


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "gw", "tile_h", "tile_w", "width", "height",
                     "t_eps", "alpha_min", "use_lod", "want_seen", "tpb",
                     "scan_impl", "linear", "interleave", "interpret"))
def blend_forward(entry_data, tile_starts, tile_counts, *,
                  num_tiles: int, gw: int, tile_h: int, tile_w: int,
                  width: int, height: int, t_eps: float = 1e-4,
                  alpha_min: float = 1.0 / 255.0,
                  use_lod: bool = False, want_seen: bool = False,
                  tpb: int = 4, scan_impl: bool = True, linear: bool = True,
                  interleave: bool = True,
                  interpret: bool = False):
    """entry_data [16, cap] (CHUNK-aligned tile ranges) ->
    (img4 [T, 4, pix], final_t [T, 1, pix], n_contrib [T, 1, pix][, seen_e])."""
    pix = tile_h * tile_w
    assert pix % 128 == 0, (tile_h, tile_w)
    assert entry_data.shape[1] % CHUNK == 0
    tile_starts, tile_counts, t_pad = _pad_tiles(
        tile_starts, tile_counts, num_tiles, tpb)
    use_il = interleave and linear
    if use_il:
        kernel = functools.partial(
            _forward_kernel_il, tpb=tpb, gw=gw, tile_h=tile_h,
            tile_w=tile_w, width=width, height=height, t_eps=t_eps,
            alpha_min=alpha_min, use_lod=use_lod, want_seen=want_seen,
            linear=linear)
    else:
        kernel = functools.partial(
            _forward_kernel, tpb=tpb, gw=gw, tile_h=tile_h, tile_w=tile_w,
            width=width, height=height, t_eps=t_eps, alpha_min=alpha_min,
            use_lod=use_lod, want_seen=want_seen, scan_impl=scan_impl,
            linear=linear)

    out_specs = [
        pl.BlockSpec((tpb, 4, pix), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, 4, pix), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32),
        jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.int32),
    ]
    if want_seen:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((1, entry_data.shape[1]), jnp.float32))
    else:
        out_specs.append(None)
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs[:3]) + ((out_specs[3],)
                                          if want_seen else ()),
        scratch_shapes=([
            pltpu.VMEM((tpb, 2, N_ENTRY_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
            pltpu.VMEM((tpb, 2, 1, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
            pltpu.VMEM((tpb, 1, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb,)),
        ] if use_il else [
            pltpu.VMEM((2, N_ENTRY_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]),
    )

    if want_seen:
        def kern(s_ref, c_ref, e_hbm, img, ft, nc, seen, *scratch):
            kernel(s_ref, c_ref, e_hbm, img, ft, nc, seen, *scratch)
        outs = pl.pallas_call(
            kern,
            out_shape=tuple(out_shape[:4]),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(tile_starts, tile_counts, entry_data)
        return tuple(o[:num_tiles] for o in outs[:3]) + (outs[3],)
    else:
        def kern(s_ref, c_ref, e_hbm, img, ft, nc, *scratch):
            kernel(s_ref, c_ref, e_hbm, img, ft, nc, None, *scratch)
        img4, final_t, n_contrib = pl.pallas_call(
            kern,
            out_shape=tuple(out_shape[:3]),
            grid_spec=grid_spec,
            interpret=interpret,
        )(tile_starts, tile_counts, entry_data)
        return (img4[:num_tiles], final_t[:num_tiles],
                n_contrib[:num_tiles], None)


def _backward_kernel(starts_ref, counts_ref,
                     entries_hbm,
                     ft_ref, nc_ref, gimg_ref, gft_ref,
                     egrad_hbm,
                     chunk_vmem, sem, grad_vmem, osem, zero_vmem, zsem,
                     rmw_vmem, rmw_sem,
                     *, tpb: int, gw: int, tile_h: int, tile_w: int,
                     width: int, height: int, alpha_min: float,
                     use_lod: bool, scan_impl: bool, linear: bool):
    # See _forward_kernel: tpb tiles per grid program amortize the fixed
    # per-program cost over the ~2k-tile 1080p grid.
    base = pl.program_id(0) * tpb

    def one_tile(j, _):
        _backward_tile(base + j, j, starts_ref, counts_ref, entries_hbm,
                       ft_ref, nc_ref, gimg_ref, gft_ref, egrad_hbm,
                       chunk_vmem, sem, grad_vmem, osem, zero_vmem, zsem,
                       rmw_vmem, rmw_sem,
                       gw=gw, tile_h=tile_h, tile_w=tile_w, width=width,
                       height=height, alpha_min=alpha_min, use_lod=use_lod,
                       scan_impl=scan_impl, linear=linear)
        return _

    jax.lax.fori_loop(0, tpb, one_tile, 0)


def _backward_tile(t, j, starts_ref, counts_ref,
                   entries_hbm,
                   ft_ref, nc_ref, gimg_ref, gft_ref,
                   egrad_hbm,
                   chunk_vmem, sem, grad_vmem, osem, zero_vmem, zsem,
                   rmw_vmem, rmw_sem,
                   *, gw: int, tile_h: int, tile_w: int,
                   width: int, height: int, alpha_min: float, use_lod: bool,
                   scan_impl: bool, linear: bool):
    start = starts_ref[t]
    count = counts_ref[t]
    pix = tile_h * tile_w
    # compact (unaligned) ranges: see _forward_tile. The one chunk shared
    # with the PREVIOUS tile is read-modify-written (sequential grid
    # programs make the predecessor's write visible); all other chunks are
    # exclusive. Foreign rows carry exactly-zero gradients (`applied`
    # masks every output), so the merge is a plain add.
    astart = (start // CHUNK) * CHUNK
    ofs = start - astart

    px, py = _pixel_xy(t, gw, tile_h, tile_w, pix)
    inside = (px < width) & (py < height)
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)

    final_t = ft_ref[j]                   # [1, pix]
    n_contrib = nc_ref[j]
    g4 = gimg_ref[j]                      # [4, pix] loop-invariant
    g0 = gimg_ref[j, 0:1]
    g1 = gimg_ref[j, 1:2]
    g2 = gimg_ref[j, 2:3]
    g3 = gimg_ref[j, 3:4]
    dT_total = gft_ref[j]
    dTf = dT_total * final_t              # [1, pix] loop-invariant

    n_chunks = pl.cdiv(ofs + count, CHUNK)
    # entries beyond the last applied one have identically-zero gradients;
    # only walk chunks that contain applied entries, zero-fill the rest
    # (the chunk holding tile-relative entry k is (k + ofs) // CHUNK)
    max_nc = jnp.max(n_contrib)
    n_act = jnp.minimum(
        jnp.where(max_nc > 0, pl.cdiv(max_nc + ofs, CHUNK), 0), n_chunks)
    tril = _tri_strict()
    usq = _usq_strict()

    def dma_in(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[slot], sem.at[slot])

    def dma_out(slot, c):
        off = pl.multiple_of(astart + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            grad_vmem.at[slot], egrad_hbm.at[:, pl.ds(off, CHUNK)],
            osem.at[slot])

    def rmw_dma():
        return pltpu.make_async_copy(
            egrad_hbm.at[:, pl.ds(pl.multiple_of(astart, CHUNK), CHUNK)],
            rmw_vmem, rmw_sem)

    # zero-fill the inactive tail chunks [z_lo, n_chunks); chunk 0 is
    # skipped when shared with the previous tile (ofs > 0) — that tile
    # already wrote it, with zeros in our rows
    zero_vmem[...] = jnp.zeros((N_GRAD_COLS, CHUNK), jnp.float32)
    z_lo = jnp.maximum(n_act, jnp.where(ofs > 0, 1, 0))

    def zfill(z, _):
        off = pl.multiple_of(astart + (z_lo + z) * CHUNK, CHUNK)
        pltpu.make_async_copy(
            zero_vmem, egrad_hbm.at[:, pl.ds(off, CHUNK)], zsem).start()
        return _

    n_zero = n_chunks - z_lo
    jax.lax.fori_loop(0, n_zero, zfill, 0)

    @pl.when(n_act > 0)
    def _():
        dma_in(0, n_act - 1).start()

    @pl.when((n_act > 0) & (ofs > 0))
    def _():
        # prefetch the boundary chunk's accumulated grads; merged when the
        # reverse walk reaches chunk 0 (this tile's final iteration)
        rmw_dma().start()

    def body(ci, carry):
        logT_end, s_comb = carry   # combined g-weighted suffix sum [1, pix]
        c = n_act - 1 - ci
        slot = ci % 2

        @pl.when(ci + 1 < n_act)
        def _():
            dma_in((ci + 1) % 2, jnp.maximum(c - 1, 0)).start()
        dma_in(slot, c).wait()

        chunk = jnp.transpose(chunk_vmem[slot])   # [CHUNK, 16]
        alpha, pre, aux = _chunk_alpha(
            chunk, pxf, pyf, count, c * CHUNK - ofs,
            alpha_min=alpha_min, use_lod=use_lod, inside=inside)

        applied = pre & (aux["k"] + 1 <= n_contrib)
        a = jnp.where(applied, alpha, 0.0)
        if linear:
            # linear-space reconstruction: per-pixel products of APPLIED
            # factors cannot underflow (the applied set keeps T >= t_eps,
            # so each chunk's product is >= ~t_eps); division replaces the
            # log1p/exp round trips
            one_m = 1.0 - a
            t_rel = _scan_ex_prod(one_m)                      # [CHUNK, pix]
            # chunk product = min of the (monotone non-increasing)
            # inclusive products — Mosaic has no reduce_prod lowering
            chunk_prod = -jnp.max(-(t_rel * one_m), axis=0, keepdims=True)
            logT_start = logT_end / jnp.maximum(chunk_prod, 1e-30)
            t_start = logT_start                              # [1, pix]
            rcp = 1.0 / one_m
        else:
            lg = jnp.log1p(-a)
            chunk_sum = jnp.sum(lg, axis=0, keepdims=True)
            logT_start = logT_end - chunk_sum
            # T_start factored OUT of the per-entry exponent: t_before =
            # T_start * exp(cum_ex). Everything heavy (exp, the triangular
            # matmuls) becomes independent of the loop carry — the carry
            # only enters through [1, pix]-row multiplies — which shortens
            # the serial dependency chain between chunk iterations.
            cum_ex = _scan_ex(lg) if scan_impl else _mm_mask(tril, lg)
            t_rel = jnp.exp(cum_ex)                           # [CHUNK, pix]
            t_start = jnp.exp(logT_start)                     # [1, pix]
            # 1/(1-a) = exp(-log1p(-a)): the hw exp is ~3 VPU passes
            # cheaper than an f32 divide, and lg is already in registers
            rcp = jnp.exp(-lg)
        contrib0 = a * t_rel
        contrib = contrib0 * t_start

        col = lambda i: chunk[:, i:i + 1]

        # per-entry color grads (reduce over lanes; measured FASTER on the
        # VPU than the equivalent [CHUNK,pix]x[pix,4] MXU contraction)
        dcr = jnp.sum(contrib * g0, axis=1, keepdims=True)
        dcg = jnp.sum(contrib * g1, axis=1, keepdims=True)
        dcb = jnp.sum(contrib * g2, axis=1, keepdims=True)
        dcd = jnp.sum(contrib * g3, axis=1, keepdims=True)

        # dL/dalpha (backward.cu:606-634). The four per-channel suffix sums
        # Suf_k = sum_{j>k} c_j contrib_j only ever appear contracted with
        # the per-pixel upstream grads g, which are constant in k — so the
        # contraction commutes into the matmul operand and ONE triangular
        # matmul over the g-weighted colors replaces four:
        #   sum_ch g_ch * Suf_k^ch = [usq @ (contrib * cdotg)]_k
        # cdotg itself is a rank-4 outer-product sum = one tiny MXU matmul
        # [CHUNK,4] @ [4,pix] (replaces 7 wide VPU passes); Dekker-split
        # keeps it f32-exact. T_start also factors out of the suffix matmul
        # (it is constant over the contraction index), keeping the MXU work
        # carry-free:  usq @ (pcg0 * T_start) = (usq @ pcg0) * T_start.
        cdotg = _mm_dekker(chunk[:, _ER:_EID + 1], g4)    # [CHUNK, pix]
        pcg0 = contrib0 * cdotg
        suf0 = _scan_suf(pcg0) if scan_impl else _mm_mask(usq, pcg0)
        suf_comb = suf0 * t_start + s_comb

        # dT*final_t is loop-invariant (hoisted to dTf outside the walk)
        dal = cdotg * (t_rel * t_start) - (suf_comb + dTf) * rcp
        dal = jnp.where(applied, dal, 0.0)

        dmy = dal * aux["dalpha_dmy"] if use_lod else dal
        not_clipped = aux["opG"] < 0.99
        dpower = jnp.where(not_clipped, aux["opG"] * dmy, 0.0)

        # Factored spatial reductions: with u = dx*dpower, v = dy*dpower,
        # every conic/mean gradient is a sum of {u, v, dx*u, dy*u, dy*v}
        # — 5 products + 6 lane reductions instead of the naive 13 + 7
        # (backward.cu:640-676 computes these per-pixel serially).
        dx, dy = aux["dx"], aux["dy"]
        u = dx * dpower
        v = dy * dpower
        su = jnp.sum(u, axis=1, keepdims=True)
        sv = jnp.sum(v, axis=1, keepdims=True)
        s0 = jnp.sum(dpower, axis=1, keepdims=True)
        # dop: dpower = op * G * dmy and dop_px = G * dmy share the clip
        # mask, so dop = s0 / op exactly (safe where op == 0 -> s0 == 0)
        dop = s0 / jnp.maximum(col(_EOP), 1e-30)
        # grads w.r.t. the PRE-SCALED coefficients (the feature-stack
        # scaling maps them back to dconic outside the kernel)
        ds0 = jnp.sum(dx * u, axis=1, keepdims=True)
        ds1 = jnp.sum(dy * u, axis=1, keepdims=True)
        ds2 = jnp.sum(dy * v, axis=1, keepdims=True)
        # d(power)/d(gx) = 2 s0 dx + s1 dy ; d/d(gy) = 2 s2 dy + s1 dx
        two = jnp.float32(2.0)
        dgx = two * aux["s0"] * su + aux["s1"] * sv
        dgy = two * aux["s2"] * sv + aux["s1"] * su

        zeros = jnp.zeros((CHUNK, N_GRAD_COLS - 10), jnp.float32)
        g16 = jnp.concatenate(
            [dgx, dgy, ds0, ds1, ds2, dop, dcr, dcg, dcb, dcd, zeros],
            axis=1)

        # double-buffered write-out: wait for the slot's previous DMA, then
        # overlap this chunk's store with the next chunk's compute
        @pl.when(ci >= 2)
        def _():
            dma_out(slot, 0).wait()
        is_boundary = (c == 0) & (ofs > 0)

        @pl.when(is_boundary)
        def _():
            # merge with the previous tile's grads in the shared chunk
            # (our foreign rows are exactly zero, theirs are in ours)
            rmw_dma().wait()
            grad_vmem[slot] = jnp.transpose(g16) + rmw_vmem[...]

        @pl.when(jnp.logical_not(is_boundary))
        def _():
            grad_vmem[slot] = jnp.transpose(g16)       # [16, CHUNK]
        dma_out(slot, c).start()

        s_comb_n = s_comb + jnp.sum(pcg0, axis=0, keepdims=True) * t_start
        return logT_start, s_comb_n

    z = jnp.zeros((1, pix), jnp.float32)
    safe_ft = jnp.maximum(final_t, 1e-30)
    init = (safe_ft if linear else jnp.log(safe_ft), z)
    jax.lax.fori_loop(0, n_act, body, init)

    # drain all outstanding write DMAs before the next program may overwrite
    # the overlap region of the shared output buffer
    @pl.when(n_act >= 1)
    def _():
        dma_out((n_act - 1) % 2, 0).wait()

    @pl.when(n_act >= 2)
    def _():
        dma_out((n_act - 2) % 2, 0).wait()

    def zwait(z, _):
        pltpu.make_async_copy(
            zero_vmem, egrad_hbm.at[:, pl.ds(0, CHUNK)], zsem).wait()
        return _

    jax.lax.fori_loop(0, n_zero, zwait, 0)


def _backward_kernel_il(starts_ref, counts_ref,
                        entries_hbm,
                        ft_ref, nc_ref, gimg_ref, gft_ref,
                        egrad_hbm,
                        chunk_vmem, sem, grad_vmem, osem, zero_vmem, zsem,
                        *, tpb: int, gw: int, tile_h: int, tile_w: int,
                        width: int, height: int, alpha_min: float,
                        use_lod: bool, linear: bool):
    """Tile-INTERLEAVED backward walk (see _forward_kernel_il): the
    program's tpb tiles run their reverse chunk walks in lockstep, each
    with its own carry chain, hiding the per-chunk serialized latency.

    ALIGNED layouts only: the compact layout's boundary read-modify-write
    assumes the predecessor tile finished BEFORE this tile starts, which
    interleaving breaks — compact callers must pass interleave=False.
    Linear formulation only (the sequential kernel keeps log-space)."""
    base = pl.program_id(0) * tpb
    pix = tile_h * tile_w

    starts = [starts_ref[base + j] for j in range(tpb)]
    counts = [counts_ref[base + j] for j in range(tpb)]
    pxy = [_pixel_xy(base + j, gw, tile_h, tile_w, pix) for j in range(tpb)]
    insides = [(px < width) & (py < height) for px, py in pxy]
    pxfs = [px.astype(jnp.float32) for px, _ in pxy]
    pyfs = [py.astype(jnp.float32) for _, py in pxy]
    ncs_all = [pl.cdiv(counts[j], CHUNK) for j in range(tpb)]

    final_ts = [ft_ref[j] for j in range(tpb)]
    n_contribs = [nc_ref[j] for j in range(tpb)]
    g4s = [gimg_ref[j] for j in range(tpb)]
    dTfs = [gft_ref[j] * final_ts[j] for j in range(tpb)]

    n_acts = []
    for j in range(tpb):
        mnc = jnp.max(n_contribs[j])
        n_acts.append(jnp.minimum(
            jnp.where(mnc > 0, pl.cdiv(mnc, CHUNK), 0), ncs_all[j]))
    max_act = n_acts[0]
    for j in range(1, tpb):
        max_act = jnp.maximum(max_act, n_acts[j])

    def dma_in(j, slot, c):
        off = pl.multiple_of(starts[j] + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(off, CHUNK)],
            chunk_vmem.at[j, slot], sem.at[j, slot])

    def dma_out(j, slot, c):
        off = pl.multiple_of(starts[j] + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            grad_vmem.at[j, slot], egrad_hbm.at[:, pl.ds(off, CHUNK)],
            osem.at[j, slot])

    # zero-fill every tile's inactive tail chunks [n_act, n_chunks)
    zero_vmem[...] = jnp.zeros((N_GRAD_COLS, CHUNK), jnp.float32)
    for j in range(tpb):
        def zfill(z, _, j=j):
            off = pl.multiple_of(starts[j] + (n_acts[j] + z) * CHUNK, CHUNK)
            pltpu.make_async_copy(
                zero_vmem, egrad_hbm.at[:, pl.ds(off, CHUNK)], zsem).start()
            return _
        jax.lax.fori_loop(0, ncs_all[j] - n_acts[j], zfill, 0)

    for j in range(tpb):
        @pl.when(n_acts[j] > 0)
        def _(j=j):
            dma_in(j, 0, n_acts[j] - 1).start()

    def tile_math(j, ci, c, T_end, s_comb):
        chunk = jnp.transpose(chunk_vmem[j, ci % 2])   # [CHUNK, 16]
        alpha, pre, aux = _chunk_alpha(
            chunk, pxfs[j], pyfs[j], counts[j], c * CHUNK,
            alpha_min=alpha_min, use_lod=use_lod, inside=insides[j])
        applied = pre & (aux["k"] + 1 <= n_contribs[j])
        a = jnp.where(applied, alpha, 0.0)
        one_m = 1.0 - a
        t_rel = _scan_ex_prod(one_m)
        chunk_prod = -jnp.max(-(t_rel * one_m), axis=0, keepdims=True)
        t_start = T_end / jnp.maximum(chunk_prod, 1e-30)
        rcp = 1.0 / one_m
        contrib0 = a * t_rel
        contrib = contrib0 * t_start

        col = lambda i: chunk[:, i:i + 1]
        dcr = jnp.sum(contrib * g4s[j][0:1], axis=1, keepdims=True)
        dcg = jnp.sum(contrib * g4s[j][1:2], axis=1, keepdims=True)
        dcb = jnp.sum(contrib * g4s[j][2:3], axis=1, keepdims=True)
        dcd = jnp.sum(contrib * g4s[j][3:4], axis=1, keepdims=True)

        cdotg = _mm_dekker(chunk[:, _ER:_EID + 1], g4s[j])
        pcg0 = contrib0 * cdotg
        suf0 = _scan_suf(pcg0)
        suf_comb = suf0 * t_start + s_comb

        dal = cdotg * (t_rel * t_start) - (suf_comb + dTfs[j]) * rcp
        dal = jnp.where(applied, dal, 0.0)
        dmy = dal * aux["dalpha_dmy"] if use_lod else dal
        not_clipped = aux["opG"] < 0.99
        dpower = jnp.where(not_clipped, aux["opG"] * dmy, 0.0)
        dx, dy = aux["dx"], aux["dy"]
        u = dx * dpower
        v = dy * dpower
        su = jnp.sum(u, axis=1, keepdims=True)
        sv = jnp.sum(v, axis=1, keepdims=True)
        s0 = jnp.sum(dpower, axis=1, keepdims=True)
        dop = s0 / jnp.maximum(col(_EOP), 1e-30)
        ds0 = jnp.sum(dx * u, axis=1, keepdims=True)
        ds1 = jnp.sum(dy * u, axis=1, keepdims=True)
        ds2 = jnp.sum(dy * v, axis=1, keepdims=True)
        two = jnp.float32(2.0)
        dgx = two * aux["s0"] * su + aux["s1"] * sv
        dgy = two * aux["s2"] * sv + aux["s1"] * su
        zeros = jnp.zeros((CHUNK, N_GRAD_COLS - 10), jnp.float32)
        g16 = jnp.concatenate(
            [dgx, dgy, ds0, ds1, ds2, dop, dcr, dcg, dcb, dcd, zeros],
            axis=1)
        s_comb_n = s_comb + jnp.sum(pcg0, axis=0, keepdims=True) * t_start
        return t_start, s_comb_n, g16

    def body(ci, carry):
        T_ends, s_combs = carry
        slot = ci % 2
        for j in range(tpb):
            @pl.when(ci + 1 < n_acts[j])
            def _(j=j):
                dma_in(j, (ci + 1) % 2,
                       jnp.maximum(n_acts[j] - 2 - ci, 0)).start()
        for j in range(tpb):
            @pl.when(ci < n_acts[j])
            def _(j=j):
                dma_in(j, slot, 0).wait()

        new_T, new_s = [], []
        for j in range(tpb):
            live = ci < n_acts[j]
            c = jnp.maximum(n_acts[j] - 1 - ci, 0)
            T2, s2, g16 = tile_math(j, ci, c, T_ends[j], s_combs[j])
            new_T.append(jnp.where(live, T2, T_ends[j]))
            new_s.append(jnp.where(live, s2, s_combs[j]))

            @pl.when(live)
            def _(j=j, g16=g16, c=c):
                @pl.when(ci >= 2)
                def _():
                    dma_out(j, slot, 0).wait()
                grad_vmem[j, slot] = jnp.transpose(g16)    # [16, CHUNK]
                dma_out(j, slot, c).start()
        return tuple(new_T), tuple(new_s)

    z = tuple(jnp.zeros((1, pix), jnp.float32) for _ in range(tpb))
    init = (tuple(jnp.maximum(final_ts[j], 1e-30) for j in range(tpb)), z)
    jax.lax.fori_loop(0, max_act, body, init)

    # drain every tile's outstanding write DMAs before the next program
    for j in range(tpb):
        @pl.when(n_acts[j] >= 1)
        def _(j=j):
            dma_out(j, (n_acts[j] - 1) % 2, 0).wait()

        @pl.when(n_acts[j] >= 2)
        def _(j=j):
            dma_out(j, (n_acts[j] - 2) % 2, 0).wait()

    for j in range(tpb):
        def zwait(zi, _, j=j):
            pltpu.make_async_copy(
                zero_vmem, egrad_hbm.at[:, pl.ds(0, CHUNK)], zsem).wait()
            return _
        jax.lax.fori_loop(0, ncs_all[j] - n_acts[j], zwait, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "gw", "tile_h", "tile_w", "width", "height",
                     "alpha_min", "use_lod", "tpb", "scan_impl", "linear",
                     "interleave", "interpret"))
def blend_backward(entry_data, tile_starts, tile_counts, final_t, n_contrib,
                   g_img4, g_final_t, *,
                   num_tiles: int, gw: int, tile_h: int, tile_w: int,
                   width: int, height: int, alpha_min: float = 1.0 / 255.0,
                   use_lod: bool = False, tpb: int = 4,
                   scan_impl: bool = True, linear: bool = True,
                   interleave: bool = True,
                   interpret: bool = False):
    """Hand-derived backward -> per-entry gradients [16, cap]."""
    pix = tile_h * tile_w
    assert pix % 128 == 0
    tile_starts, tile_counts, t_pad = _pad_tiles(
        tile_starts, tile_counts, num_tiles, tpb)
    if t_pad != num_tiles:
        pad_rows = lambda x: jnp.concatenate(
            [x, jnp.zeros((t_pad - num_tiles,) + x.shape[1:], x.dtype)])
        final_t = pad_rows(final_t)
        n_contrib = pad_rows(n_contrib)
        g_img4 = pad_rows(g_img4)
        g_final_t = pad_rows(g_final_t)
    use_il = interleave and linear
    if use_il:
        kernel = functools.partial(
            _backward_kernel_il, tpb=tpb, gw=gw, tile_h=tile_h,
            tile_w=tile_w, width=width, height=height, alpha_min=alpha_min,
            use_lod=use_lod, linear=linear)
    else:
        kernel = functools.partial(
            _backward_kernel, tpb=tpb, gw=gw, tile_h=tile_h, tile_w=tile_w,
            width=width, height=height, alpha_min=alpha_min, use_lod=use_lod,
            scan_impl=scan_impl, linear=linear)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 4, pix), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=([
            pltpu.VMEM((tpb, 2, N_ENTRY_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
            pltpu.VMEM((tpb, 2, N_GRAD_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
            pltpu.VMEM((N_GRAD_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ] if use_il else [
            pltpu.VMEM((2, N_ENTRY_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, N_GRAD_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((N_GRAD_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((N_GRAD_COLS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (N_GRAD_COLS, entry_data.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, tile_counts, entry_data, final_t, n_contrib, g_img4,
      g_final_t)
