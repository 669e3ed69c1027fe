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
import dataclasses as _dc
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
    n_dup: jnp.ndarray        # scalar int32 — dup entries this frame needed
                              # (== binning num_candidates; capped at max_dup
                              # when truncated) — drives capacity regulation


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "use_lod", "want_seen"))
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
    want_seen: bool = False,
) -> RenderResult:
    """Render activated Gaussian arrays. Fully differentiable.

    ``want_seen`` makes the Pallas path emit exact per-Gaussian applied
    flags (the CUDA `seen` buffer, forward.cu:568) at the cost of one extra
    flag write per entry chunk — off by default for training steps."""
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

    # tight alpha-aware coverage on the production path; the scan path keeps
    # the reference's circle rects (it is the parity ground truth)
    tight = cfg.backend == "pallas" and cfg.tight_binning
    invdepth_g = 1.0 / jnp.maximum(proj.depth, 1e-6)
    if cfg.backend == "pallas":
        # aligned layout: the compact (unaligned) layout measured slower
        # end-to-end (+4.8 ms at bench shapes with the correct sequential
        # kernels; scripts/profile3.py r05 re-measure)
        from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned
        from hlod_gaussians_tpu.ops import rasterize as rast
        from hlod_gaussians_tpu.ops import rasterize_pallas as rp
        abins = bin_gaussians_aligned(
            jax.lax.stop_gradient(xy), jax.lax.stop_gradient(proj.depth),
            proj.radius, proj.valid,
            width, height, cfg.tile_w, cfg.tile_h, cfg.max_dup, rp.CHUNK,
            ext=jax.lax.stop_gradient(proj.ext) if tight else None,
            reff2=jax.lax.stop_gradient(proj.reff2) if tight else None,
            need_grads=not cfg.inference)
        bins = abins
        out = rast.rasterize_tiles(
            abins, xy, proj.conic, proj.opacity, color, invdepth_g, bg,
            ts if use_lod else None, kids if use_lod else None,
            width=width, height=height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            t_eps=cfg.t_eps, alpha_min=cfg.alpha_min, want_seen=want_seen,
            tpb=cfg.tpb,
            # Mosaic kernels only exist for TPU; CPU (tests, golden
            # fixtures) runs them in interpret mode
            interpret=jax.default_backend() == "cpu")
    else:
        bins = bin_gaussians(
            jax.lax.stop_gradient(xy), jax.lax.stop_gradient(proj.depth),
            proj.radius, proj.valid,
            width, height, cfg.tile_w, cfg.tile_h, cfg.max_dup)
        out = rasterize_scan(
            bins, xy, proj.conic, proj.opacity, color, invdepth_g, bg,
            ts if use_lod else None, kids if use_lod else None,
            width=width, height=height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            k_max=k_max, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min)
    return RenderResult(
        image=out.image, invdepth=out.invdepth, final_t=out.final_t,
        n_contrib=out.n_contrib, seen=out.seen, radii=proj.radius,
        visible=proj.valid, truncated=out.truncated,
        n_dup=bins.num_candidates)


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """Per-image 3x4 affine color transform (reference
    gaussian_renderer/__init__.py:150-153): out = A @ rgb + b per pixel."""
    c, h, w = image.shape
    flat = image.reshape(3, -1)
    out = exposure[:3, :3] @ flat + exposure[:3, 3:4]
    return out.reshape(c, h, w)


def tau_to_threshold(tau, tan_fovx, width: int):
    """Pixel granularity tau -> world-size-per-distance threshold
    (reference render_hierarchy.py:56)."""
    return (2.0 * (tau + 0.5)) * tan_fovx / (0.5 * width)


def _compute_cut(precomputed_cut, boxes, nodes, means3d, scales, alive,
                 campos, world_view, target_size, pcache, use_frustum):
    """The boxes-vs-dynamic cut dispatch shared by every LOD entry point
    (render_lod / _masked / _auto / _stream must select with the SAME
    rule or the paths silently diverge)."""
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod

    if precomputed_cut is not None:
        return precomputed_cut
    if boxes is not None:
        box_lo, box_hi, max_side = boxes
        return cut_mod.expand_to_size_box(
            nodes, box_lo, box_hi, max_side, alive, campos, target_size,
            pcache)
    # camera forward axis in world space: third column of the world->view
    # linear block (row-vector convention); [3,C]-transposed max is the
    # lane-efficient reduce
    zdir = world_view[:3, 2]
    return cut_mod.expand_to_size_dynamic(
        nodes, means3d, jnp.max(scales.T, axis=0), alive, campos, zdir,
        target_size, pcache, use_frustum=use_frustum)


def _prepend_skybox(n_skybox, alive, means3d, scales, quats, opacities, shs,
                    interp, valid_tail, ts_tail, kids_tail):
    """Skybox rows render uninterpolated ahead of the cut (reference
    render_post prepends them, gaussian_renderer/__init__.py:341-358)."""
    if n_skybox <= 0:
        return (interp["means3d"], interp["scales"], interp["quats"],
                interp["opacities"], interp["shs"], valid_tail, ts_tail,
                kids_tail)
    sky = jnp.arange(n_skybox, dtype=jnp.int32)
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    return (cat(means3d[sky], interp["means3d"]),
            cat(scales[sky], interp["scales"]),
            cat(quats[sky], interp["quats"]),
            cat(opacities[sky], interp["opacities"]),
            cat(shs[sky], interp["shs"]),
            cat(alive[sky], valid_tail),
            cat(jnp.ones((n_skybox,)), ts_tail),
            cat(jnp.ones((n_skybox,), jnp.int32), kids_tail))


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "budget", "n_skybox", "use_frustum"))
def render_lod(
    means3d, scales, quats, opacities, shs,   # activated arrays [C,...]
    nodes, alive,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    target_size,
    boxes=None,                  # optional (box_lo[C,3], box_hi[C,3], max_side[C])
    cut_mask=None,               # optional [C] bool: externally-maintained cut
                                 # (viewer incremental maintenance) — replaces
                                 # the size-rule selection; ts/kids still come
                                 # from the size metric
    pcache=None,                 # optional hierarchy.cut.ParentCache built
                                 # once per tree: makes the per-frame cut
                                 # gather-free (~25 ms/frame at 1M nodes)
    precomputed_cut=None,        # optional hierarchy.cut.CutResult computed
                                 # by the caller (same view!) — skips the
                                 # in-jit expand entirely (streaming loops
                                 # compute the cut once and reuse it here)
    interp_table=None,           # optional hierarchy.cut.InterpTable built
                                 # once per (tree, params): per-frame
                                 # interpolation becomes one wide gather
    *,
    sh_degree: int, width: int, height: int,
    budget: int,                 # static capacity of the cut (padded)
    n_skybox: int = 0,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_frustum: bool = True,
):
    """Hierarchical LOD render: granularity cut -> parent interpolation ->
    rasterize with in-kernel LOD alpha correction.

    One jitted pipeline fusing the reference's expand_to_size[_dynamic] +
    get_interpolation_weights[_dynamic] + render_post(interp_python=True)
    call chain (render_hierarchy.py:32-120, runtime_switching.cu:533-684,
    gaussian_renderer/__init__.py:241-401). With ``boxes`` the cut uses the
    upstream PROJECTED-BOX metric (computeSizeGPU,
    runtime_switching.cu:210-219 — the tau-sweep protocol,
    render_hierarchy.py:56-80); otherwise the fork's dynamic
    max-scale/distance metric. The cut is compacted into a static
    `budget`-sized index set; overflow beyond the budget drops the
    smallest-size nodes' entries (detectable via n_selected output).

    Returns (RenderResult, n_selected).
    """
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod

    # LOD entry points are render-only: skip gradient-reduction bookkeeping
    # in binning (differentiating through them raises; training paths use
    # render_arrays directly)
    cfg = _dc.replace(cfg, inference=True)
    c = means3d.shape[0]
    cut = _compute_cut(precomputed_cut, boxes, nodes, means3d, scales,
                       alive, campos, world_view, target_size, pcache,
                       use_frustum)

    from hlod_gaussians_tpu.models.gaussians import NODE_DEPTH
    mask = cut.render_mask if cut_mask is None else \
        (cut_mask & alive & (nodes[:, NODE_DEPTH] >= 0))
    n_selected = jnp.sum(mask)
    # sort-based compaction: TPU sorts are fast while nonzero's scatter
    # lowering scalarizes. Secondary key = descending projected size, so a
    # budget overflow drops the smallest-on-screen nodes first.
    neg_size = -jnp.where(jnp.isfinite(cut.size), cut.size, 3.4e38)
    _, _, idx = jax.lax.sort(
        ((~mask).astype(jnp.int32), neg_size,
         jnp.arange(c, dtype=jnp.int32)),
        num_keys=2)
    take = min(budget, c)
    idx = idx[:take]
    if take < budget:
        idx = jnp.concatenate(
            [idx, jnp.full((budget - take,), c, jnp.int32)])
    lane = jnp.arange(budget)
    sel_valid = lane < n_selected
    idx_c = jnp.clip(idx, 0, c - 1)

    # one stacked [2, M] gather for the per-frame cut outputs (1-row
    # gathers scalarize on TPU, see ops/binning.py)
    tk = jax.lax.optimization_barrier(jnp.stack(
        [cut.ts, cut.kids.astype(jnp.float32)], axis=0)[:, idx_c])
    ts_sel = tk[0]
    kids_sel = tk[1].astype(jnp.int32)

    if interp_table is not None:
        interp = cut_mod.interpolate_from_table(interp_table, idx_c, ts_sel)
    else:
        from hlod_gaussians_tpu.models.gaussians import NODE_PARENT
        parent = jnp.clip(nodes[idx_c, NODE_PARENT], 0, c - 1)
        params = dict(means3d=means3d, scales=scales, quats=quats,
                      opacities=opacities, shs=shs)
        interp = cut_mod.interpolate_with_parents(params, idx_c, parent,
                                                  ts_sel)

    (means_r, scales_r, quats_r, opac_r, shs_r, valid_r, ts_r,
     kids_r) = _prepend_skybox(n_skybox, alive, means3d, scales, quats,
                               opacities, shs, interp, sel_valid, ts_sel,
                               kids_sel)

    quats_r = quats_r / jnp.linalg.norm(quats_r, axis=-1, keepdims=True).clip(1e-12)

    out = render_arrays(
        means_r, scales_r, quats_r, opac_r, shs_r, valid_r,
        world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
        ts_r, kids_r, None,
        sh_degree=sh_degree, width=width, height=height, cfg=cfg,
        k_max=k_max, antialiasing=antialiasing, use_lod=True)
    return out, n_selected


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "n_skybox", "use_frustum"))
def render_lod_masked(
    means3d, scales, quats, opacities, shs,
    nodes, alive,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    target_size,
    boxes=None,
    pcache=None,
    precomputed_cut=None,
    interp_table=None,           # required in practice; built on the fly
                                 # from params if None
    *,
    sh_degree: int, width: int, height: int,
    n_skybox: int = 0,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_frustum: bool = True,
):
    """Budget-free LOD render for DENSE cuts: every node is LOD-interpolated
    by one elementwise lerp over the InterpTable and the cut mask becomes
    the renderer's valid mask — no compaction sort, no per-frame feature
    gather. Wins when the cut selects more than ~1/4 of the tree (feature
    gathers are latency-bound at ~42 ns/index); `render_lod` with a budget
    stays cheaper for sparse cuts. Returns (RenderResult, n_selected)."""
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod

    cfg = _dc.replace(cfg, inference=True)   # see render_lod
    cut = _compute_cut(precomputed_cut, boxes, nodes, means3d, scales,
                       alive, campos, world_view, target_size, pcache,
                       use_frustum)

    if interp_table is None:
        interp_table = cut_mod.build_interp_table(
            dict(means3d=means3d, scales=scales, quats=quats,
                 opacities=opacities, shs=shs), nodes)

    mask = cut.render_mask
    n_selected = jnp.sum(mask)
    interp = cut_mod.interpolate_all_masked(interp_table, cut.ts, mask)
    ts_r = jnp.where(mask, cut.ts, 1.0)
    kids_r = jnp.maximum(cut.kids, 1)

    (means_r, scales_r, quats_r, opac_r, shs_r, valid_r, ts_r,
     kids_r) = _prepend_skybox(n_skybox, alive, means3d, scales, quats,
                               opacities, shs, interp, mask, ts_r, kids_r)

    quats_r = quats_r / jnp.linalg.norm(
        quats_r, axis=-1, keepdims=True).clip(1e-12)

    out = render_arrays(
        means_r, scales_r, quats_r, opac_r, shs_r, valid_r,
        world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
        ts_r, kids_r, None,
        sh_degree=sh_degree, width=width, height=height, cfg=cfg,
        k_max=k_max, antialiasing=antialiasing, use_lod=True)
    return out, n_selected


def _budget_bucket(want: int, min_budget: int, max_budget: int,
                   cap: int) -> int:
    """Smallest ladder bucket >= want, ladder = {1, 1.5} x 2^k.

    Every budget-sized stage (compaction, interpolation, preprocess,
    binning capacity) pays the bucket, so pure power-of-two buckets
    overshoot real cuts by up to 2x; the half-step caps the overshoot at
    1.5x for one extra compile per octave."""
    b = min_budget
    while b < want and b < max_budget:
        b_half = b + (b >> 1)
        if want <= b_half:
            b = b_half
            break
        b <<= 1
    return min(max(b, min_budget), max_budget, cap)


@functools.partial(jax.jit, static_argnames=("use_frustum",))
def _cut_count(boxes, nodes, means3d, scales, alive, campos, world_view,
               target_size, pcache, *, use_frustum: bool):
    """Cut-size program for render_lod_auto's bucket choice: one jitted
    dispatch, one scalar back."""
    cut = _compute_cut(None, boxes, nodes, means3d, scales, alive, campos,
                       world_view, target_size, pcache, use_frustum)
    return jnp.sum(cut.render_mask)


def render_lod_auto(
    means3d, scales, quats, opacities, shs, nodes, alive,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    target_size, boxes=None, pcache=None, interp_table=None,
    *,
    sh_degree: int, width: int, height: int,
    min_budget: int = 4096,
    max_budget: int = 1 << 20,
    n_skybox: int = 0,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_frustum: bool = True,
    auto_max_dup: bool = True,
    md_state: Optional[dict] = None,
):
    """render_lod with the cut budget bucketed to the actual cut size.

    The static `budget` pads every downstream stage (interpolation,
    compaction, per-Gaussian preprocess), so a coarse tau paying a
    fine-tau budget wastes most of the frame. This computes the cut mask
    first, rounds its count up to a ladder bucket (one compile per
    bucket, cached), and passes the whole CutResult back in via
    `precomputed_cut` so the in-jit expand is skipped. Costs one
    device->host sync per frame — for evaluation/viewing, not the
    training loop (use render_lod_stream for viewer loops).

    With ``auto_max_dup`` the binning capacity is also bucketed (4 entries
    per selected node, floor 2^17) and doubled until the frame is not
    truncated — the binning/align/blend stages all pay O(max_dup), so a
    sparse cut must not pay a dense cut's entry capacity. Pass a persistent
    ``md_state`` dict (viewer loop) so the escalated capacity is remembered
    per budget bucket and later frames render exactly once."""
    import dataclasses

    from hlod_gaussians_tpu.hierarchy import cut as cut_mod

    # the interp table is a pure function of (params, nodes): rebuilding
    # it per frame gathers every parent row. With a persistent md_state
    # (static-tree viewer/eval loops, the same assumption its capacity
    # memory already makes) build it once and keep it there.
    if interp_table is None and md_state is not None:
        interp_table = md_state.get("itab")
        if interp_table is None:
            interp_table = cut_mod.build_interp_table(
                dict(means3d=means3d, scales=scales, quats=quats,
                     opacities=opacities, shs=shs), nodes)
            md_state["itab"] = interp_table

    # cut-count program: ONE jitted dispatch + one sync to choose the
    # bucket. The frame itself then goes through the SAME whole-frame
    # jitted programs as render_lod_stream (_stream_frame_masked/_budget),
    # eliminating per-frame gathers/rebuilds/dispatch storms. What remains
    # is auto's irreducible contract cost: this sync + the truncation
    # check below — two blocking reads that each flush the dispatch queue
    # on a remote-tunnel link (~30 ms each; measured floor table in
    # docs/KERNEL_DESIGN.md r05). Loops that tolerate one-frame-lag
    # regulation should use render_lod_stream. The cut is recomputed
    # inside the frame program (jitted, ~3-6 ms with a pcache at 1M
    # nodes) — cheaper than marshalling the CutResult through a second
    # entry point.
    n_sel = int(_cut_count(boxes, nodes, means3d, scales, alive, campos,
                           world_view, target_size, pcache,
                           use_frustum=use_frustum))
    budget = _budget_bucket(n_sel, min_budget, max_budget, means3d.shape[0])
    # dense cuts take the MASKED path, exactly as render_lod_stream's
    # regulation does: past ~1/4 of the tree the budget path's compaction
    # feature gather (latency-bound, ~42 ns/index) costs more than the
    # masked lerp over all C rows.
    use_masked = 4 * budget >= means3d.shape[0]
    md = max(1 << 17, 4 * budget) if auto_max_dup else cfg.max_dup
    md_key = "masked" if use_masked else budget
    if md_state is not None:
        md = max(md, md_state.get(md_key, 0))
    while True:
        cfg_f = dataclasses.replace(cfg, max_dup=min(md, cfg.max_dup)) \
            if auto_max_dup else cfg
        if use_masked:
            out, n, fb = _stream_frame_masked(
                means3d, scales, quats, opacities, shs, nodes, alive,
                world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
                target_size, boxes, pcache, interp_table,
                sh_degree=sh_degree, width=width, height=height,
                n_skybox=n_skybox, cfg=cfg_f, k_max=k_max,
                antialiasing=antialiasing, use_frustum=use_frustum)
        else:
            out, n, fb = _stream_frame_budget(
                means3d, scales, quats, opacities, shs, nodes, alive,
                world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
                target_size, boxes, pcache, interp_table,
                sh_degree=sh_degree, width=width, height=height,
                budget=budget, n_skybox=n_skybox, cfg=cfg_f, k_max=k_max,
                antialiasing=antialiasing, use_frustum=use_frustum)
        truncated = bool(fb[1])
        if not auto_max_dup or md >= cfg.max_dup or not truncated:
            if md_state is not None:
                md_state[md_key] = md
            return out, n
        # escalation = a silent re-render of the whole frame; surface it so
        # a capacity regression shows up as a counter, not as mystery
        # slowdown (persist in md_state when given, else warn)
        if md_state is not None:
            md_state["n_escalations"] = md_state.get("n_escalations", 0) + 1
        else:
            import warnings
            warnings.warn(
                f"render_lod_auto: max_dup {md} truncated, re-rendering at "
                f"{md * 2} (pass md_state to remember per-bucket capacity)",
                stacklevel=2)
        md *= 2


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "n_skybox", "use_frustum"))
def _stream_frame_masked(means3d, scales, quats, opacities, shs, nodes,
                         alive, world_view, full_proj, campos, tan_fovx,
                         tan_fovy, bg, target_size, boxes, pcache,
                         interp_table, *, sh_degree: int, width: int,
                         height: int, n_skybox: int, cfg, k_max: int,
                         antialiasing: bool, use_frustum: bool):
    """One streaming frame (masked path) + PACKED feedback.

    The regulation scalars (n_selected, truncated, n_dup) leave the device
    as ONE [3] int32 array: one D2H interaction per frame instead of three
    — over a remote-dispatch link every separate transfer costs 5-15 ms of
    tunnel latency, which at 1M-node tau0 scale was most of the gap between
    the raw masked frame and the streaming loop."""
    out, n_sel = render_lod_masked(
        means3d, scales, quats, opacities, shs, nodes, alive,
        world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
        target_size, boxes, pcache, None, interp_table,
        sh_degree=sh_degree, width=width, height=height, n_skybox=n_skybox,
        cfg=cfg, k_max=k_max, antialiasing=antialiasing,
        use_frustum=use_frustum)
    fb = jnp.stack([n_sel.astype(jnp.int32),
                    out.truncated.astype(jnp.int32), out.n_dup])
    return out, n_sel, fb


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "width", "height", "cfg", "k_max",
                     "antialiasing", "budget", "n_skybox", "use_frustum"))
def _stream_frame_budget(means3d, scales, quats, opacities, shs, nodes,
                         alive, world_view, full_proj, campos, tan_fovx,
                         tan_fovy, bg, target_size, boxes, pcache,
                         interp_table, *, sh_degree: int, width: int,
                         height: int, budget: int, n_skybox: int, cfg,
                         k_max: int, antialiasing: bool, use_frustum: bool):
    """One streaming frame (budgeted path) + packed feedback; see
    `_stream_frame_masked`."""
    out, n_sel = render_lod(
        means3d, scales, quats, opacities, shs, nodes, alive,
        world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
        target_size, boxes, None, pcache, None, interp_table,
        sh_degree=sh_degree, width=width, height=height, budget=budget,
        n_skybox=n_skybox, cfg=cfg, k_max=k_max, antialiasing=antialiasing,
        use_frustum=use_frustum)
    fb = jnp.stack([n_sel.astype(jnp.int32),
                    out.truncated.astype(jnp.int32), out.n_dup])
    return out, n_sel, fb


def render_lod_stream(
    means3d, scales, quats, opacities, shs, nodes, alive,
    world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
    target_size, state, boxes=None, pcache=None,
    interp_table=None,
    *,
    sh_degree: int, width: int, height: int,
    min_budget: int = 4096,
    max_budget: int = 1 << 20,
    n_skybox: int = 0,
    cfg: RasterizerConfig = RasterizerConfig(),
    k_max: int = 1024,
    antialiasing: bool = False,
    use_frustum: bool = True,
    headroom: float = 1.125,
    shrink_patience: int = 3,
    md_floor: int = 1 << 17,
    masked_crossover: float = 4.0,
):
    """Viewer streaming render: budget/capacity regulation with ONE-FRAME
    LAG, so no host<->device round trip sits between frame dispatches.

    ``render_lod_auto`` syncs twice per frame (`int(n_sel)` +
    `bool(truncated)`); over a remote-dispatch link those dominate the
    frame (~4x at tau=15). Here the frame is dispatched with the budget
    bucket chosen from the PREVIOUS frame's observed cut size — the TPU
    analogue of the SIBR viewer's frame-to-frame granularity regulation
    (runtime_maintenance.cu:39-387 adapts to the previous frame's budget
    overrun too). Scalars for frame k are fetched while frame k+1's work
    occupies the device, so the link latency is hidden.

    Consequences, by design (one frame each, then the state adapts):
      * cut grew past the budget -> that frame drops its smallest-on-screen
        nodes (the budget-overrun behavior of the reference viewer);
      * dup entries exceeded the binning bucket -> that frame is truncated.

    ``state`` is a mutable dict owned by the caller; pass ``{}`` on the
    first frame (which is rendered with a blocking probe to seed the
    bucket). Returns (RenderResult, n_selected_device_scalar).
    """
    import dataclasses

    from hlod_gaussians_tpu.hierarchy import cut as cut_mod

    cap = means3d.shape[0]

    def bucket_for(n_sel: int) -> int:
        return _budget_bucket(int(n_sel * headroom) + 1, min_budget,
                              max_budget, cap)

    if "budget" not in state:
        # first frame: blocking probe to seed the bucket (once per stream)
        cut0 = _compute_cut(None, boxes, nodes, means3d, scales, alive,
                            campos, world_view, target_size, pcache,
                            use_frustum)
        n0 = int(jnp.sum(cut0.render_mask))
        state["budget"] = bucket_for(n0)
        state["md"] = {}
        state["shrink"] = 0

    budget = state["budget"]
    # dense cuts skip compaction + feature gather entirely (the gather is
    # latency-bound at ~42 ns/index): render masked over the whole tree.
    # "MASKED" stands in for the budget in the md-regulation state.
    use_masked = (interp_table is not None
                  and budget * masked_crossover > cap * headroom)
    if use_masked:
        budget = "MASKED"
        # undershoot-biased initial capacity: the n_dup feedback grows it
        # to the right bucket in <=2 frames, while an overshoot would stay
        # forever (md is a monotonic high-water per bucket)
        md = state["md"].get(budget, max(md_floor, cap // 2))
        # the cut is computed INSIDE the jitted render (passing a
        # precomputed one would add a whole separate dispatch round trip
        # per frame over a remote link; nothing here needs it on host)
        out, n_sel, fb = _stream_frame_masked(
            means3d, scales, quats, opacities, shs, nodes, alive,
            world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
            target_size, boxes, pcache, interp_table,
            sh_degree=sh_degree, width=width, height=height,
            n_skybox=n_skybox,
            cfg=dataclasses.replace(cfg, max_dup=min(md, cfg.max_dup)),
            k_max=k_max, antialiasing=antialiasing, use_frustum=use_frustum)
    else:
        md = state["md"].get(budget, max(md_floor, 2 * budget))
        out, n_sel, fb = _stream_frame_budget(
            means3d, scales, quats, opacities, shs, nodes, alive,
            world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
            target_size, boxes, pcache, interp_table,
            sh_degree=sh_degree, width=width, height=height, budget=budget,
            n_skybox=n_skybox,
            cfg=dataclasses.replace(cfg, max_dup=min(md, cfg.max_dup)),
            k_max=k_max, antialiasing=antialiasing, use_frustum=use_frustum)

    # start the D2H copies NOW (non-blocking): a blocking scalar fetch over
    # a remote-dispatch link flushes the whole queue (~30-55 ms measured);
    # with the copy in flight the next frame's fetch is a local read. The
    # three regulation scalars ride ONE packed [3] array — one tunnel
    # interaction per frame instead of three. n_sel is RETURNED to the
    # caller, so its copy rides the same dispatch — without it, a caller
    # doing int(n_sel) per frame would pay the blocking queue flush.
    fb.copy_to_host_async()
    n_sel.copy_to_host_async()

    # resolve the PREVIOUS frame's feedback — its device work completed
    # while this frame was being enqueued, so these host reads overlap the
    # current frame's device compute instead of serializing with it
    prev = state.pop("pending", None)
    if prev is not None:
        p_fb, p_budget, p_md = prev
        p_n, p_trunc, p_dup = (int(v) for v in jax.device_get(p_fb))
        # binning/align/blend all pay O(max_dup), so the capacity should
        # hug the OBSERVED entry demand (n_dup; exact when not truncated,
        # == p_md when truncated so the margin still grows it).
        # Monotonic high-water per bucket: every md value is a fresh
        # compile, so boundary jitter must never flip the bucket back.
        want_md = _budget_bucket(int(int(p_dup) * 1.0625) + 1, md_floor,
                                 cfg.max_dup, cfg.max_dup)
        if bool(p_trunc):
            want_md = max(want_md, min(p_md * 2, cfg.max_dup))
            # telemetry: a truncated frame RENDERED degraded (the stream
            # path never re-renders; the capacity only grows next frame) —
            # surface it so regulation lag is visible between rounds
            state["n_truncated_frames"] = \
                state.get("n_truncated_frames", 0) + 1
        if want_md > state["md"].get(p_budget, 0):
            state["md"][p_budget] = want_md
        want = bucket_for(p_n)
        if want > state["budget"]:
            state["budget"] = want
            state["shrink"] = 0
        elif want < state["budget"]:
            state["shrink"] += 1
            if state["shrink"] >= shrink_patience:
                state["budget"] = want
                state["shrink"] = 0
        else:
            state["shrink"] = 0
    state["pending"] = (fb, budget, md)
    return out, n_sel


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
