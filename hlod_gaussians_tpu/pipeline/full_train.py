"""End-to-end pipeline: coarse scaffold -> per-chunk training -> hierarchy
build -> post-optimization -> consolidation.

Single-program replacement for the reference's process-level orchestration
(scripts/full_train.py:45-263 + train_no_chunks.py:98-265): no subprocesses,
no SLURM, no filesystem barriers — each stage is a Python call around jitted
steps, and multi-chip scale-out shards views over the device mesh inside the
steps themselves (parallel/data_parallel.py) instead of job arrays.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import (OptimizationConfig, PostConfig,
                                       RasterizerConfig)
from hlod_gaussians_tpu.data import dhier as dhier_io
from hlod_gaussians_tpu.data.scene import SceneInfo, load_view
from hlod_gaussians_tpu.hierarchy import build as hb
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.pipeline import chunking, merge
from hlod_gaussians_tpu.train import coarse as coarse_mod, flat, post as post_mod
from hlod_gaussians_tpu.utils import scheduler
from hlod_gaussians_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Stage iteration counts + capacities (reference defaults:
    scripts/full_train.py:141-143, README.md:490-512)."""

    coarse_iters: int = 30_000
    chunk_iters: int = 30_000
    post_iters: int = 15_000
    skybox_num: int = 100_000
    coarse_capacity: int = 1 << 20
    chunk_capacity: int = 1 << 21
    densification_interval: int = 300
    post_densify_interval: int = -1     # <=0: use PostConfig.densify_interval
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    chunk_size: float = 100.0
    # chunk point window = chunk box padded by this fraction of chunk_size
    # (make_chunk.py's padded point boxes)
    chunk_point_padding: float = 2.0
    k_max: int = 1024
    mh_walk: bool = True            # cache-coherent view schedule
    seed: int = 0


def _cam_arrays(cam):
    return (cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy)


def train_flat_scene(
    views: Sequence,                  # Camera pytrees (with .image)
    points: np.ndarray, colors: np.ndarray,
    scene_extent: float,
    n_iters: int,
    capacity: int,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    pcfg: PipelineConfig = PipelineConfig(),
    skybox_num: int = 0,
    sh_degree: int = 3,
    scale_big_gauss: bool = True,
    logger: Optional[MetricsLogger] = None,
    stage: str = "chunk",
    initial_state: Optional[gm.GaussianState] = None,
    bg=None,
) -> flat.FlatTrainState:
    """The train_single.py loop: step + densify/reset on schedule.

    ``initial_state`` lets the caller pass a scaffold-conditioned chunk
    state (gm.create_with_scaffold); otherwise a fresh point-cloud init."""
    state = initial_state if initial_state is not None else \
        gm.create_from_points(
            points, colors, capacity=capacity, sh_degree=sh_degree,
            n_exposures=_exposure_bucket(len(views)),
            scene_radius=scene_extent,
            skybox_num=skybox_num)
    skybox_num = state.n_skybox
    ts = flat.init_flat_train(state)

    centers = np.stack([np.asarray(v.campos) for v in views])
    order = scheduler.view_schedule(centers, len(views), n_iters,
                                    seed=pcfg.seed, walk=pcfg.mh_walk)
    w, h = views[0].width, views[0].height

    bg = jnp.zeros(3) if bg is None else bg
    for it in range(n_iters):
        v = views[int(order[it])]
        ts, aux = flat.train_step(
            ts, *_cam_arrays(v), v.image, bg,
            alpha_mask=v.alpha_mask,
            mono_invdepth=None if v.invdepth is None else v.invdepth[0],
            depth_mask=None if v.depth_mask is None else v.depth_mask[0],
            exposure_idx=v.exposure_idx, scene_extent=scene_extent,
            opt=opt, cfg=cfg, width=w, height=h, k_max=pcfg.k_max,
            sh_degree=sh_degree, use_exposure=True,
            skybox_locked=skybox_num > 0, scale_big_gauss=scale_big_gauss)
        if (pcfg.densify_from_iter < it < opt.densify_until_iter
                and it % pcfg.densification_interval == 0):
            ts, n_split = flat.densify_step(ts, scene_extent, opt=opt)
        if it > 0 and it % pcfg.opacity_reset_interval == 0 \
                and it < opt.densify_until_iter:
            ts = flat.reset_opacity(ts)
        if logger and it % 50 == 0:
            logger.log(stage=stage, it=it, loss=float(aux.loss),
                       l1=float(aux.l1),
                       n_alive=int(jnp.sum(ts.gaussians.alive)))
    return ts



def _exposure_bucket(n: int) -> int:
    """Exposure-table capacity bucket (power of two, floor 8). Per-chunk
    view counts otherwise give every chunk a distinct exposure shape, and
    every jitted step/densify program recompiles per chunk (~60 s each via
    the remote compile service — the PIPELINE_r04 post_densify wall).
    Rows past the real view count are simply never indexed."""
    b = 8
    while b < n:
        b <<= 1
    return b

def state_to_hierarchy(ts: flat.FlatTrainState) -> dhier_io.DHier:
    """Trained flat state -> merge hierarchy (.dhier), skipping skybox rows
    (the GaussianHierarchyCreator stage, mainHierarchyCreator.cpp:41-184)."""
    g = ts.gaussians
    alive = np.asarray(g.alive)
    sky = g.n_skybox
    rows = np.where(alive)[0]
    rows = rows[rows >= sky]

    act = gm.activate(g)
    means = np.asarray(act.means3d)[rows]
    scales = np.asarray(act.scales)[rows]
    quats = np.asarray(act.quats)[rows]
    ops = np.asarray(act.opacities)[rows]
    shs = np.asarray(act.shs)[rows]

    # input filtering (mainHierarchyCreator.cpp:87-152): drop NaN/Inf/huge
    finite = (np.isfinite(means).all(1) & np.isfinite(scales).all(1)
              & np.isfinite(quats).all(1) & (ops > 0.0)
              & (scales.max(1) < 10.0))
    means, scales, quats = means[finite], scales[finite], quats[finite]
    ops, shs = ops[finite], shs[finite]

    h = hb.build_hierarchy(means, scales, quats, ops, shs)
    sh_degree = {1: 0, 4: 1, 9: 2, 16: 3}[shs.shape[1]]
    return dhier_io.DHier(
        sh_degree=sh_degree, pos=h.pos, quat=h.quat,
        log_scale=np.log(np.maximum(h.scale, 1e-12)).astype(np.float32),
        opacity=np.clip(h.opacity, 1e-4, 1.0 - 1e-6).astype(np.float32),
        shs=h.sh.astype(np.float32), nodes=h.nodes)


def post_optimize(
    d: dhier_io.DHier,
    views: Sequence,
    scene_extent: float,
    n_iters: int,
    capacity: int,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    pcfg: PipelineConfig = PipelineConfig(),
    skybox_num: int = 0,
    logger: Optional[MetricsLogger] = None,
) -> post_mod.PostTrainState:
    """The train_post.py loop: SPT cut per view + post step + MCMC rounds."""
    from hlod_gaussians_tpu.hierarchy import spt as spt_mod

    state = post_mod.create_from_dhier(d, capacity, skybox_num=skybox_num,
                                       scene_radius=scene_extent,
                                       n_exposures=_exposure_bucket(len(views)))
    ts = post_mod.init_post_train(state)
    forest = post_mod.rebuild_spt(state, post=post)

    centers = np.stack([np.asarray(v.campos) for v in views])
    order = scheduler.view_schedule(centers, len(views), n_iters,
                                    seed=pcfg.seed + 1, walk=pcfg.mh_walk)
    w, h = views[0].width, views[0].height
    key = jax.random.PRNGKey(pcfg.seed)
    dummy = jnp.zeros((capacity,))

    for it in range(n_iters):
        v = views[int(order[it])]
        # over-budget fallback (train_post.py:324-430) evaluated INSIDE the
        # jit — no device->host sync on the cut size per view
        cut = spt_mod.spt_cut_budgeted(
            forest, dummy, v.campos, v.full_proj,
            jnp.int32(post.max_gaussian_budget),
            grow=post.distance_multiplier_until_budget,
            use_frustum=post.use_frustum_culling)
        ws_mask = cut.gaussian_mask
        if post.use_occlusion_culling:
            # drop working-set rows invisible in a low-res pre-render
            # (train_post.py:344-351 culls the coarse cut the same way)
            from hlod_gaussians_tpu.models import reorder
            ws_mask = reorder.occlusion_cull(
                ts.gaussians, ws_mask, *_cam_arrays(v))
        ts, aux = post_mod.post_train_step(
            ts, ws_mask, *_cam_arrays(v), v.image, jnp.zeros(3),
            scene_extent, opt=opt, post=post, cfg=cfg, width=w, height=h,
            # the fork trains post at SH degree Max_SH_Degree=1
            # (train_post.py:109,151) — higher bands keep their built values
            k_max=pcfg.k_max,
            sh_degree=min(d.sh_degree, post.max_sh_degree))
        densify_every = (pcfg.post_densify_interval
                         if pcfg.post_densify_interval > 0
                         else post.densify_interval)
        if it > 0 and it % densify_every == 0:
            key, sub = jax.random.split(key)
            extra_dead = None
            if post.use_mip_respawn:
                # relocate SPT entries no training camera can ever select
                # (train_post.py:752-761)
                extra_dead = spt_mod.mip_respawn_mask(
                    forest, dummy, jnp.asarray(centers.astype(np.float32)))
            ts, stats = post_mod.densify_round(ts, sub, post=post,
                                               extra_dead=extra_dead)
            forest = post_mod.rebuild_spt(ts.gaussians, post=post)
            if logger:
                logger.log(stage="post_densify", it=it,
                           **{k: int(s) for k, s in stats.items()})
        if logger and it % 50 == 0:
            logger.log(stage="post", it=it, loss=float(aux.loss),
                       n_rendered=int(aux.n_rendered),
                       n_cut=int(cut.n_selected))
    return ts


def train_coarse_scaffold(
    views: Sequence,
    points: np.ndarray, colors: np.ndarray,
    scene_extent: float,
    n_iters: int,
    capacity: int,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    pcfg: "PipelineConfig" = None,
    skybox_num: int = 100_000,
    logger: Optional[MetricsLogger] = None,
) -> flat.FlatTrainState:
    """Faithful coarse stage (train_coarse.py:29-175): SH degree 1, xyz
    frozen, opacity logit -3, random background per step, no exposure, no
    densification, 0.1*extent big-Gaussian shrink."""
    pcfg = pcfg or PipelineConfig()
    coarse_opt = coarse_mod.coarse_opt_config(opt)
    ts = coarse_mod.init_coarse(points, colors, capacity, scene_extent,
                                skybox_num=skybox_num,
                                n_exposures=_exposure_bucket(len(views)))
    centers = np.stack([np.asarray(v.campos) for v in views])
    order = scheduler.view_schedule(centers, len(views), n_iters,
                                    seed=pcfg.seed, walk=pcfg.mh_walk)
    w, h = views[0].width, views[0].height
    key = jax.random.PRNGKey(pcfg.seed + 7)
    for it in range(n_iters):
        v = views[int(order[it])]
        key, sub = jax.random.split(key)
        ts, aux = coarse_mod.coarse_step(
            ts, _cam_arrays(v), v.image, sub, scene_extent,
            opt=coarse_opt, cfg=cfg, width=w, height=h, k_max=pcfg.k_max)
        if logger and it % 50 == 0:
            logger.log(stage="coarse", it=it, loss=float(aux.loss),
                       l1=float(aux.l1))
    return ts


def resolution_args(mcfg) -> tuple:
    """(resolution_scale, max_width) for load_view from ModelConfig.resolution
    (reference utils/camera_utils.py:19-54): -1 = native capped at 1600 px;
    1/2/4/8 = explicit downscale factor, no cap."""
    if mcfg.resolution in (1, 2, 4, 8):
        return float(mcfg.resolution), 0
    return 1.0, 1600


def run_pipeline(
    scene: SceneInfo,
    view_loader: Callable[[object], "Camera"] = None,
    output_dir: str = "",
    *,
    pcfg: PipelineConfig = PipelineConfig(),
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    mcfg: Optional["ModelConfig"] = None,
    logger: Optional[MetricsLogger] = None,
    skip_if_exists: bool = False,
    keep_running: bool = False,
) -> dhier_io.DHier:
    """Full pipeline on a loaded scene. Returns the merged hierarchy.

    view_loader maps a CameraInfo to a Camera pytree (defaults to
    data.scene.load_view at ModelConfig.resolution).

    ``skip_if_exists`` resumes a partially-completed run from output_dir
    artifacts (the reference's --skip_if_exists, scripts/full_train.py:58,82,
    158); ``keep_running`` continues past failed chunks (--keep_running,
    scripts/full_train.py:59). ``mcfg`` supplies the reference ModelParams
    knobs: resolution, white_background, skip_scale_big_gauss, sh_degree,
    scaffold_file (resume the coarse stage from a saved scaffold), cap_max
    (overrides PostConfig.max_cap when > 0)."""
    import dataclasses as _dc

    from hlod_gaussians_tpu.config import ModelConfig
    from hlod_gaussians_tpu.utils import checkpoint as ckpt

    mcfg = mcfg or ModelConfig()
    if mcfg.cap_max > 0:
        post = _dc.replace(post, max_cap=mcfg.cap_max)
    bg = jnp.ones(3) if mcfg.white_background else jnp.zeros(3)

    if view_loader is None:
        # one exposure slot per image (reference assigns exposures per
        # image; a constant exposure_idx=0 would collapse them all into
        # one shared matrix)
        scale, max_w = resolution_args(mcfg)
        views_all = [load_view(ci, resolution_scale=scale, max_width=max_w,
                               exposure_idx=i,
                               train_test_exp=mcfg.train_test_exp)
                     for i, ci in enumerate(scene.train_cameras)]
    else:
        views_all = [view_loader(ci) for ci in scene.train_cameras]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

    # 1) coarse scaffold over every view (random bg, frozen xyz, skybox);
    # a pre-trained scaffold_file (reference --scaffold_file) skips it
    coarse_path = os.path.join(output_dir, "scaffold.npz") if output_dir else ""
    if mcfg.scaffold_file:
        ts_coarse = ckpt.load_flat_state(mcfg.scaffold_file)
    elif skip_if_exists and coarse_path and os.path.exists(coarse_path):
        ts_coarse = ckpt.load_flat_state(coarse_path)
    else:
        ts_coarse = train_coarse_scaffold(
            views_all, scene.points, scene.colors, scene.extent,
            pcfg.coarse_iters, pcfg.coarse_capacity, opt=opt, cfg=cfg,
            pcfg=pcfg, skybox_num=pcfg.skybox_num, logger=logger)
        if coarse_path:
            ckpt.save_flat_state(coarse_path, ts_coarse)

    # 2) chunks (falls back to one whole-scene "chunk")
    chunks = chunking.make_chunks(scene, chunk_size=pcfg.chunk_size,
                                  point_padding=pcfg.chunk_point_padding,
                                  min_n_cams=1, min_points=1)
    if not chunks:
        chunks = [chunking.Chunk(index=(0, 0),
                                 center=np.zeros(3, np.float32),
                                 extent=np.full(3, pcfg.chunk_size, np.float32),
                                 cameras=list(scene.train_cameras),
                                 point_mask=np.ones(len(scene.points), bool))]

    # multi-process: each process trains its block of chunks (the SLURM job
    # array, scripts/full_train.py:161-236, as one jax.distributed program
    # over a shared filesystem); process 0 merges.
    nproc = jax.process_count()
    mine = set(range(len(chunks)))
    if nproc > 1:
        from hlod_gaussians_tpu.parallel import distributed as dist
        assert output_dir, "multi-process pipeline needs a shared output_dir"
        mine = set(dist.process_chunk_assignment(len(chunks)))

    info_to_idx = {id(ci): i for i, ci in enumerate(scene.train_cameras)}
    chunk_dhiers: List[dhier_io.DHier] = []
    centers = []
    for chunk_i, chunk in enumerate(chunks):
        if chunk_i not in mine:
            continue
        cd = os.path.join(output_dir,
                          f"chunk_{chunk.index[0]}_{chunk.index[1]}") \
            if output_dir else ""
        hier_path = os.path.join(cd, "hierarchy.dhier_opt") if cd else ""
        if skip_if_exists and hier_path and os.path.exists(hier_path):
            chunk_dhiers.append(dhier_io.load_dhier(hier_path))
            centers.append(chunk.center)
            continue
        try:
            # chunk-LOCAL exposure slots: the chunk state sizes its exposure
            # table to len(cams), so the views' global exposure indices must
            # be remapped or distinct images silently alias one slot
            cams = [dataclasses.replace(views_all[info_to_idx[id(ci)]],
                                        exposure_idx=j)
                    for j, ci in enumerate(chunk.cameras)]
            pts = scene.points[chunk.point_mask]
            cols = scene.colors[chunk.point_mask]
            # scaffold conditioning (gaussian_model.py:866-919): ring-select
            # the trained scaffold around this chunk and prepend it
            init_state = gm.create_with_scaffold(
                ts_coarse.gaussians, chunk.center, float(chunk.extent[0]),
                pts, cols, pcfg.chunk_capacity, sh_degree=mcfg.sh_degree,
                n_exposures=_exposure_bucket(len(cams)),
                # dense synthetic scaffolds can put more ring rows around a
                # chunk than its whole capacity; cap with headroom for the
                # chunk's own points (+pad), evenly subsampled
                max_scaffold_rows=max(
                    0, pcfg.chunk_capacity - len(pts) - 4096))
            ts_chunk = train_flat_scene(
                cams, pts, cols, scene.extent, pcfg.chunk_iters,
                pcfg.chunk_capacity, opt=opt, cfg=cfg, pcfg=pcfg,
                sh_degree=mcfg.sh_degree, logger=logger,
                stage=f"chunk{chunk.index}", initial_state=init_state,
                scale_big_gauss=not mcfg.skip_scale_big_gauss, bg=bg)
            d = state_to_hierarchy(ts_chunk)
            # the merge hierarchy has ~2n-1 nodes for n trained leaves, so
            # a chunk trained past half capacity would not fit the chunk
            # capacity — size the post stage to the actual tree
            post_cap = max(pcfg.chunk_capacity,
                           1 << int(np.ceil(np.log2(d.pos.shape[0] + 1))))
            d_post = post_optimize(
                d, cams, scene.extent, pcfg.post_iters, post_cap,
                opt=opt, post=post, cfg=cfg, pcfg=pcfg, logger=logger)
            chunk_dhiers.append(post_mod.state_to_dhier(d_post.gaussians))
            centers.append(chunk.center)
            if cd:
                chunking.save_chunk_meta(cd, chunk)
                dhier_io.save_dhier(hier_path, chunk_dhiers[-1])
                # anchors.bin next to the hierarchy (the merger chunk path's
                # AppearanceFilter, mainHierarchyMerger.cpp:79-80)
                from hlod_gaussians_tpu.hierarchy import filter as flt
                dd = chunk_dhiers[-1]
                vps = np.stack([np.asarray(v.campos) for v in cams[:64]])
                anchors = flt.compute_anchors(
                    dd.nodes, dd.pos, np.exp(dd.log_scale).max(1),
                    np.ones(dd.nodes.shape[0], bool), vps,
                    post.spt_target_granularity)
                flt.write_anchors(os.path.join(cd, "anchors.bin"), anchors)
        except Exception as e:
            if not keep_running:
                raise
            import traceback
            traceback.print_exc()
            if logger:
                logger.log(stage=f"chunk{chunk.index}", error=1,
                           message=f"{type(e).__name__}: {e}")

    if nproc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("chunks_done")
        if jax.process_index() != 0:
            return None
        # consolidate from the shared filesystem (every process's chunks)
        chunk_dhiers, centers = [], []
        for chunk in chunks:
            cd = os.path.join(output_dir,
                              f"chunk_{chunk.index[0]}_{chunk.index[1]}")
            hp = os.path.join(cd, "hierarchy.dhier_opt")
            if os.path.exists(hp):
                chunk_dhiers.append(dhier_io.load_dhier(hp))
                centers.append(chunk.center)

    if not chunk_dhiers:
        raise RuntimeError(
            "no chunk hierarchies to merge — every chunk failed or no "
            "hierarchy.dhier_opt artifacts exist (see the per-chunk error "
            "log entries above)")
    merged = merge.merge_hierarchies(chunk_dhiers, np.stack(centers))
    if output_dir:
        dhier_io.save_dhier(os.path.join(output_dir, "merged.dhier"), merged)
    return merged


def run_pipeline_no_chunks(
    scene: SceneInfo,
    view_loader: Callable[[object], "Camera"] = None,
    output_dir: str = "",
    *,
    pcfg: PipelineConfig = PipelineConfig(),
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    mcfg: Optional["ModelConfig"] = None,
    logger: Optional[MetricsLogger] = None,
) -> dhier_io.DHier:
    """Single-scene variant without chunking (reference train_no_chunks.py:
    98-265): coarse scaffold over every view -> hierarchy built directly on
    the scaffold -> in-process post-optimization. No merge step (one root).
    ``mcfg.pretrained`` (a 3DGS .ply) replaces the coarse training stage
    with the saved point cloud (reference --pretrained,
    scene/__init__.py:82-83)."""
    from hlod_gaussians_tpu.config import ModelConfig

    mcfg = mcfg or ModelConfig()
    if view_loader is None:
        view_loader = load_view
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    views_all = [view_loader(ci) for ci in scene.train_cameras]

    if mcfg.pretrained:
        from hlod_gaussians_tpu.data import ply as ply_io
        g = gm.create_from_gaussian_ply(
            ply_io.load_gaussian_ply(mcfg.pretrained), pcfg.coarse_capacity,
            n_exposures=_exposure_bucket(len(views_all)))
        ts_coarse = flat.init_flat_train(g)
    else:
        ts_coarse = train_coarse_scaffold(
            views_all, scene.points, scene.colors, scene.extent,
            pcfg.coarse_iters, pcfg.coarse_capacity, opt=opt, cfg=cfg,
            pcfg=pcfg, skybox_num=pcfg.skybox_num, logger=logger)

    d = state_to_hierarchy(ts_coarse)
    ts_post = post_optimize(
        d, views_all, scene.extent, pcfg.post_iters, pcfg.chunk_capacity,
        opt=opt, post=post, cfg=cfg, pcfg=pcfg,
        skybox_num=pcfg.skybox_num, logger=logger)
    out = post_mod.state_to_dhier(ts_post.gaussians)
    if output_dir:
        dhier_io.save_dhier(os.path.join(output_dir, "hierarchy.dhier_opt"),
                            out)
    return out
