"""Command-line entry points.

The reference exposes its pipeline as a family of argparse scripts
(scripts/full_train.py, train_*.py, render_hierarchy.py,
eval_hierarchy_dynamic.py, hierarchy_viewer.py). Here one `python -m
hlod_gaussians_tpu.cli <command>` front end drives the same stages through
the library API.
"""

from __future__ import annotations

import argparse
import json
import os


def cmd_full_train(args):
    from hlod_gaussians_tpu.config import (ModelConfig, OptimizationConfig,
                                           PostConfig, RasterizerConfig)
    from hlod_gaussians_tpu.data.scene import load_colmap_scene
    from hlod_gaussians_tpu.pipeline import full_train
    from hlod_gaussians_tpu.utils.metrics import MetricsLogger

    mcfg = ModelConfig(
        source_path=args.source_path, model_path=args.output,
        images=args.images, depths=args.depths,
        alpha_masks=args.alpha_masks, eval=args.eval,
        resolution=args.resolution, white_background=args.white_background,
        skip_scale_big_gauss=args.skip_scale_big_gauss,
        scaffold_file=args.scaffold_file, skybox_num=args.skybox_num,
        train_test_exp=args.train_test_exp)
    scene = load_colmap_scene(mcfg.source_path, images_dir=mcfg.images,
                              depths_dir=mcfg.depths,
                              alpha_masks_dir=mcfg.alpha_masks,
                              eval_split=mcfg.eval,
                              train_test_exp=mcfg.train_test_exp)
    pcfg = full_train.PipelineConfig(
        coarse_iters=args.coarse_iters, chunk_iters=args.chunk_iters,
        post_iters=args.post_iters, skybox_num=mcfg.skybox_num,
        chunk_size=args.chunk_size)
    out_dir = mcfg.model_path
    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"),
                           echo=True)
    cfg = RasterizerConfig(backend=args.backend, tile_w=16, tile_h=8,
                           max_dup=1 << args.max_dup_log2)
    merged = full_train.run_pipeline(
        scene, output_dir=out_dir, pcfg=pcfg, cfg=cfg, mcfg=mcfg,
        opt=OptimizationConfig(), post=PostConfig(), logger=logger)
    print(f"merged hierarchy: {merged.nodes.shape[0]} nodes -> "
          f"{os.path.join(out_dir, 'merged.dhier')}")


def cmd_eval(args):
    import numpy as np

    from hlod_gaussians_tpu import eval as eval_mod
    from hlod_gaussians_tpu.config import PipelineConfig, RasterizerConfig
    from hlod_gaussians_tpu.data import dhier as dhier_io
    from hlod_gaussians_tpu.data.scene import load_colmap_scene, load_view
    from hlod_gaussians_tpu.ops.lpips import make_lpips
    from hlod_gaussians_tpu.train import post as post_mod

    boxes = None
    if args.hierarchy.endswith(".hier"):
        # upstream box-metric hierarchy: cut on projected box size
        # (render_hierarchy.py protocol)
        from hlod_gaussians_tpu.hierarchy import boxes as boxes_mod
        up = dhier_io.load_hier(args.hierarchy)
        d, nb = boxes_mod.upstream_to_fork(up)
        cap = 1 << (int(np.ceil(np.log2(d.pos.shape[0] + 1))))
        state = post_mod.create_from_dhier(d, capacity=cap)
        pad = lambda a: np.concatenate(
            [a, np.zeros((cap - a.shape[0],) + a.shape[1:], a.dtype)])
        boxes = (pad(nb.lo), pad(nb.hi), pad(nb.max_side))
    else:
        d = dhier_io.load_dhier(args.hierarchy)
        cap = 1 << (int(np.ceil(np.log2(d.pos.shape[0] + 1))))
        state = post_mod.create_from_dhier(d, capacity=cap)
        if args.tau:
            # the tau protocol cuts on PROJECTED BOXES
            # (render_hierarchy.py:56-80); a .dhier carries no boxes, so
            # build them bottom-up from the tree — silently falling back
            # to the dynamic metric would misreport the sweep
            from hlod_gaussians_tpu.hierarchy import boxes as boxes_mod
            nb = boxes_mod.compute_node_boxes(
                np.asarray(state.nodes), np.asarray(state.xyz),
                np.exp(np.asarray(state.log_scale)).max(-1),
                alive=np.asarray(state.alive))
            boxes = (nb.lo, nb.hi, nb.max_side)
    scene = load_colmap_scene(args.source_path, images_dir=args.images,
                              eval_split=True)
    cams = [load_view(ci) for ci in scene.test_cameras[:args.max_views]]
    gts = [np.asarray(c.image) for c in cams]
    levels = [float(x) for x in args.levels.split(",")]
    pipe = PipelineConfig(antialiasing=args.antialiasing, debug=args.debug)
    results = eval_mod.eval_views(
        state, cams, gts, levels, level_is_tau=args.tau, boxes=boxes,
        cfg=RasterizerConfig(backend=args.backend, tile_w=16, tile_h=8),
        antialiasing=pipe.antialiasing,
        lpips_fn=make_lpips(args.lpips_weights))
    if pipe.debug:
        # reference --debug dumps raster state on anomaly (train.py's
        # debug path); here: the per-limit node-count curve that localizes
        # a bad cut before rendering is even attempted
        from hlod_gaussians_tpu import debug as debug_mod
        cam0 = cams[0]
        zdir = np.asarray(cam0.world_view)[:3, 2]
        curve = debug_mod.gaussians_per_limit(
            state, np.asarray(cam0.campos), zdir, limits=levels)
        print(f"[debug] nodes per level {levels}: {curve}")
    for r in results:
        print(json.dumps(dict(level=r.level, psnr=round(r.psnr, 3),
                              ssim=round(r.ssim, 4), lpips=r.lpips,
                              gmsd=round(r.gmsd, 5),
                              mean_rendered=r.mean_rendered)))


_RES_BUCKETS = ((256, 192), (512, 384), (800, 600), (1024, 768),
                (1280, 960), (1600, 1200), (1920, 1440))


def _res_bucket(w, h):
    """Round a client window up to a fixed bucket so render_lod compiles at
    most once per bucket instead of per window size (remote-compile TPU
    path: minutes per shape)."""
    for bw, bh in _RES_BUCKETS:
        if w <= bw and h <= bh:
            return bw, bh
    return _RES_BUCKETS[-1]


def cmd_viewer(args):
    import numpy as np
    import jax.numpy as jnp

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.data import dhier as dhier_io
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.train import post as post_mod
    from hlod_gaussians_tpu.viewer import maintenance as maint
    from hlod_gaussians_tpu.viewer.server import ViewerServer

    d = dhier_io.load_dhier(args.hierarchy)
    cap = 1 << (int(np.ceil(np.log2(d.pos.shape[0] + 1))))
    state = post_mod.create_from_dhier(d, capacity=cap)
    act = gm.activate(state)
    cfg = RasterizerConfig(backend=args.backend, tile_w=16, tile_h=16,
                           max_dup=1 << 20)

    # persistent incremental cut (runtime_switching.cu:236-491 re-design)
    budget = 1 << 19
    active = jnp.asarray(maint.initial_cut(np.asarray(state.nodes),
                                           np.asarray(state.alive)))
    ctrl = maint.BudgetController(budget=budget)
    max_scale = jnp.max(act.scales, axis=-1)
    # static tree per session: one parent gather, gather-free per-frame cuts
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    pcache = cut_mod.build_parent_cache(state.nodes, act.means3d, max_scale)
    # static child+parent feature table: per-frame interpolation is one
    # wide gather (no parent lookup, no sign fix)
    itab = cut_mod.build_interp_table(
        dict(means3d=act.means3d, scales=act.scales, quats=act.quats,
             opacities=act.opacities, shs=act.shs), state.nodes)

    # viewer slider state (reference hierarchy_viewer.py:220-247)
    frozen_vp = [None]
    pending_count = [None]     # one-frame-lagged active-node count

    # false-color variants of the SH DC band: per-subtree hash coloring
    # (render_SPTs), camera-distance and size ramps
    from hlod_gaussians_tpu.models.gaussians import NODE_PARENT
    nodes_np = np.asarray(state.nodes)
    root_of = np.arange(state.capacity)
    par = nodes_np[:, NODE_PARENT]
    for _ in range(64):
        nxt = np.where(par[root_of] >= 0, par[root_of], root_of)
        if (nxt == root_of).all():
            break
        root_of = nxt
    rng_cols = ((root_of * 2654435761) % 255) / 255.0
    spt_dc = np.stack([rng_cols, (rng_cols * 7.13) % 1.0,
                       (rng_cols * 3.77) % 1.0], axis=-1)
    spt_shs = jnp.asarray(
        ((spt_dc - 0.5) / 0.28209479177387814)[:, None, :]
        .astype(np.float32))

    def render_fn(cam, opts):
        nonlocal active
        sliders = opts.get("slider", {})
        target = float(sliders.get("granularity", ctrl.target))
        target *= max(float(sliders.get("distance_multiplier", 1.0)), 1e-6)
        if sliders.get("freeze_view", 0) > 0:
            if frozen_vp[0] is None:
                frozen_vp[0] = cam.campos.astype(np.float32)
        else:
            frozen_vp[0] = None
        cut_vp = jnp.asarray(frozen_vp[0] if frozen_vp[0] is not None
                             else cam.campos.astype(np.float32))
        # a few split/collapse passes per frame: the cut tracks the camera
        # incrementally instead of being recomputed from scratch. No host
        # sync inside the frame — convergence is spread across frames (the
        # whole point of incremental maintenance), and the budget
        # controller is fed the PREVIOUS frame's count (fetched while this
        # frame's work occupies the device).
        for _ in range(2):
            active, n_s, n_c = maint.incremental_cut_step(
                state.nodes, act.means3d, max_scale, state.alive, active,
                cut_vp, max(target, 1e-9))
        n_active = jnp.sum(active)
        n_active.copy_to_host_async()
        prev_n = pending_count[0]
        pending_count[0] = n_active
        if prev_n is not None:
            # regulate ctrl.target (the slider BASE) for the NEXT frame;
            # this frame keeps the slider-scaled `target` so the cut mask
            # and the render's ts/kids use the SAME granularity
            ctrl.update(int(prev_n))
            # SIBR status blob fields (hierarchy_viewer.py:538)
            srv.status["train_params"] = {
                "Num_Rendered": int(prev_n),
                "Percentage_Rendered": int(prev_n) / max(n_alive, 1)}

        render_mask = active
        if getattr(args, "occlusion_cull", False):
            # reference hierarchy_viewer.py:280-282: render only cut nodes
            # that contributed to a low-res pre-pass (the maintained cut
            # itself is untouched — culling is a per-frame render filter)
            from hlod_gaussians_tpu.models import reorder
            render_mask = reorder.occlusion_cull(
                state, active,
                jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                jnp.asarray(cam.campos.astype(np.float32)),
                jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy))

        shs_r = act.shs
        itab_r = itab
        if sliders.get("render_SPTs", 0) > 0:
            shs_r = jnp.concatenate(
                [spt_shs, jnp.zeros_like(act.shs[:, 1:])], axis=1)
            itab_r = None      # false-color mode: interp on the fly

        bw, bh = _res_bucket(cam.width, cam.height)
        sy = bh / cam.height
        out, _ = render_mod.render_lod(
            act.means3d, act.scales, act.quats, act.opacities, shs_r,
            state.nodes, state.alive,
            jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.campos.astype(np.float32)),
            jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy),
            jnp.zeros(3), max(target, 1e-9), None, render_mask, pcache,
            None, itab_r,
            sh_degree=state.sh_degree, width=bw, height=bh,
            budget=budget, n_skybox=state.n_skybox, cfg=cfg)
        img = np.asarray(jnp.clip(out.image, 0, 1))
        img = np.transpose(img, (1, 2, 0))
        if (bw, bh) != (cam.width, cam.height):
            yi = np.clip((np.arange(cam.height) * sy).astype(int), 0, bh - 1)
            xi = np.clip((np.arange(cam.width) * bw / cam.width).astype(int),
                         0, bw - 1)
            img = img[yi][:, xi]
        return (img * 255).astype(np.uint8)

    srv = ViewerServer(args.host, args.port)
    n_alive = int(np.asarray(state.alive).sum())
    srv.status = dict(num_gaussians=n_alive, sh_degree=state.sh_degree)
    print(f"viewer listening on {args.host}:{srv.port}")
    try:
        import time as _time
        while True:
            if srv.poll_once(render_fn) is None:
                _time.sleep(0.02)   # idle: don't busy-spin on try_connect
    except KeyboardInterrupt:
        srv.close()


def cmd_create_hierarchy(args):
    if args.native:
        from hlod_gaussians_tpu.native import build_hierarchy_file
        n = build_hierarchy_file(args.input, args.output)
    else:
        import numpy as np

        from hlod_gaussians_tpu.data import dhier as dhier_io, ply as ply_io
        from hlod_gaussians_tpu.hierarchy import build as hb

        g = ply_io.load_gaussian_ply(args.input)
        scales = np.exp(g.log_scale)
        ops = 1.0 / (1.0 + np.exp(-g.opacity))
        shs = np.concatenate([g.f_dc, g.f_rest], axis=1)
        h = hb.build_hierarchy(g.xyz, scales, g.quat, ops, shs)
        deg = {1: 0, 4: 1, 9: 2, 16: 3}[shs.shape[1]]
        dhier_io.save_dhier(args.output, dhier_io.DHier(
            sh_degree=deg, pos=h.pos, quat=h.quat,
            log_scale=np.log(np.maximum(h.scale, 1e-12)).astype(np.float32),
            opacity=np.clip(h.opacity, 1e-4, 1 - 1e-6).astype(np.float32),
            shs=h.sh.astype(np.float32), nodes=h.nodes))
        n = h.nodes.shape[0]
    # graph dump next to the hierarchy, as the reference creator always
    # does (mainHierarchyCreator.cpp:184)
    from hlod_gaussians_tpu.data import dhier as dhier_io
    d = dhier_io.load_dhier(args.output)
    gdf = os.path.splitext(args.output)[0] + ".gdf"
    dhier_io.save_gdf(gdf, d.nodes)
    print(f"wrote {n} nodes -> {args.output} (+ {os.path.basename(gdf)})")


def main(argv=None):
    p = argparse.ArgumentParser(prog="hlod_gaussians_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("full-train", help="end-to-end pipeline")
    t.add_argument("--source_path", "-s", required=True)
    t.add_argument("--output", "-o", required=True)
    t.add_argument("--images", default="images")
    t.add_argument("--depths", default="")
    t.add_argument("--alpha_masks", default="")
    t.add_argument("--eval", action="store_true")
    t.add_argument("--resolution", "-r", type=int, default=-1)
    t.add_argument("--white_background", action="store_true")
    t.add_argument("--train_test_exp", action="store_true",
                   help="train exposures on the visible half of test views")
    t.add_argument("--skip_scale_big_gauss", action="store_true")
    t.add_argument("--scaffold_file", default="",
                   help="saved scaffold.npz: skip the coarse stage")
    t.add_argument("--coarse_iters", type=int, default=30_000)
    t.add_argument("--chunk_iters", type=int, default=30_000)
    t.add_argument("--post_iters", type=int, default=15_000)
    t.add_argument("--skybox_num", type=int, default=100_000)
    t.add_argument("--chunk_size", type=float, default=100.0)
    t.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    t.add_argument("--max_dup_log2", type=int, default=21)
    t.set_defaults(fn=cmd_full_train)

    e = sub.add_parser("eval", help="granularity sweep on the test split")
    e.add_argument("--hierarchy", required=True)
    e.add_argument("--source_path", "-s", required=True)
    e.add_argument("--images", default="images")
    e.add_argument("--levels", default="0,0.01,0.1")
    e.add_argument("--tau", action="store_true",
                   help="interpret levels as tau pixels")
    e.add_argument("--max_views", type=int, default=50)
    e.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    e.add_argument("--lpips_weights", default=None)
    e.add_argument("--antialiasing", action="store_true",
                   help="EWA convolution AA (the alt-rasterizer variant)")
    e.add_argument("--debug", action="store_true",
                   help="print the per-level cut-size curve")
    e.set_defaults(fn=cmd_eval)

    v = sub.add_parser("viewer", help="SIBR-compatible live view server")
    v.add_argument("--hierarchy", required=True)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=6009)
    v.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    v.add_argument("--occlusion-cull", action="store_true",
                   help="low-res visibility pre-pass culls the cut per "
                        "frame (reference hierarchy_viewer.py:280-282)")
    v.set_defaults(fn=cmd_viewer)

    c = sub.add_parser("create-hierarchy", help="offline hierarchy build")
    c.add_argument("input", help="3DGS .ply")
    c.add_argument("output", help=".dhier path")
    c.add_argument("--native", action="store_true",
                   help="use the C++ creator")
    c.set_defaults(fn=cmd_create_hierarchy)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
