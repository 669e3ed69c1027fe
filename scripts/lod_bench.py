"""Hierarchical-cut render benchmark: the north-star LOD path at 1080p.

Builds a ~1M-node merge hierarchy from 512k synthetic leaves, then times
`render_lod` (granularity cut -> parent interpolation -> LOD-alpha blend)
across tau levels. Prints one JSON line per tau and records everything
(including per-tau escalation/truncation telemetry from the auto and
stream regulation loops) into LOD_r04.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    n_leaves = 1 << 19

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_leaves, 3)).astype(np.float32) * 10.0
    pts[:, 2] += 30.0
    scales = np.exp(rng.normal(size=(n_leaves, 3)) * 0.3 - 3.2).astype(np.float32)
    quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.3, 0.9, n_leaves).astype(np.float32)
    shs = rng.normal(size=(n_leaves, 1, 3)).astype(np.float32) * 0.3

    t0 = time.perf_counter()
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    t_build = time.perf_counter() - t0
    m = h.nodes.shape[0]
    print(json.dumps({"metric": "hierarchy_build", "value": round(t_build, 2),
                      "unit": f"s for {m} nodes",
                      "note": "first call in process; includes one-time "
                              "compile/warmup (~70s) — warm rebuild ~10s"}))

    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 20, tight_binning=True)

    pos = jnp.asarray(h.pos)
    scale = jnp.asarray(h.scale)
    quat = jnp.asarray(h.quat)
    op = jnp.asarray(np.clip(h.opacity, 0, 1))
    sh = jnp.asarray(h.sh)
    nodes = jnp.asarray(h.nodes)
    alive = jnp.ones((m,), bool)

    # parent cache: one gather per tree update, gather-free per-frame cuts
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))
    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))

    bg = jax.block_until_ready(jnp.zeros(3))

    def median3(run_window):
        """Median-of-3 measurement windows + spread (artifact-hygiene
        directive, VERDICT r04 #8): value is always the accepted
        measurement; the spread makes one-off transients self-evident."""
        rates = [run_window() for _ in range(3)]
        rates.sort()
        spread = (rates[-1] - rates[0]) / rates[1] * 100 if rates[1] else 0
        return rates[1], rates, round(spread, 1)

    record = {"rows": []}
    for tau in (0.0, 3.0, 6.0, 15.0):
        target = float(render_mod.tau_to_threshold(tau, float(cam.tan_fovx),
                                                   width))
        # device-resident bg/threshold: a fresh jnp.zeros per frame is an
        # extra tunnel interaction per frame (5-15 ms each)
        tgt = jax.block_until_ready(jnp.float32(max(target, 1e-9)))
        def run():
            out, n_sel = render_mod.render_lod(
                pos, scale, quat, op, sh, nodes, alive,
                cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
                cam.tan_fovy, bg, tgt, None, None,
                pcache,
                sh_degree=0, width=width, height=height,
                budget=1 << 20, cfg=cfg, k_max=512, use_frustum=False)
            return out.image, n_sel

        img, n_sel = run()
        jax.block_until_ready(img)

        def window():
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                img, _ = run()
            jax.block_until_ready(img)
            return width * height / ((time.perf_counter() - t0) / iters) / 1e6

        val, rates, spread = median3(window)
        row = {
            "metric": f"lod_render_1080p_tau{tau:g}",
            "value": round(val, 2),
            "unit": "Mpix/s",
            "fps": round(val * 1e6 / (width * height), 1),
            "windows": [round(r, 2) for r in rates],
            "spread_pct": spread,
            "n_rendered": int(n_sel)}
        record["rows"].append(row)
        print(json.dumps(row), flush=True)

        # budget-bucketed variant: the cut budget tracks the actual size;
        # md_state persists the escalated binning capacity across frames
        md_state = {}

        def run_auto():
            out = render_mod.render_lod_auto(
                pos, scale, quat, op, sh, nodes, alive,
                cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
                cam.tan_fovy, bg, tgt, None, pcache,
                sh_degree=0, width=width, height=height,
                cfg=cfg, k_max=512, use_frustum=False, md_state=md_state)
            return out[0].image

        img = run_auto()
        jax.block_until_ready(img)

        def window_auto():
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                img = run_auto()
            jax.block_until_ready(img)
            return width * height / ((time.perf_counter() - t0) / iters) / 1e6

        val, rates, spread = median3(window_auto)
        row = {
            "metric": f"lod_render_auto_1080p_tau{tau:g}",
            "value": round(val, 2),
            "unit": "Mpix/s", "fps": round(val * 1e6 / (width * height), 1),
            "windows": [round(r, 2) for r in rates],
            "spread_pct": spread,
            # regulation telemetry (round-4 directive #9): every escalation
            # is a silent full re-render — regressions show as counters
            "n_escalations": int(md_state.get("n_escalations", 0)),
            "md_buckets": {str(k): int(v) for k, v in md_state.items()
                           if isinstance(k, int)}}
        record["rows"].append(row)
        print(json.dumps(row), flush=True)

        # streaming variant: one-frame-lagged regulation, orbiting camera
        # (the realistic viewer loop — no per-frame host sync)
        st = {}

        def make_cam(i):
            a = 0.02 * i
            R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                          [-np.sin(a), 0, np.cos(a)]], np.float32)
            return make_camera(R, np.zeros(3), fovx=1.2, fovy=0.8,
                               width=width, height=height)

        # device-resident cameras ahead of the loop: the per-frame cost
        # under measure is the render, not 6 small H2D tunnel transfers
        cams = [make_cam(i) for i in range(26)]
        jax.block_until_ready([c.world_view for c in cams])

        def run_stream(i):
            ci = cams[i]
            out, _ = render_mod.render_lod_stream(
                pos, scale, quat, op, sh, nodes, alive,
                ci.world_view, ci.full_proj, ci.campos, ci.tan_fovx,
                ci.tan_fovy, bg, tgt, st,
                pcache=pcache, interp_table=itab,
                sh_degree=0, width=width, height=height,
                cfg=cfg, k_max=512, use_frustum=False)
            return out.image

        for i in range(6):          # warm: seed bucket, settle md
            img = run_stream(i)
        jax.block_until_ready(img)
        n_frames = 20
        fidx = [6]

        def window_stream():
            t0 = time.perf_counter()
            for i in range(n_frames):
                img = run_stream((fidx[0] + i) % len(cams))
            jax.block_until_ready(img)
            fidx[0] += n_frames
            return width * height / ((time.perf_counter() - t0) / n_frames) / 1e6

        val, rates, spread = median3(window_stream)
        row = {
            "metric": f"lod_render_stream_1080p_tau{tau:g}",
            "value": round(val, 2),
            "unit": "Mpix/s", "fps": round(val * 1e6 / (width * height), 1),
            "windows": [round(r, 2) for r in rates],
            "spread_pct": spread,
            # one-frame-lag feedback telemetry: truncated frames rendered
            # DEGRADED (capacity grows next frame); the settled buckets
            # show where the regulation converged
            "n_truncated_frames": int(st.get("n_truncated_frames", 0)),
            "budget_bucket": (st.get("budget") if isinstance(
                st.get("budget"), (int, str)) else None),
            "md_buckets": {str(k): int(v)
                           for k, v in st.get("md", {}).items()}}
        record["rows"].append(row)
        print(json.dumps(row), flush=True)

    record["provenance"] = (
        f"single v5e via remote tunnel; {m}-node tree from {n_leaves} "
        f"synthetic leaves, 1080p, orbiting stream windows; every row = median of 3 in-process windows with recorded spread")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LOD_r05.json"), "w") as f:
        json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
