"""Viewer streaming rates at REFERENCE-ENVELOPE tree scale: the 4.19M-node
forest from OFFLOAD_r05 (2M leaves), 1080p, orbiting camera, the same
render_lod_stream loop as lod_bench.py. The r04 verdict noted every LOD
number lived at 1M nodes; this pins the flagship path at 4x that.
Appends a `big_tree_rows` section to LOD_r05.json (median-of-3 windows)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = "/tmp/offload_r05_forest.npz"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    assert os.path.exists(CACHE), "run scripts/offload_bench3.py first"
    d = np.load(CACHE)
    m = d["nodes"].shape[0]
    width, height = 1920, 1080
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 23, tight_binning=True)

    pos = jnp.asarray(d["pos"])
    scale = jnp.asarray(d["scale"])
    quat = jnp.asarray(d["quat"])
    op = jnp.asarray(np.clip(d["opacity"], 0, 1))
    sh = jnp.asarray(d["sh"][:, :1])           # DC only for the viewer rate
    nodes = jnp.asarray(d["nodes"])
    alive = jnp.ones((m,), bool)

    t0 = time.perf_counter()
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))
    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))
    print(f"caches built in {time.perf_counter() - t0:.0f}s for {m} nodes",
          flush=True)
    bg = jax.block_until_ready(jnp.zeros(3))

    def make_cam(i):
        a = 2 * np.pi * i / 60
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        campos = np.array([8.0 * np.sin(a), 0.0, -8.0 * np.cos(a)],
                          np.float32)
        return make_camera(R, campos, fovx=1.2, fovy=0.8,
                           width=width, height=height)

    cams = [make_cam(i) for i in range(60)]
    jax.block_until_ready([c.world_view for c in cams])

    rows = []
    for tau in (0.0, 3.0, 6.0, 15.0):
        tgt = jax.block_until_ready(jnp.float32(max(
            float(render_mod.tau_to_threshold(
                tau, float(cams[0].tan_fovx), width)), 1e-9)))
        st = {}

        def frame(i):
            ci = cams[i % 60]
            o, _ = render_mod.render_lod_stream(
                pos, scale, quat, op, sh, nodes, alive,
                ci.world_view, ci.full_proj, ci.campos, ci.tan_fovx,
                ci.tan_fovy, bg, tgt, st, pcache=pcache,
                interp_table=itab, sh_degree=0, width=width,
                height=height, cfg=cfg, k_max=512, use_frustum=True)
            return o.image

        # warm over the ENTIRE orbit twice: with frustum culling the cut
        # size varies per view, the regulation walks several budget/
        # capacity buckets, and each new bucket is a cold compile — warm
        # partially and the compiles land inside the timed windows
        for i in range(120):
            img = frame(i)
        jax.block_until_ready(img)
        n_frames, fidx = 20, [120]
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_frames):
                img = frame(fidx[0] + i)
            jax.block_until_ready(img)
            fidx[0] += n_frames
            rates.append(width * height
                         / ((time.perf_counter() - t0) / n_frames) / 1e6)
        rates.sort()
        spread = (rates[-1] - rates[0]) / rates[1] * 100
        row = {
            "metric": f"lod_stream_bigtree_1080p_tau{tau:g}",
            "value": round(rates[1], 2), "unit": "Mpix/s",
            "fps": round(rates[1] * 1e6 / (width * height), 1),
            "windows": [round(r, 2) for r in rates],
            "spread_pct": round(spread, 1),
            "n_truncated_frames": int(st.get("n_truncated_frames", 0)),
            "budget_bucket": (st.get("budget") if isinstance(
                st.get("budget"), (int, str)) else None)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    p = os.path.join(ROOT, "LOD_r05.json")
    rec = json.load(open(p))
    rec["big_tree_rows"] = rows
    rec["big_tree_provenance"] = (
        f"{m}-node forest (OFFLOAD_r05 scene, 2M leaves), 1080p, 60-view "
        "orbit inside the shell, frustum culling ON; median of 3 windows")
    json.dump(rec, open(p, "w"), indent=1)
    print("appended big_tree_rows to LOD_r05.json", flush=True)


if __name__ == "__main__":
    main()
