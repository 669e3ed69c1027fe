"""Benchmark: forward+backward rasterization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpix/s of the fused train-style step (render forward + full backward
through blend, projection, SH and covariance math) at 1080p on a synthetic
100k-Gaussian scene with trained-scene screen statistics
(scripts/bench_scene.py). The reference publishes no rasterizer throughput
numbers (BASELINE.json.published = {}), so vs_baseline is vs. the
north-star proxy of real-time training: 60 full fwd+bwd steps/s at 1080p
(= 124.4 Mpix/s), i.e. vs_baseline 1.0 means comfortably real-time.

NOTE vs round 1: the r01 scene initialized scales from kNN spacing of a
random cloud, demanding ~25M dup entries at 1080p while max_dup silently
truncated all but 2M (~90% of the workload was dropped). This scene renders
every entry; the bench asserts no truncation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))

_T0 = time.perf_counter()
# Driver-budget guard (round-3 lesson: BENCH_r03 was rc=124/parsed=null —
# one cold Mosaic compile through the remote compile service blew the
# driver's timeout and the round's official perf artifact was null).
# The JSON line must come out even on a degraded run: the timed loop
# stops early near the deadline, and iters adapt to whatever time is left.
_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", "540"))


def _left():
    return _BUDGET_S - (time.perf_counter() - _T0)


def _note(msg):
    print(f"[bench {time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: the Mosaic kernels take minutes to compile
    # through the remote TPU compile service; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_scene import make_bench_scene
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    sh_degree = 3
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=352 * 1024, tight_binning=True)

    gt = jnp.zeros((3, height, width), jnp.float32)
    valid = jnp.ones((n,), bool)

    def render(xyz, log_scale, quat, op_logit, f_dc, f_rest):
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        return render_mod.render_arrays(
            xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
            shs, valid, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=384)

    def loss_fn(*args):
        out = render(*args)
        return jnp.abs(out.image - gt).mean()

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    # honesty check: every dup entry must fit (no silent truncation)
    _note("compiling truncation check")
    chk = jax.jit(lambda *a: render(*a).truncated)(*args)
    assert not bool(chk), "bench scene overflows max_dup — fix the config"

    # compile + warmup
    _note("compiling fwd+bwd step (cold = minutes via remote service; "
          "warm = seconds from .jax_cache)")
    out = step(*args)
    jax.block_until_ready(out)
    _note("compiled; timing")

    # timed loop with a deadline: blocks of 5 steps until 20 iters are in
    # or the budget is nearly spent (>=5 iters is enough at ~40 ms/step;
    # steady-state variance on the tunnel is <2%)
    iters = 0
    t0 = time.perf_counter()
    while iters < 20 and (iters < 5 or _left() > 15.0):
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out)
        iters += 5
    dt = (time.perf_counter() - t0) / iters
    _note(f"{iters} iters, {dt * 1e3:.2f} ms/step")

    mpix_s = width * height / dt / 1e6
    baseline_mpix_s = 124.4  # 60 fwd+bwd steps/s at 1080p

    # ---- flagship LOD path, driver-verifiable (VERDICT r04 #6) ----------
    # streaming hierarchical-LOD render at 1080p on a 1M-node tree, tau 0
    # (full detail) and tau 15 (coarse), folded into the SAME single JSON
    # line. Skipped (nulls) only if the budget is nearly spent.
    lod = {"lod_stream_tau0_mpix_s": None, "lod_stream_tau15_mpix_s": None}
    if _left() > 150.0:
        try:
            lod = _lod_stream_metrics(_note, _left)
        except Exception as e:                      # keep the line printing
            _note(f"LOD bench failed: {type(e).__name__}: {e}")

    out = {
        "metric": "rasterizer_fwd_bwd_1080p",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline_mpix_s, 3),
    }
    out.update(lod)
    print(json.dumps(out))


def _lod_stream_metrics(_note, _left):
    """tau0/tau15 streaming LOD rates on the deterministic 1M-node bench
    tree (scripts/lod_bench.py's scene). The built tree is cached under
    .bench_cache/ so driver re-runs skip the ~10-150 s build."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    n_leaves = 1 << 19
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache", "lodtree.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        tree = {k: d[k] for k in d.files}
    else:
        _note("building 1M-node LOD tree (cached for next run)")
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(n_leaves, 3)).astype(np.float32) * 10.0
        pts[:, 2] += 30.0
        scales = np.exp(rng.normal(size=(n_leaves, 3)) * 0.3
                        - 3.2).astype(np.float32)
        quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        ops = rng.uniform(0.3, 0.9, n_leaves).astype(np.float32)
        shs = rng.normal(size=(n_leaves, 1, 3)).astype(np.float32) * 0.3
        h = hb.build_hierarchy(pts, scales, quats, ops, shs)
        tree = dict(pos=h.pos, scale=h.scale, quat=h.quat,
                    opacity=h.opacity, sh=h.sh, nodes=h.nodes)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, **tree)

    m = tree["nodes"].shape[0]
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 20, tight_binning=True)
    pos = jnp.asarray(tree["pos"])
    scale = jnp.asarray(tree["scale"])
    quat = jnp.asarray(tree["quat"])
    op = jnp.asarray(np.clip(tree["opacity"], 0, 1))
    sh = jnp.asarray(tree["sh"])
    nodes = jnp.asarray(tree["nodes"])
    alive = jnp.ones((m,), bool)
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))
    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))
    bg = jax.block_until_ready(jnp.zeros(3))

    def make_cam(i):
        a = 0.02 * i
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        return make_camera(R, np.zeros(3), fovx=1.2, fovy=0.8,
                           width=width, height=height)

    cams = [make_cam(i) for i in range(26)]
    jax.block_until_ready([c.world_view for c in cams])

    out = {}
    for tau, key in ((0.0, "lod_stream_tau0_mpix_s"),
                     (15.0, "lod_stream_tau15_mpix_s")):
        tgt = jax.block_until_ready(jnp.float32(max(
            float(render_mod.tau_to_threshold(tau, float(cams[0].tan_fovx),
                                              width)), 1e-9)))
        st = {}

        def frame(i):
            ci = cams[i]
            o, _ = render_mod.render_lod_stream(
                pos, scale, quat, op, sh, nodes, alive,
                ci.world_view, ci.full_proj, ci.campos, ci.tan_fovx,
                ci.tan_fovy, bg, tgt, st, pcache=pcache,
                interp_table=itab, sh_degree=0, width=width, height=height,
                cfg=cfg, k_max=512, use_frustum=False)
            return o.image

        _note(f"LOD stream tau{tau:g}: warm + 3x20 frames")
        for i in range(6):
            img = frame(i)
        jax.block_until_ready(img)
        # median of 3 windows: the small tau15 workload is sensitive to
        # one-off tunnel stalls (single windows measured 31-72 Mpix/s on
        # the same build); the median is the stable quantity
        n_frames, fidx = 20, 6
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_frames):
                img = frame((fidx + i) % len(cams))
            jax.block_until_ready(img)
            fidx += n_frames
            rates.append(width * height
                         / ((time.perf_counter() - t0) / n_frames) / 1e6)
            if _left() < 45.0:
                break
        rates.sort()
        out[key] = round(rates[len(rates) // 2], 2)
        _note(f"tau{tau:g}: {out[key]} Mpix/s (windows "
              f"{[round(r, 1) for r in rates]})")
        if _left() < 60.0:
            break
    return out


if __name__ == "__main__":
    main()
