"""LOD fidelity probe: does MORE detail give a BETTER image? (round-4 #2)

Isolates the LOD machinery (hierarchy build -> cut -> interpolation ->
in-kernel LOD alpha) from training quality: the hierarchy is built over an
EXACT ground-truth model whose colors carry structured multi-band spatial
detail, and each tau cut is rendered against the leaf-level render. A
monotone PSNR-vs-tau curve here proves the machinery preserves detail;
PIPELINE_r03's flat curve measured iid-random colors (spatial noise whose
coarse average matches the mean as well as the leaves do) plus chunk-floor
training error, not the LOD system.

Protocol matches the reference tau sweep (render_hierarchy.py:56-120):
projected-granularity threshold per view, same renderer, PSNR/SSIM per tau.
Writes LODFIDELITY_r04.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def structured_colors(pts):
    """Multi-band spatial color field: coarse hue drift + mid + fine bands.

    Periods (world units): 1.4 / 0.4 / 0.11 / 0.04 — at the probe's pixel
    footprint (~0.0053 world/px) the fine bands span ~8-20 px, so merging
    nodes past a few pixels of granularity MUST blur them.
    """
    import numpy as np
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    two_pi = 2.0 * np.pi
    r = np.stack([
        0.30 * np.sin(two_pi * x / 1.4) + 0.18 * np.sin(two_pi * (y + z) / 0.4)
        + 0.12 * np.sin(two_pi * x / 0.11) + 0.10 * np.sin(two_pi * y / 0.04),
        0.30 * np.cos(two_pi * y / 1.4) + 0.18 * np.sin(two_pi * (x - z) / 0.4)
        + 0.12 * np.sin(two_pi * z / 0.11) + 0.10 * np.sin(two_pi * x / 0.04),
        0.30 * np.sin(two_pi * z / 1.4) + 0.18 * np.cos(two_pi * (x + y) / 0.4)
        + 0.12 * np.sin(two_pi * y / 0.11) + 0.10 * np.sin(two_pi * z / 0.04),
    ], axis=-1)
    return np.clip(0.5 + 0.45 * r / 0.7, 0.02, 0.98).astype(np.float32)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np
    import jax.numpy as jnp

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.ops import ssim as ssim_ops
    from hlod_gaussians_tpu.utils.camera import make_camera

    W = H = 1024
    n_leaves = 200_000
    rng = np.random.default_rng(11)

    # stratified-ish leaf cloud in a [-2,2]^2 x [4,6] slab
    pts = np.stack([
        rng.uniform(-2.0, 2.0, n_leaves),
        rng.uniform(-2.0, 2.0, n_leaves),
        rng.uniform(4.0, 6.0, n_leaves),
    ], axis=-1).astype(np.float32)
    spacing = (4.0 * 4.0 * 2.0 / n_leaves) ** (1.0 / 3.0)   # ~0.054
    scales = np.exp(rng.normal(0.0, 0.25, (n_leaves, 3))
                    ).astype(np.float32) * (0.55 * spacing)
    quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.55, 0.95, n_leaves).astype(np.float32)
    C0 = 0.28209479177387814
    shs = ((structured_colors(pts) - 0.5) / C0)[:, None, :]

    t0 = time.perf_counter()
    h = hb.build_hierarchy(pts, scales, quats, ops, shs.astype(np.float32))
    jax.block_until_ready(h.pos)
    m = h.nodes.shape[0]
    print(f"hierarchy: {m} nodes in {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 21, tight_binning=True)

    def cam_at(k):
        ang = 2.0 * np.pi * k / 7 + 0.3
        pos = np.array([1.3 * np.cos(ang), 1.3 * np.sin(ang), 0.4], np.float64)
        look = np.array([0.0, 0.0, 5.0])
        fwd = look - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], axis=0)
        return make_camera(Rwc.T, -Rwc @ pos, 1.0, 1.0, W, H)

    cams = [cam_at(k) for k in range(4)]
    bg = jnp.zeros(3)

    # ground truth = the leaf-level model rendered directly
    gts = []
    for cam in cams:
        out = render_mod.render_arrays(
            jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(ops), jnp.asarray(shs), jnp.ones((n_leaves,), bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, bg, sh_degree=0, width=W, height=H, cfg=cfg,
            k_max=512)
        assert not bool(out.truncated), "GT render truncated"
        gts.append(jnp.clip(out.image, 0.0, 1.0))
    print("GT views rendered", flush=True)

    pos, scale, quat, op, sh, nodes = (
        jnp.asarray(h.pos), jnp.asarray(h.scale), jnp.asarray(h.quat),
        jnp.asarray(np.clip(h.opacity, 0.0, 1.0)), jnp.asarray(h.sh),
        jnp.asarray(h.nodes))
    alive = jnp.ones((m,), bool)
    pcache = cut_mod.build_parent_cache(nodes, pos, jnp.max(scale.T, axis=0))
    itab = cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes)

    taus = [0.0, 1.0, 3.0, 6.0, 15.0]
    sweep = []
    for tau in taus:
        psnrs, ssims, nsel = [], [], []
        for cam, gt in zip(cams, gts):
            target = float(render_mod.tau_to_threshold(
                tau, float(cam.tan_fovx), W))
            res, n_sel = render_mod.render_lod(
                pos, scale, quat, op, sh, nodes, alive,
                cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
                cam.tan_fovy, bg, max(target, 1e-12), None, None, pcache,
                None, itab, sh_degree=0, width=W, height=H,
                budget=1 << 18, cfg=cfg, k_max=512)
            assert not bool(res.truncated), f"tau {tau} truncated"
            img = jnp.clip(res.image, 0.0, 1.0)
            psnrs.append(float(ssim_ops.psnr(img, gt)))
            ssims.append(float(ssim_ops.ssim(img, gt)))
            nsel.append(float(n_sel))
        rec = dict(tau=tau, psnr=round(float(np.mean(psnrs)), 3),
                   ssim=round(float(np.mean(ssims)), 4),
                   mean_rendered=round(float(np.mean(nsel)), 1),
                   per_view_psnr=[round(p, 2) for p in psnrs])
        sweep.append(rec)
        print(f"tau {tau:4g}: PSNR {rec['psnr']:6.2f}  SSIM {rec['ssim']:.4f}"
              f"  rendered {rec['mean_rendered']:9.0f}", flush=True)

    # the LOD promise: strictly more detail -> strictly better image.
    # Adjacent taus whose cuts are IDENTICAL (no node projects between the
    # two thresholds — e.g. tau0 vs tau1 when every leaf spans > 1 px)
    # produce the same image, so strict decrease is required exactly when
    # the cut actually coarsens.
    psnr_seq = [r["psnr"] for r in sweep]
    rend_seq = [r["mean_rendered"] for r in sweep]
    monotone = all(
        (pa > pb) if (ra > rb) else (abs(pa - pb) < 0.05)
        for (pa, ra), (pb, rb) in zip(zip(psnr_seq, rend_seq),
                                      zip(psnr_seq[1:], rend_seq[1:])))
    spread = psnr_seq[0] - psnr_seq[-1]
    print(f"monotone={monotone} tau0-tau15 spread={spread:.2f} dB",
          flush=True)

    rec = dict(
        provenance=f"single v5e via remote tunnel; {n_leaves} structured-"
                   f"color GT leaves, {m} hierarchy nodes, {W}x{H}, 4 views; "
                   "cuts rendered against the leaf-level render (isolates "
                   "the LOD machinery from training error)",
        taus=taus, sweep=sweep, monotone=monotone,
        tau0_vs_tau15_db=round(spread, 2))
    with open(os.path.join(ROOT, "LODFIDELITY_r04.json"), "w") as f:
        json.dump(rec, f, indent=1)
    assert monotone, psnr_seq
    assert spread >= 1.0, spread
    print("LOD FIDELITY PROBE OK", flush=True)


if __name__ == "__main__":
    main()
