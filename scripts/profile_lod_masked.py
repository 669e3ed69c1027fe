"""Stage profile of the MASKED (budget-free) LOD render at tau=0 on the
1M-node tree — the viewer's full-detail worst case. Splits cut /
masked interpolation / projection / binning / forward kernel / full frame.
Builds /tmp/lodtree.npz if missing (same tree as lod_bench)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/lodtree.npz"


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
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.utils.camera import make_camera

    if not os.path.exists(CACHE):
        n_leaves = 1 << 19
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
        np.savez(CACHE, pos=h.pos, scale=h.scale, quat=h.quat,
                 opacity=h.opacity, sh=h.sh, nodes=h.nodes)
    d = np.load(CACHE)
    pos, scale, quat, op, sh, nodes = (
        jnp.asarray(d["pos"]), jnp.asarray(d["scale"]),
        jnp.asarray(d["quat"]), jnp.asarray(np.clip(d["opacity"], 0, 1)),
        jnp.asarray(d["sh"]), jnp.asarray(d["nodes"]))
    m = nodes.shape[0]
    alive = jnp.ones((m,), bool)
    width, height = 1920, 1080
    tau = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    md = 1 << 20
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=md, tight_binning=True)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    target = max(float(render_mod.tau_to_threshold(
        tau, float(cam.tan_fovx), width)), 1e-12)
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))
    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))

    def timeit(name, fn, *a, iters=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:7.2f} ms", flush=True)
        return out

    zdir = cam.world_view[:3, 2]

    @jax.jit
    def do_cut():
        return cut_mod.expand_to_size_dynamic(
            nodes, pos, jnp.max(scale.T, axis=0), alive, cam.campos,
            zdir, target, pcache, use_frustum=True)

    cut = timeit("cut", do_cut)
    print(f"  n_sel={int(jnp.sum(cut.render_mask))}", flush=True)

    @jax.jit
    def interp():
        return cut_mod.interpolate_all_masked(itab, cut.ts, cut.render_mask)

    iv = timeit("masked interpolation", interp)

    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)

    @jax.jit
    def proj():
        q = iv["quats"] / jnp.linalg.norm(iv["quats"], axis=-1,
                                          keepdims=True).clip(1e-12)
        cov6 = gaussian_math.compute_cov3d(iv["scales"], q)
        return gaussian_math.project_gaussians(
            iv["means3d"], cov6, iv["opacities"], cam.world_view,
            cam.full_proj, width, height, focal_x, focal_y, cam.tan_fovx,
            cam.tan_fovy, dilation=cfg.dilation, valid_in=cut.render_mask)

    pj = timeit("cov3d+projection (1M rows)", proj)

    @jax.jit
    def shc():
        return sh_ops.sh_color(0, iv["shs"], iv["means3d"], cam.campos)

    color = timeit("sh color", shc)

    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp

    @jax.jit
    def bins():
        return bin_gaussians_aligned(
            pj.xy, pj.depth, pj.radius, pj.valid, width, height,
            cfg.tile_w, cfg.tile_h, md, rp.CHUNK, ext=pj.ext,
            reff2=pj.reff2)

    ab = timeit("binning (fused)", bins)

    from hlod_gaussians_tpu.ops import rasterize as rast

    @jax.jit
    def egather():
        n = pj.xy.shape[0]
        invd = 1.0 / jnp.maximum(pj.depth, 1e-6)
        feats = jnp.stack([
            pj.xy[:, 0], pj.xy[:, 1], -0.5 * pj.conic[:, 0],
            -pj.conic[:, 1], -0.5 * pj.conic[:, 2], pj.opacity,
            color[:, 0], color[:, 1], color[:, 2], invd,
            jnp.where(cut.render_mask, cut.ts, 1.0),
            1.0 / jnp.maximum(cut.kids, 1).astype(jnp.float32),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,))], axis=0)
        return rast._expand(feats, ab)

    ed = timeit("entry gather", egather)

    @jax.jit
    def fwd():
        from hlod_gaussians_tpu.ops.binning import tile_grid
        gw, gh = tile_grid(width, height, cfg.tile_w, cfg.tile_h)
        return rp.blend_forward(
            ed, ab.tile_starts, ab.tile_counts, num_tiles=gw * gh, gw=gw,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, width=width,
            height=height, use_lod=True)

    timeit("fwd kernel (LOD)", fwd)

    # campos as a real argument so XLA cannot constant-fold the frame
    @jax.jit
    def full(campos):
        out, n_sel = render_mod.render_lod_masked(
            pos, scale, quat, op, sh, nodes, alive, cam.world_view,
            cam.full_proj, campos, cam.tan_fovx, cam.tan_fovy,
            jnp.zeros(3), target, None, pcache, None, itab,
            sh_degree=0, width=width, height=height, cfg=cfg, k_max=1024)
        return out.image

    timeit("FULL render_lod_masked frame", full, jnp.asarray(cam.campos))


if __name__ == "__main__":
    main()
