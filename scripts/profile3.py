"""Stage profile at the PRODUCTION bench config (32x32 tiles, tight binning,
max_dup as in bench.py), separating binning / align / gather / kernels /
grad-reduce / full-step. Also times the end-to-end bench step."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_scene import make_bench_scene
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                                tile_grid)
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    sh_degree = 3
    TW = TH = 32
    MD = 448 * 1024
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = tile_grid(width, height, TW, TH)
    num_tiles = gw * gh
    cfg = RasterizerConfig(backend="pallas", tile_w=TW, tile_h=TH,
                           max_dup=MD, tight_binning=True)
    params = {k: jnp.asarray(v) for k, v in p.items()}

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    @jax.jit
    def preprocess(pr):
        scales = jnp.exp(pr["log_scale"])
        q = pr["quat"] / jnp.linalg.norm(pr["quat"], axis=-1,
                                         keepdims=True).clip(1e-12)
        op = jax.nn.sigmoid(pr["opacity_logit"][..., 0])
        cov6 = gaussian_math.compute_cov3d(scales, q)
        proj = gaussian_math.project_gaussians(
            pr["xyz"], cov6, op, cam.world_view, cam.full_proj,
            width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy)
        shs = jnp.concatenate([pr["f_dc"], pr["f_rest"]], axis=1)
        color = sh_ops.sh_color(sh_degree, shs, pr["xyz"], cam.campos)
        return proj, color

    ms, (proj, color) = timeit(preprocess, params)
    print(f"preprocess+SH fwd: {ms:7.2f} ms", flush=True)

    @jax.jit
    def binning(proj):
        return bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)

    ms, bins = timeit(binning, proj)
    print(f"bin_gaussians: {ms:7.2f} ms  num_dup={int(bins.num_dup)}",
          flush=True)

    @jax.jit
    def align(bins):
        return align_bins(bins, num_tiles, rp.CHUNK)

    ms, ab = timeit(align, bins)
    cap = ab.entry_gid.shape[0]
    print(f"align_bins: {ms:7.2f} ms  cap={cap}", flush=True)

    @jax.jit
    def bin_align(proj):
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)
        return align_bins(bins, num_tiles, rp.CHUNK)

    ms, _ = timeit(bin_align, proj)
    print(f"bin+align fused: {ms:7.2f} ms", flush=True)

    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned

    @jax.jit
    def bin_aligned_sort(proj):
        return bin_gaussians_aligned(
            proj.xy, proj.depth, proj.radius, proj.valid, width, height,
            TW, TH, MD, rp.CHUNK, ext=proj.ext, reff2=proj.reff2)

    ms, ab2 = timeit(bin_aligned_sort, proj)
    print(f"bin_gaussians_aligned (sort-fused): {ms:7.2f} ms", flush=True)

    # entry gather (as rasterize.py builds entry_data)
    @jax.jit
    def egather(proj, color, ab):
        n = proj.xy.shape[0]
        feats = jnp.stack([
            proj.xy[:, 0], proj.xy[:, 1],
            -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
            -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
            color[:, 2], 1.0 / jnp.maximum(proj.depth, 1e-6),
            jnp.ones((n,)), jnp.ones((n,)),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,)),
        ], axis=0)
        return rast._expand(feats, ab)

    ms, entry_data = timeit(egather, proj, color, ab)
    print(f"entry gather: {ms:7.2f} ms", flush=True)

    # blend kernels in isolation
    cfgt = (num_tiles, gw, TH, TW, width, height, 1e-4, 1.0 / 255.0,
            False, False, False)
    fwd = jax.jit(lambda e, s, c: rp.blend_forward(
        e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
        width=width, height=height))
    ms, fout = timeit(fwd, entry_data, ab.tile_starts, ab.tile_counts)
    img4_t, final_t_t, nc_t, _ = fout
    print(f"fwd kernel: {ms:7.2f} ms", flush=True)

    g4 = jnp.ones_like(img4_t)
    gft = jnp.zeros_like(final_t_t)
    bwd = jax.jit(lambda e, s, c, ft, nc, g, gf: rp.blend_backward(
        e, s, c, ft, nc, g, gf, num_tiles=num_tiles, gw=gw, tile_h=TH,
        tile_w=TW, width=width, height=height))
    ms, egr = timeit(bwd, entry_data, ab.tile_starts, ab.tile_counts,
                     final_t_t, nc_t, g4, gft)
    print(f"bwd kernel: {ms:7.2f} ms", flush=True)

    # gradient reduction in isolation (the _expand VJP)
    @jax.jit
    def greduce(egr, ab):
        _, vjp = jax.vjp(lambda f: rast._expand(f, ab),
                         jnp.zeros((16, proj.xy.shape[0]), jnp.float32))
        return vjp(egr)[0]

    ms, _ = timeit(greduce, egr, ab)
    print(f"grad reduce: {ms:7.2f} ms", flush=True)

    # ---- round-4 compact (unaligned) layout A/B ------------------------
    from hlod_gaussians_tpu.ops.binning import bin_gaussians_compact

    @jax.jit
    def bin_compact(proj):
        return bin_gaussians_compact(
            proj.xy, proj.depth, proj.radius, proj.valid, width, height,
            TW, TH, MD, ext=proj.ext, reff2=proj.reff2)

    ms, cb = timeit(bin_compact, proj)
    print(f"bin_gaussians_compact: {ms:7.2f} ms  cap={cb.entry_gid.shape[0]}",
          flush=True)

    ms, centry = timeit(egather, proj, color, cb)
    print(f"entry gather (compact): {ms:7.2f} ms", flush=True)

    # compact (packed) starts are UNALIGNED: the interleaved kernels are
    # aligned-only (boundary-RMW hazard + false pl.multiple_of hint), so the
    # compact rows must run the SEQUENTIAL kernels (ADVICE r04 — the r04
    # numbers cited in rasterize.py/render.py were measured through the
    # interleaved jits and were corrupt)
    fwd_seq = jax.jit(lambda e, s, c: rp.blend_forward(
        e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
        width=width, height=height, interleave=False))
    bwd_seq = jax.jit(lambda e, s, c, ft, nc, g, gf: rp.blend_backward(
        e, s, c, ft, nc, g, gf, num_tiles=num_tiles, gw=gw, tile_h=TH,
        tile_w=TW, width=width, height=height, interleave=False))

    ms, cfout = timeit(fwd_seq, centry, cb.tile_starts, cb.tile_counts)
    cimg4_t, cft_t, cnc_t, _ = cfout
    print(f"fwd kernel (compact, seq): {ms:7.2f} ms", flush=True)

    ms, cegr = timeit(bwd_seq, centry, cb.tile_starts, cb.tile_counts,
                      cft_t, cnc_t, g4, gft)
    print(f"bwd kernel (compact, seq): {ms:7.2f} ms", flush=True)

    ms, _ = timeit(greduce, cegr, cb)
    print(f"grad reduce (compact): {ms:7.2f} ms", flush=True)

    # full step through the public API (same as bench.py)
    gt = jnp.zeros((3, height, width), jnp.float32)
    n = p["xyz"].shape[0]
    valid_all = jnp.ones((n,), bool)

    def render(xyz, log_scale, quat, op_logit, f_dc, f_rest):
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        return render_mod.render_arrays(
            xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
            shs, valid_all, cam.world_view, cam.full_proj, cam.campos,
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
    ms, _ = timeit(step, *args, iters=10)
    mpix = width * height / (ms / 1e3) / 1e6
    print(f"full fwd+bwd: {ms:7.2f} ms  ({mpix:.1f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
