"""Sweep tiles-per-program (tpb) for the blend kernels at the production
bench config. Quantifies the per-grid-step fixed cost amortization."""

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
    params = {k: jnp.asarray(v) for k, v in p.items()}

    def timeit(fn, *a, iters=30):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    @jax.jit
    def prep(pr):
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
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)
        ab = align_bins(bins, num_tiles, 128)
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
        entry_data = rast._expand(feats, ab)
        return entry_data, ab

    entry_data, ab = jax.block_until_ready(prep(params))
    print(f"cap={entry_data.shape[1]} tiles={num_tiles}", flush=True)

    for tpb in (1, 2, 4, 8):
        fwd = jax.jit(lambda e, s, c, tpb=tpb: rp.blend_forward(
            e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
            width=width, height=height, tpb=tpb))
        ms, fout = timeit(fwd, entry_data, ab.tile_starts, ab.tile_counts)
        img4_t, final_t_t, nc_t, _ = fout
        print(f"tpb={tpb}  fwd: {ms:7.2f} ms", flush=True)

        g4 = jnp.ones_like(img4_t)
        gft = jnp.zeros_like(final_t_t)
        bwd = jax.jit(lambda e, s, c, ft, nc, g, gf, tpb=tpb:
                      rp.blend_backward(
                          e, s, c, ft, nc, g, gf, num_tiles=num_tiles, gw=gw,
                          tile_h=TH, tile_w=TW, width=width, height=height,
                          tpb=tpb))
        ms, _ = timeit(bwd, entry_data, ab.tile_starts, ab.tile_counts,
                       final_t_t, nc_t, g4, gft)
        print(f"tpb={tpb}  bwd: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
