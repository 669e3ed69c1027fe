"""TPU A/B: triangular-mask matmul variants inside the blend kernels.

Variants (module-global switch re-jitted via clear_caches):
  highest — one 6-pass f32 MXU matmul (the r01 baseline)
  split3  — exact Dekker 3-way bf16 split, 3 single-pass matmuls
  split2  — 2-way split (lossy ~2^-17): measures the headroom only
Prints kernel times + max deviation vs the highest variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


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
    MD = 352 * 1024
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = tile_grid(width, height, TW, TH)
    num_tiles = gw * gh
    params = {k: jnp.asarray(v) for k, v in p.items()}

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

    proj, color = preprocess(params)

    @jax.jit
    def bin_align(proj):
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)
        return align_bins(bins, num_tiles, 128)

    ab = bin_align(proj)

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

    entry_data = jax.block_until_ready(egather(proj, color, ab))
    starts = jnp.asarray(ab.tile_starts)
    counts = jnp.asarray(ab.tile_counts)

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    def mm_highest(mask_bf, b):
        return jax.lax.dot_general(
            mask_bf.astype(jnp.float32), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def mm_split3(mask_bf, b):
        b0f = b.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = b - b0f
        b1 = r1.astype(jnp.bfloat16)
        b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x: jax.lax.dot_general(
            mask_bf, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return (dot(b0f.astype(jnp.bfloat16)) + dot(b1)) + dot(b2)

    def mm_split2(mask_bf, b):
        b0f = b.astype(jnp.bfloat16).astype(jnp.float32)
        b1 = (b - b0f).astype(jnp.bfloat16)
        dot = lambda x: jax.lax.dot_general(
            mask_bf, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return dot(b0f.astype(jnp.bfloat16)) + dot(b1)

    variants = [("highest", mm_highest), ("split3", mm_split3),
                ("split2", mm_split2)]
    ref = {}
    for name, fn in variants:
        rp._mm_mask = fn
        jax.clear_caches()
        fwd = jax.jit(lambda e, s, c: rp.blend_forward(
            e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
            width=width, height=height))
        t0 = time.perf_counter()
        ms_f, fout = timeit(fwd, entry_data, starts, counts)
        img4_t, final_t_t, nc_t, _ = fout
        g4 = jnp.ones_like(img4_t)
        gft = jnp.zeros_like(final_t_t)
        bwd = jax.jit(lambda e, s, c, ft, nc, g, gf: rp.blend_backward(
            e, s, c, ft, nc, g, gf, num_tiles=num_tiles, gw=gw, tile_h=TH,
            tile_w=TW, width=width, height=height))
        ms_b, egr = timeit(bwd, entry_data, starts, counts,
                           final_t_t, nc_t, g4, gft)
        compile_s = time.perf_counter() - t0
        if name == "highest":
            ref["img"] = np.asarray(img4_t)
            ref["egr"] = np.asarray(egr)
            dev_i = dev_g = rel_g = 0.0
        else:
            dev_i = float(np.max(np.abs(np.asarray(img4_t) - ref["img"])))
            eg = np.asarray(egr)
            dev_g = float(np.max(np.abs(eg - ref["egr"])))
            rel_g = float(np.max(np.abs(eg - ref["egr"])
                                 / (np.abs(ref["egr"]) + 1.0)))
        print(f"{name:8s}: fwd {ms_f:6.2f} ms  bwd {ms_b:6.2f} ms  "
              f"dev img {dev_i:.2e} grad {dev_g:.2e} rel {rel_g:.2e} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
