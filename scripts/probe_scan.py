"""A/B the triangular-matmul vs VPU shift-and-add scan blend kernels.

Hypothesis (docs/KERNEL_DESIGN.md round-3 findings): the MXU is the
CONTENDED unit in both blend kernels — the quadratic-basis experiment that
ADDED MXU work lost. This probe tests the reverse direction: move the
triangular cumulative sums OFF the MXU onto a log-depth Hillis-Steele
shift-and-add prefix/suffix scan on the VPU (7 shifted adds of
[CHUNK, pix]), freeing 3 of ~6 MXU passes in forward and 6 of 7 in
backward. Measures both kernels both ways at bench scale + max output diff.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def timeit(fn, iters=20):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


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
    from hlod_gaussians_tpu.ops import gaussian_math, rasterize as rast
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                                tile_grid)
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
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
    scales = jnp.exp(params["log_scale"])
    q = params["quat"] / jnp.linalg.norm(params["quat"], axis=-1,
                                         keepdims=True).clip(1e-12)
    op = jax.nn.sigmoid(params["opacity_logit"][..., 0])
    cov6 = gaussian_math.compute_cov3d(scales, q)
    proj = jax.jit(lambda: gaussian_math.project_gaussians(
        params["xyz"], cov6, op, cam.world_view, cam.full_proj,
        width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy))()
    bins = jax.jit(lambda: bin_gaussians(
        proj.xy, proj.depth, proj.radius, proj.valid, width, height,
        TW, TH, MD, ext=proj.ext, reff2=proj.reff2))()
    ab = jax.jit(lambda: align_bins(bins, num_tiles, rp.CHUNK))()
    cap = ab.entry_gid.shape[0]
    n = proj.xy.shape[0]
    rng = np.random.default_rng(1)
    color = jnp.asarray(rng.random((n, 3), np.float32))
    feats = jnp.stack(
        [proj.xy[:, 0], proj.xy[:, 1],
         -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
         -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
         color[:, 2], 1.0 / jnp.maximum(proj.depth, 1e-6)]
        + [jnp.zeros_like(proj.depth)] * 6, axis=0)
    entry_data = jax.jit(lambda: rast._expand(feats, ab))()
    jax.block_until_ready(entry_data)
    print(f"cap={cap}", flush=True)

    kw = dict(num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
              width=width, height=height)

    fwd = {}
    outs = {}
    for scan in (False, True):
        f = functools.partial(rp.blend_forward, entry_data, ab.tile_starts,
                              ab.tile_counts, scan_impl=scan, **kw)
        outs[scan] = f()
        fwd[scan] = timeit(f)
        print(f"fwd scan={scan}: {fwd[scan]:7.2f} ms", flush=True)

    img_d = float(jnp.max(jnp.abs(outs[True][0] - outs[False][0])))
    ft_d = float(jnp.max(jnp.abs(outs[True][1] - outs[False][1])))
    nc_d = int(jnp.max(jnp.abs(outs[True][2] - outs[False][2])))
    print(f"fwd max|d| img={img_d:.3e} ft={ft_d:.3e} nc={nc_d}", flush=True)

    img4, final_t, n_contrib, _ = outs[False]
    g_img4 = jnp.asarray(rng.normal(size=img4.shape).astype(np.float32))
    g_ft = jnp.asarray(rng.normal(size=final_t.shape).astype(np.float32))

    bwd = {}
    bouts = {}
    for scan in (False, True):
        f = functools.partial(rp.blend_backward, entry_data, ab.tile_starts,
                              ab.tile_counts, final_t, n_contrib, g_img4,
                              g_ft, scan_impl=scan, **kw)
        bouts[scan] = f()
        bwd[scan] = timeit(f)
        print(f"bwd scan={scan}: {bwd[scan]:7.2f} ms", flush=True)

    gd = jnp.max(jnp.abs(bouts[True] - bouts[False]), axis=1)
    print("bwd max|d| per col:",
          np.array2string(np.asarray(gd[:10]), precision=3), flush=True)


if __name__ == "__main__":
    main()
