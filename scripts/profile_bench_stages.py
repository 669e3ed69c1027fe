"""Stage breakdown of the CURRENT bench config (32x32 tiles, tight
binning, 352k max_dup, bench_scene): forward-only vs fwd+bwd vs
binning-only, so round-3 perf work targets the right stage."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
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
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops.binning import bin_gaussians
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

    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    fwd = jax.jit(lambda *a: render(*a).image)
    print(f"forward total:    {timeit(fwd, *args):8.2f} ms", flush=True)

    def loss_fn(*a):
        return jnp.abs(render(*a).image - gt).mean()
    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    print(f"fwd+bwd total:    {timeit(step, *args):8.2f} ms", flush=True)

    # binning only (preprocess + bin + align), no blend kernel
    from hlod_gaussians_tpu.ops.binning import align_bins, tile_grid
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp

    @jax.jit
    def bins_only(xyz, log_scale, quat, op_logit, f_dc, f_rest):
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        scales = jnp.exp(log_scale)
        op = jax.nn.sigmoid(op_logit[..., 0])
        focal_x = width / (2.0 * cam.tan_fovx)
        focal_y = height / (2.0 * cam.tan_fovy)
        cov6 = gaussian_math.compute_cov3d(scales, q)
        proj = gaussian_math.project_gaussians(
            xyz, cov6, op, cam.world_view, cam.full_proj,
            width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            dilation=cfg.dilation, antialiasing=False, near=cfg.near,
            valid_in=valid, big_limit=cfg.big_limit,
            max_scale=jnp.max(scales, axis=-1))
        bins = bin_gaussians(
            proj.xy, proj.depth, proj.radius, proj.valid,
            width, height, cfg.tile_w, cfg.tile_h, cfg.max_dup,
            ext=proj.ext, reff2=proj.reff2)
        gw, gh = tile_grid(width, height, cfg.tile_w, cfg.tile_h)
        abins = align_bins(bins, gw * gh, rp.CHUNK)
        return (abins.entry_gid, abins.tile_starts, abins.tile_counts,
                abins.gen_to_slot, abins.gen_valid)
    print(f"preproc+bin+align:{timeit(bins_only, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
