"""Sweep: 32x32 tiles + tightened max_dup + einsum SH, full-step times."""

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
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops.binning import bin_gaussians
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    sh_degree = 3
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)

    xyz = jnp.asarray(p["xyz"])
    scales = jnp.exp(jnp.asarray(p["log_scale"]))
    quat = jnp.asarray(p["quat"])
    op = jax.nn.sigmoid(jnp.asarray(p["opacity_logit"])[:, 0])
    valid = jnp.ones((n,), bool)

    @jax.jit
    def get_proj():
        cov6 = gaussian_math.compute_cov3d(scales, quat)
        return gaussian_math.project_gaussians(
            xyz, cov6, op, cam.world_view, cam.full_proj,
            width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            valid_in=valid)

    proj = get_proj()
    jax.block_until_ready(proj)
    for tw, th in ((32, 16), (32, 32)):
        b = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                          width, height, tw, th, 1 << 21,
                          ext=proj.ext, reff2=proj.reff2)
        print(f"tile {tw}x{th}: kept {int(b.num_dup)} "
              f"cand {int(b.num_candidates)}", flush=True)

    gt = jnp.zeros((3, height, width), jnp.float32)

    def build_step(cfg):
        def loss_fn(xyz, log_scale, quat, op_logit, f_dc, f_rest):
            q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
            shs = jnp.concatenate([f_dc, f_rest], axis=1)
            out = render_mod.render_arrays(
                xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
                shs, valid, cam.world_view, cam.full_proj, cam.campos,
                cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
                sh_degree=sh_degree, width=width, height=height, cfg=cfg,
                k_max=384)
            return jnp.abs(out.image - gt).mean()
        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    def timeit(fn, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    for name, tw, th, md in (("32x16 md1M sh-einsum", 32, 16, 1 << 20),
                             ("32x16 md640k", 32, 16, 640 * 1024),
                             ("32x32 md512k", 32, 32, 512 * 1024),
                             ("32x32 md448k", 32, 32, 448 * 1024)):
        cfg = RasterizerConfig(backend="pallas", tile_w=tw, tile_h=th,
                               max_dup=md, tight_binning=True)
        t0 = time.perf_counter()
        step = build_step(cfg)
        try:
            ms = timeit(step)
            print(f"{name}: {ms:8.2f} ms = {width*height/ms/1e3:6.2f} Mpix/s "
                  f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
