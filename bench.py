"""Benchmark: forward+backward rasterization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpix/s of the fused train-style step (render forward + full backward
through blend, projection, SH and covariance math) at 1080p-class resolution
on a synthetic 100k-Gaussian scene. The reference publishes no rasterizer
throughput numbers (BASELINE.json.published = {}), so vs_baseline is vs. the
north-star proxy of real-time training: 60 full fwd+bwd steps/s at 1080p
(= 124.4 Mpix/s), i.e. vs_baseline 1.0 means comfortably real-time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    n_pts = 100_000
    cap = 131_072
    sh_degree = 3

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 8.0
    cols = rng.random((n_pts, 3)).astype(np.float32)
    state = gm.create_from_points(pts, cols, capacity=cap,
                                  sh_degree=sh_degree, opacity_init=0.5)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=16, tile_h=8,
                           max_dup=1 << 21)
    k_max = 384

    act = gm.activate(state)
    gt = jnp.zeros((3, height, width), jnp.float32)

    def loss_fn(xyz, log_scale, quat, op_logit, f_dc, f_rest):
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        out = render_mod.render_arrays(
            xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]), shs,
            state.alive, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=k_max)
        return jnp.abs(out.image - gt).mean()

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    args = (state.xyz, state.log_scale, state.quat, state.opacity_logit,
            state.f_dc, state.f_rest)

    # compile + warmup
    out = step(*args)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = width * height / dt / 1e6
    baseline_mpix_s = 124.4  # 60 fwd+bwd steps/s at 1080p
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_1080p",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
