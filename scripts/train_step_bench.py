"""Full training-step throughput at 1080p/100k: render + 0.8*L1 +
0.2*(1-SSIM) loss + backward + sparse Adam (the train_single.py step),
vs bench.py's pure fwd+bwd. Prints one JSON line per config."""
import json
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
    from hlod_gaussians_tpu.config import (OptimizationConfig,
                                           RasterizerConfig)
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.train import flat
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cap = 1 << int(np.ceil(np.log2(n + 1)))
    state = gm.create_from_points(
        np.asarray(p["xyz"]),
        np.full((n, 3), 0.5, np.float32), capacity=cap, sh_degree=3)
    # overwrite with the bench scene's trained-like parameters
    import dataclasses
    state = dataclasses.replace(
        state,
        xyz=jnp.zeros((cap, 3)).at[:n].set(p["xyz"]),
        log_scale=jnp.zeros((cap, 3)).at[:n].set(p["log_scale"]),
        quat=jnp.zeros((cap, 4)).at[:n].set(p["quat"]).at[n:, 0].set(1.0),
        opacity_logit=jnp.zeros((cap, 1)).at[:n].set(p["opacity_logit"]),
        f_dc=jnp.zeros((cap, 1, 3)).at[:n].set(p["f_dc"]),
        f_rest=jnp.zeros((cap, 15, 3)).at[:n].set(p["f_rest"]))

    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=352 * 1024, tight_binning=True)
    gt = jnp.zeros((3, height, width), jnp.float32)

    ts = flat.init_flat_train(state)
    opt = OptimizationConfig()
    step = lambda ts: flat.train_step(
        ts, cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, gt, jnp.zeros(3), None, None, None, jnp.int32(0),
        5.0, opt=opt, cfg=cfg, width=width, height=height, k_max=384,
        sh_degree=3, use_exposure=True)

    ts2, aux = step(ts)
    jax.block_until_ready(ts2.step)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        ts2, aux = step(ts2)
    jax.block_until_ready(ts2.step)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "train_step_1080p_100k",
        "value": round(width * height / dt / 1e6, 2),
        "unit": "Mpix/s",
        "ms_per_step": round(dt * 1e3, 1),
        "note": "render + L1/SSIM loss + bwd + sparse Adam + exposure"}),
        flush=True)


if __name__ == "__main__":
    main()
