"""Split the full training step's overhead over the raw fwd+bwd render:
L1-only vs L1+SSIM gradient steps, plus an SSIM-only fwd+bwd probe.
Uses the bench scene (same as train_step_bench.py)."""
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
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops.ssim import ssim
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    p = make_bench_scene()
    n = p["xyz"].shape[0]

    means = jnp.asarray(p["xyz"])
    scales = jnp.exp(jnp.asarray(p["log_scale"]))
    quats = jnp.asarray(p["quat"])
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    ops = jax.nn.sigmoid(jnp.asarray(p["opacity_logit"]))[:, 0]
    shs = jnp.concatenate(
        [jnp.asarray(p["f_dc"]), jnp.asarray(p["f_rest"])], axis=1)
    valid = jnp.ones((n,), bool)

    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=352 * 1024, tight_binning=True)
    gt = jnp.zeros((3, height, width), jnp.float32)
    bg = jnp.zeros(3)

    def render(ms, ss, qs, os_, sh):
        out = render_mod.render_arrays(
            ms, ss, qs, os_, sh, valid, cam.world_view, cam.full_proj,
            cam.campos, cam.tan_fovx, cam.tan_fovy, bg,
            sh_degree=3, width=width, height=height, cfg=cfg, k_max=384)
        return out.image

    def loss_l1(*a):
        img = render(*a)
        return jnp.mean(jnp.abs(img - gt))

    def loss_l1_ssim(*a):
        img = render(*a)
        return (0.8 * jnp.mean(jnp.abs(img - gt))
                + 0.2 * (1.0 - ssim(img, gt)))

    args = (means, scales, quats, ops, shs)

    for name, f in (("fwd+bwd render (sum-grad)",
                     lambda *a: jnp.sum(render(*a))),
                    ("L1 loss step", loss_l1),
                    ("L1+SSIM loss step", loss_l1_ssim)):
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))
        r = g(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(15):
            r = g(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 15
        print(f"{name}: {dt * 1e3:7.2f} ms", flush=True)

    # ssim fwd+bwd alone on images
    img0 = render(*args)
    jax.block_until_ready(img0)
    gs = jax.jit(jax.grad(lambda im: 1.0 - ssim(im, gt)))
    r = gs(img0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(30):
        r = gs(img0)
    jax.block_until_ready(r)
    print(f"SSIM-only fwd+bwd on [3,1080,1920]: "
          f"{(time.perf_counter() - t0) / 30 * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
