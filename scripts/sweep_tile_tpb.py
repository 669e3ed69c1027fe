"""Sweep tile size x tiles-per-program on the FULL bench step (fwd+bwd).

Round-2 chose 32x32 at tpb=4; both kernels are VPU-bound on [CHUNK, pix]
elementwise math, so smaller tiles cut per-entry wide work 4x IF tpb rises
to keep the grid-program count constant (~500). Entries grow with smaller
tiles (a Gaussian overlaps more of them) — the sweep measures the net.
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
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    sh_degree = 3
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    gt = jnp.zeros((3, height, width), jnp.float32)
    valid = jnp.ones((n,), bool)
    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    def run(cfg, iters=20):
        def render(xyz, log_scale, quat, op_logit, f_dc, f_rest):
            q = quat / jnp.linalg.norm(quat, axis=-1,
                                       keepdims=True).clip(1e-12)
            shs = jnp.concatenate([f_dc, f_rest], axis=1)
            return render_mod.render_arrays(
                xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
                shs, valid, cam.world_view, cam.full_proj, cam.campos,
                cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
                sh_degree=sh_degree, width=width, height=height, cfg=cfg,
                k_max=384)

        def loss_fn(*a):
            out = render(*a)
            return jnp.abs(out.image - gt).mean()

        trunc, ndup = jax.jit(
            lambda *a: (render(*a).truncated, render(*a).n_dup))(*args)
        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
        out = step(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        return dt * 1e3, bool(trunc), int(ndup)

    configs = [
        ("32x32 tpb4  (current)", 32, 32, 4, 352),
        ("32x32 tpb8", 32, 32, 8, 352),
        ("32x32 tpb16", 32, 32, 16, 352),
    ]
    for name, tw, th, tpb, mdk in configs:
        cfg = RasterizerConfig(backend="pallas", tile_w=tw, tile_h=th,
                               max_dup=mdk * 1024, tight_binning=True,
                               tpb=tpb)
        try:
            ms, trunc, ndup = run(cfg)
            mpix = width * height / (ms / 1e3) / 1e6
            print(f"{name}: {ms:7.2f} ms  ({mpix:5.1f} Mpix/s)  "
                  f"ndup={ndup} trunc={trunc}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives one config
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
