"""Back-to-back full-step A/B of the tile-INTERLEAVED vs sequential blend
kernels in ONE process (cross-session variance invalidates separate-run
comparisons). Times jit(grad(loss)) at bench config for the four
(fwd, bwd) interleave combinations, two rounds."""
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

    import functools
    import jax.numpy as jnp
    import numpy as np

    from bench_scene import make_bench_scene
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=352 * 1024, tight_binning=True)
    gt = jnp.zeros((3, height, width), jnp.float32)
    valid = jnp.ones((n,), bool)
    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    orig_fwd = rp.blend_forward
    orig_bwd = rp.blend_backward

    def make_step(fl, bl):
        # the inner rasterize_tiles/_blend jits CACHE their traces — without
        # clearing, every combo would inline the FIRST combo's kernels and
        # the A/B would compare identical programs
        jax.clear_caches()
        # pin the linear flags through functools.partial so each combo is
        # its own jit cache entry
        rp.blend_forward = functools.partial(orig_fwd.__wrapped__, interleave=fl)
        rp.blend_forward = jax.jit(
            rp.blend_forward,
            static_argnames=("num_tiles", "gw", "tile_h", "tile_w", "width",
                             "height", "t_eps", "alpha_min", "use_lod",
                             "want_seen", "tpb", "scan_impl", "linear", "interleave",
                             "interpret"))
        rp.blend_backward = functools.partial(orig_bwd.__wrapped__, interleave=bl)
        rp.blend_backward = jax.jit(
            rp.blend_backward,
            static_argnames=("num_tiles", "gw", "tile_h", "tile_w", "width",
                             "height", "alpha_min", "use_lod", "tpb",
                             "scan_impl", "linear", "interleave",
                             "interpret"))

        def render(xyz, log_scale, quat, op_logit, f_dc, f_rest):
            q = quat / jnp.linalg.norm(quat, axis=-1,
                                       keepdims=True).clip(1e-12)
            shs = jnp.concatenate([f_dc, f_rest], axis=1)
            return render_mod.render_arrays(
                xyz, jnp.exp(log_scale), q,
                jax.nn.sigmoid(op_logit[..., 0]), shs, valid,
                cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
                cam.tan_fovy, jnp.zeros(3), sh_degree=3, width=width,
                height=height, cfg=cfg, k_max=384)

        def loss_fn(*a):
            return jnp.abs(render(*a).image - gt).mean()

        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

    combos = [(True, True), (False, False), (True, False), (False, True)]
    # each combo is traced, warmed and TIMED inside its own cache epoch —
    # keeping jitted step objects across a clear_caches would re-trace them
    # against whatever kernels are monkeypatched at the time of the call
    for rnd in range(2):
        for fl, bl in combos:
            step = make_step(fl, bl)
            out = step(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = step(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10 * 1e3
            print(f"round {rnd} fwd_il={int(fl)} bwd_il={int(bl)}: "
                  f"{dt:7.2f} ms/step ({width * height / dt / 1e3:.1f} "
                  f"Mpix/s)", flush=True)

    rp.blend_forward = orig_fwd
    rp.blend_backward = orig_bwd


if __name__ == "__main__":
    main()
