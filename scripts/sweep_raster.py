"""TPU sweep: fwd+bwd step time across tile sizes / binning modes.

Prints dup-entry demand and step timings; used to pick RasterizerConfig
defaults for the bench. Run on the TPU backend (compiles are cached)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops.binning import bin_gaussians, compute_rects, compute_rects_tight
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

    act = gm.activate(state)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)

    @jax.jit
    def get_proj(act):
        cov6 = gaussian_math.compute_cov3d(act.scales, act.quats)
        return gaussian_math.project_gaussians(
            act.means3d, cov6, act.opacities, cam.world_view, cam.full_proj,
            width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            valid_in=act.valid)

    proj = get_proj(act)
    jax.block_until_ready(proj)

    # dup-entry demand per config
    for tw, th in ((16, 8), (16, 16), (32, 16)):
        _, _, rw, rh = compute_rects(proj.xy, proj.radius, width, height, tw, th)
        circ = int(jnp.sum(jnp.where(proj.valid, rw * rh, 0)))
        tx0, ty0, trw, trh = compute_rects_tight(proj.xy, proj.ext, width, height, tw, th)
        rx0, ry0, rrw, rrh = compute_rects(proj.xy, proj.radius, width, height, tw, th)
        mx = jnp.maximum(tx0, rx0)
        my = jnp.maximum(ty0, ry0)
        w2 = jnp.maximum(jnp.minimum(tx0 + trw, rx0 + rrw) - mx, 0)
        h2 = jnp.maximum(jnp.minimum(ty0 + trh, ry0 + rrh) - my, 0)
        tight = int(jnp.sum(jnp.where(proj.valid, w2 * h2, 0)))
        print(f"tile {tw}x{th}: circle demand {circ}  tight rect demand {tight}",
              flush=True)

    gt = jnp.zeros((3, height, width), jnp.float32)

    def build_step(cfg):
        def loss_fn(xyz, log_scale, quat, op_logit, f_dc, f_rest):
            q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
            shs = jnp.concatenate([f_dc, f_rest], axis=1)
            out = render_mod.render_arrays(
                xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
                shs, state.alive, cam.world_view, cam.full_proj, cam.campos,
                cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
                sh_degree=sh_degree, width=width, height=height, cfg=cfg,
                k_max=384)
            return jnp.abs(out.image - gt).mean()
        return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

    args = (state.xyz, state.log_scale, state.quat, state.opacity_logit,
            state.f_dc, state.f_rest)

    def timeit(fn, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    configs = [
        ("16x8 tight", RasterizerConfig(backend="pallas", tile_w=16, tile_h=8,
                                        max_dup=1 << 22, tight_binning=True)),
        ("16x16 tight", RasterizerConfig(backend="pallas", tile_w=16, tile_h=16,
                                         max_dup=1 << 22, tight_binning=True)),
        ("32x16 tight", RasterizerConfig(backend="pallas", tile_w=32, tile_h=16,
                                         max_dup=1 << 21, tight_binning=True)),
        ("16x16 circle", RasterizerConfig(backend="pallas", tile_w=16, tile_h=16,
                                          max_dup=1 << 22, tight_binning=False)),
    ]
    for name, cfg in configs:
        t0 = time.perf_counter()
        step = build_step(cfg)
        try:
            ms = timeit(step)
            compile_s = time.perf_counter() - t0
            mpix = width * height / ms / 1e3
            print(f"{name}: {ms:8.2f} ms/step = {mpix:6.2f} Mpix/s "
                  f"(compile+first {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
