"""Stage-bisection profiler for the bench rasterizer config (1080p, 100k).

Times each pipeline stage as its own fused jit with block_until_ready so the
242 ms/step of BENCH_r01 can be attributed: dispatch, preprocess+SH, binning,
align, entry gather, fwd kernel, bwd kernel, full fwd, full fwd+bwd.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


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
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                                tile_grid)
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
    gw, gh = tile_grid(width, height, cfg.tile_w, cfg.tile_h)
    num_tiles = gw * gh
    print(f"grid {gw}x{gh} = {num_tiles} tiles", flush=True)

    # dispatch latency
    triv = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    print(f"dispatch+trivial: {timeit(triv, x, iters=20):8.2f} ms", flush=True)

    act = gm.activate(state)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)

    @jax.jit
    def preprocess(act):
        cov6 = gaussian_math.compute_cov3d(act.scales, act.quats)
        max_scale = jnp.max(act.scales, axis=-1)
        proj = gaussian_math.project_gaussians(
            act.means3d, cov6, act.opacities, cam.world_view,
            cam.full_proj, width, height, focal_x, focal_y,
            cam.tan_fovx, cam.tan_fovy, dilation=cfg.dilation,
            antialiasing=False, near=cfg.near, valid_in=act.valid,
            big_limit=cfg.big_limit, max_scale=max_scale)
        color = sh_ops.sh_color(sh_degree, act.shs, act.means3d,
                                cam.campos)
        return proj, color

    proj, color = preprocess(act)
    jax.block_until_ready((proj, color))
    print(f"preprocess+SH fwd: {timeit(preprocess, act):8.2f} ms", flush=True)

    @jax.jit
    def bins_fn(xy, depth, radius, valid):
        return bin_gaussians(xy, depth, radius, valid, width, height,
                             cfg.tile_w, cfg.tile_h, cfg.max_dup)

    bins = bins_fn(proj.xy, proj.depth, proj.radius, proj.valid)
    jax.block_until_ready(bins)
    print(f"num_dup = {int(bins.num_dup)}  overflow={bool(bins.overflow)}",
          flush=True)
    print(f"bin_gaussians: {timeit(bins_fn, proj.xy, proj.depth, proj.radius, proj.valid):8.2f} ms", flush=True)

    align_jit = jax.jit(lambda b: align_bins(b, num_tiles, rp.CHUNK))
    abins = align_jit(bins)
    jax.block_until_ready(abins)
    print(f"align_bins: {timeit(align_jit, bins):8.2f} ms", flush=True)
    cap_al = abins.entry_gid.shape[0]
    print(f"aligned cap = {cap_al}", flush=True)

    @jax.jit
    def gather_fn(abins, xy, conic, opacity, color, invd):
        n = xy.shape[0]
        feats = jnp.stack([
            xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
            opacity, color[:, 0], color[:, 1], color[:, 2], invd,
            jnp.ones((n,)), jnp.ones((n,)),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,))], axis=0)
        return feats[:, abins.entry_gid]

    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    entry_data = gather_fn(abins, proj.xy, proj.conic, proj.opacity, color,
                           invd)
    jax.block_until_ready(entry_data)
    print(f"entry gather: {timeit(gather_fn, abins, proj.xy, proj.conic, proj.opacity, color, invd):8.2f} ms", flush=True)

    fwd_fn = jax.jit(lambda e, s, c: rp.blend_forward(
        e, s, c, num_tiles=num_tiles, gw=gw, tile_h=cfg.tile_h,
        tile_w=cfg.tile_w, width=width, height=height))
    out = fwd_fn(entry_data, abins.tile_starts, abins.tile_counts)
    jax.block_until_ready(out)
    img4, final_t, n_contrib = out
    print(f"fwd kernel: {timeit(fwd_fn, entry_data, abins.tile_starts, abins.tile_counts):8.2f} ms", flush=True)
    nc = np.asarray(n_contrib)
    cnt = np.asarray(abins.tile_counts)
    print(f"n_contrib: max={nc.max()} mean-tile-max={nc.max(axis=(1,2)).mean():.1f}"
          f"  tile_counts: max={cnt.max()} mean={cnt.mean():.1f}", flush=True)

    g_img4 = jnp.ones_like(img4)
    g_ft = jnp.ones_like(final_t)
    bwd_fn = jax.jit(lambda e, s, c, ft, ncb, gi, gf: rp.blend_backward(
        e, s, c, ft, ncb, gi, gf, num_tiles=num_tiles, gw=gw,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, width=width, height=height))
    eg = bwd_fn(entry_data, abins.tile_starts, abins.tile_counts, final_t,
                n_contrib, g_img4, g_ft)
    jax.block_until_ready(eg)
    print(f"bwd kernel: {timeit(bwd_fn, entry_data, abins.tile_starts, abins.tile_counts, final_t, n_contrib, g_img4, g_ft):8.2f} ms", flush=True)

    # full forward
    act2 = act
    @jax.jit
    def full_fwd(act):
        return render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities,
            act.shs, act.valid, cam.world_view, cam.full_proj,
            cam.campos, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=384)
    o = full_fwd(act2)
    jax.block_until_ready(o)
    print(f"full fwd: {timeit(full_fwd, act2):8.2f} ms", flush=True)

    # full fwd+bwd (the bench step)
    gt = jnp.zeros((3, height, width), jnp.float32)

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

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    args = (state.xyz, state.log_scale, state.quat, state.opacity_logit,
            state.f_dc, state.f_rest)
    o = step(*args)
    jax.block_until_ready(o)
    print(f"full fwd+bwd: {timeit(step, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
