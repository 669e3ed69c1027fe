"""Stage profile of the realistic bench at 32x16 tiles, tight binning."""

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
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops.binning import align_bins, bin_gaussians, tile_grid
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    sh_degree = 3
    TW, TH = 32, 16
    MD = 1 << 20
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = tile_grid(width, height, TW, TH)
    num_tiles = gw * gh
    cfg = RasterizerConfig(backend="pallas", tile_w=TW, tile_h=TH,
                           max_dup=MD, tight_binning=True)

    args_np = {k: jnp.asarray(v) for k, v in p.items()}

    def timeit(fn, *a, iters=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def preprocess(pr):
        scales = jnp.exp(pr["log_scale"])
        q = pr["quat"] / jnp.linalg.norm(pr["quat"], axis=-1,
                                         keepdims=True).clip(1e-12)
        op = jax.nn.sigmoid(pr["opacity_logit"][..., 0])
        cov6 = gaussian_math.compute_cov3d(scales, q)
        proj = gaussian_math.project_gaussians(
            pr["xyz"], cov6, op, cam.world_view, cam.full_proj,
            width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy)
        shs = jnp.concatenate([pr["f_dc"], pr["f_rest"]], axis=1)
        color = sh_ops.sh_color(sh_degree, shs, pr["xyz"], cam.campos)
        return proj, color

    proj, color = preprocess(args_np)
    jax.block_until_ready((proj, color))
    print(f"preprocess+SH fwd: {timeit(preprocess, args_np):7.2f} ms", flush=True)

    # preprocess backward
    @jax.jit
    def preprocess_grad(pr):
        def f(pr):
            proj, color = preprocess.__wrapped__(pr)
            return (jnp.sum(proj.xy * 1e-3) + jnp.sum(proj.conic * 1e-6)
                    + jnp.sum(proj.opacity) * 1e-3 + jnp.sum(color) * 1e-4
                    + jnp.sum(proj.depth) * 1e-5)
        return jax.grad(f)(pr)

    g = preprocess_grad(args_np)
    jax.block_until_ready(g)
    print(f"preprocess+SH fwd+bwd: {timeit(preprocess_grad, args_np):7.2f} ms", flush=True)

    bins_fn = jax.jit(lambda proj: bin_gaussians(
        proj.xy, proj.depth, proj.radius, proj.valid, width, height, TW, TH,
        MD, ext=proj.ext, reff2=proj.reff2))
    bins = bins_fn(proj)
    jax.block_until_ready(bins)
    print(f"bin_gaussians: {timeit(bins_fn, proj):7.2f} ms", flush=True)

    align_jit = jax.jit(lambda b: align_bins(b, num_tiles, rp.CHUNK))
    abins = align_jit(bins)
    jax.block_until_ready(abins)
    print(f"align_bins: {timeit(align_jit, bins):7.2f} ms  cap={abins.entry_gid.shape[0]}", flush=True)

    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)

    @jax.jit
    def feats_fn(proj, color, invd):
        return jnp.stack([
            proj.xy[:, 0], proj.xy[:, 1],
            -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
            -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
            color[:, 2], invd, jnp.ones((n,)), jnp.ones((n,)),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,))], axis=0)

    feats = feats_fn(proj, color, invd)

    egather = jax.jit(lambda f, a: rast._expand(f, a))
    ed = egather(feats, abins)
    jax.block_until_ready(ed)
    print(f"entry gather: {timeit(egather, feats, abins):7.2f} ms", flush=True)

    fwd_fn = jax.jit(lambda e, s, c: rp.blend_forward(
        e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
        width=width, height=height))
    out = fwd_fn(ed, abins.tile_starts, abins.tile_counts)
    jax.block_until_ready(out)
    img4, ft, nc, _ = out
    print(f"fwd kernel: {timeit(fwd_fn, ed, abins.tile_starts, abins.tile_counts):7.2f} ms", flush=True)
    ncn = np.asarray(nc)
    cnt = np.asarray(abins.tile_counts)
    print(f"  n_contrib max={ncn.max()} tile-max-mean={ncn.max(axis=(1,2)).mean():.0f}"
          f"  counts max={cnt.max()} mean={cnt.mean():.0f}", flush=True)

    bwd_fn = jax.jit(lambda e, s, c, ft, nc, gi, gf: rp.blend_backward(
        e, s, c, ft, nc, gi, gf, num_tiles=num_tiles, gw=gw, tile_h=TH,
        tile_w=TW, width=width, height=height))
    eg = bwd_fn(ed, abins.tile_starts, abins.tile_counts, ft, nc,
                jnp.ones_like(img4), jnp.ones_like(ft))
    jax.block_until_ready(eg)
    print(f"bwd kernel: {timeit(bwd_fn, ed, abins.tile_starts, abins.tile_counts, ft, nc, jnp.ones_like(img4), jnp.ones_like(ft)):7.2f} ms", flush=True)

    # gradient reduction (the _expand VJP)
    @jax.jit
    def reduce_fn(feats, abins, ct):
        _, vjp = jax.vjp(lambda f: rast._expand(f, abins), feats)
        return vjp(ct)[0]

    r = reduce_fn(feats, abins, ed)
    jax.block_until_ready(r)
    print(f"grad reduce: {timeit(reduce_fn, feats, abins, ed):7.2f} ms", flush=True)

    # full step
    gt = jnp.zeros((3, height, width), jnp.float32)

    def loss_fn(xyz, log_scale, quat, op_logit, f_dc, f_rest):
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        out = render_mod.render_arrays(
            xyz, jnp.exp(log_scale), q, jax.nn.sigmoid(op_logit[..., 0]),
            shs, jnp.ones((n,), bool), cam.world_view, cam.full_proj,
            cam.campos, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=384)
        return jnp.abs(out.image - gt).mean()

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    a = tuple(args_np[k] for k in ("xyz", "log_scale", "quat",
                                   "opacity_logit", "f_dc", "f_rest"))
    o = step(*a)
    jax.block_until_ready(o)
    print(f"full fwd+bwd: {timeit(step, *a):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
