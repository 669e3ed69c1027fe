"""tpb sweep for the INTERLEAVED kernels (round-4): tpb is now the
latency-hiding width (independent carry chains per grid program), so the
round-3 sweep (sequential kernels, 4/8/16 equal) does not transfer.
Times isolated fwd and bwd at bench shapes for tpb in {4, 8}."""
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
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned, tile_grid
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    TW = TH = 32
    MD = 352 * 1024
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = tile_grid(width, height, TW, TH)
    num_tiles = gw * gh
    params = {k: jnp.asarray(v) for k, v in p.items()}
    scales = jnp.exp(params["log_scale"])
    q = params["quat"] / jnp.linalg.norm(params["quat"], axis=-1,
                                         keepdims=True).clip(1e-12)
    op = jax.nn.sigmoid(params["opacity_logit"][..., 0])
    cov6 = gaussian_math.compute_cov3d(scales, q)
    proj = jax.jit(lambda: gaussian_math.project_gaussians(
        params["xyz"], cov6, op, cam.world_view, cam.full_proj,
        width, height, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy))()
    shs = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
    color = sh_ops.sh_color(3, shs, params["xyz"], cam.campos)
    ab = jax.jit(lambda: bin_gaussians_aligned(
        proj.xy, proj.depth, proj.radius, proj.valid, width, height,
        TW, TH, MD, rp.CHUNK, ext=proj.ext, reff2=proj.reff2))()
    n = proj.xy.shape[0]
    feats = jnp.stack([
        proj.xy[:, 0], proj.xy[:, 1],
        -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
        -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
        color[:, 2], 1.0 / jnp.maximum(proj.depth, 1e-6),
        jnp.ones((n,)), jnp.ones((n,)),
        jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
    ], axis=0)
    entry_data = jax.jit(lambda: rast._expand(feats, ab))()
    jax.block_until_ready(entry_data)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 20 * 1e3, out

    for tpb in (4, 8):
        fwd = jax.jit(lambda e, s, c, tpb=tpb: rp.blend_forward(
            e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
            width=width, height=height, tpb=tpb))
        ms, fout = timeit(fwd, entry_data, ab.tile_starts, ab.tile_counts)
        img4_t, ft_t, nc_t, _ = fout
        print(f"fwd il tpb={tpb}: {ms:7.2f} ms", flush=True)

        g4 = jnp.ones_like(img4_t)
        gft = jnp.zeros_like(ft_t)
        bwd = jax.jit(lambda e, s, c, ft, nc, g, gf, tpb=tpb:
                      rp.blend_backward(
                          e, s, c, ft, nc, g, gf, num_tiles=num_tiles,
                          gw=gw, tile_h=TH, tile_w=TW, width=width,
                          height=height, tpb=tpb))
        ms, _ = timeit(bwd, entry_data, ab.tile_starts, ab.tile_counts,
                       ft_t, nc_t, g4, gft)
        print(f"bwd il tpb={tpb}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
