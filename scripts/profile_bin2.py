"""Sub-op profile of bin_gaussians + align_bins at bench-scene scale."""
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
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops.binning import (bin_gaussians, align_bins,
                                                compute_rects,
                                                compute_rects_tight,
                                                tile_grid)
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
    jax.block_until_ready(proj)

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)
        return out

    n = proj.xy.shape[0]
    xy, depth, radius, valid = proj.xy, proj.depth, proj.radius, proj.valid
    ext, reff2 = proj.ext, proj.reff2

    # ---- stage 1: rects + touched + depth sort
    @jax.jit
    def s1():
        tx0, ty0, trw, trh = compute_rects_tight(xy, ext, width, height,
                                                 TW, TH)
        rx0, ry0, rrw, rrh = compute_rects(xy, radius, width, height, TW, TH)
        min_x = jnp.maximum(tx0, rx0)
        min_y = jnp.maximum(ty0, ry0)
        rw = jnp.maximum(jnp.minimum(tx0 + trw, rx0 + rrw) - min_x, 0)
        rh = jnp.maximum(jnp.minimum(ty0 + trh, ry0 + rrh) - min_y, 0)
        touched = jnp.where(valid, rw * rh, 0).astype(jnp.int32)
        dkey = jnp.where(touched > 0, depth, jnp.inf)
        _, order = jax.lax.sort((dkey, jnp.arange(n, dtype=jnp.int32)),
                                num_keys=1)
        return min_x, min_y, rw, touched, order

    min_x, min_y, rw, touched, order = timeit("s1 rects+sort", s1)

    # ---- stage 2: attrs pack + gather by order
    @jax.jit
    def s2(min_x, min_y, rw, touched, order):
        rw_f = jnp.maximum(rw, 1).astype(jnp.float32)
        attrs = jnp.stack([
            jnp.zeros((n,), jnp.float32),
            min_x.astype(jnp.float32) * 256.0 + min_y.astype(jnp.float32),
            1.0 / rw_f, rw_f, xy[..., 0], xy[..., 1], reff2,
            jnp.arange(n, dtype=jnp.int32).astype(jnp.float32),
        ], axis=0)[:, order]
        touched_s = touched[order]
        offsets = jnp.cumsum(touched_s)
        offsets_exc = (offsets - touched_s).astype(jnp.float32)
        attrs = attrs.at[0].set(offsets_exc)
        return attrs, touched_s, offsets

    attrs, touched_s, offsets = timeit("s2 attrs+gather+cumsum", s2,
                                       min_x, min_y, rw, touched, order)

    # ---- stage 3: seg scatter + cumsum + entry gather
    @jax.jit
    def s3(attrs, touched_s, offsets):
        starts = jnp.where(touched_s > 0, offsets - touched_s, MD)
        seg = jnp.zeros((1, MD), jnp.float32).at[
            :, starts].add(1.0, mode="drop")[0]
        gid_s = (jnp.cumsum(seg) - 1.0).astype(jnp.int32)
        g = jax.lax.optimization_barrier(attrs[:, gid_s])
        return g

    g = timeit("s3 seg-scatter+cumsum+[8,MD]gather", s3,
               attrs, touched_s, offsets)

    # ---- stage 4: per-entry math + 3-payload sort + searchsorted
    @jax.jit
    def s4(g, offsets):
        slot = jnp.arange(MD, dtype=jnp.int32)
        total_cand = offsets[-1]
        in_range = slot < total_cand
        rank = slot.astype(jnp.float32) - g[0]
        ty_rel = jnp.floor((rank + 0.5) * g[2])
        g_min_x = jnp.floor(g[1] * (1.0 / 256.0))
        g_min_y = g[1] - g_min_x * 256.0
        tx = g_min_x + rank - ty_rel * g[3]
        ty = g_min_y + ty_rel
        x0 = tx * TW
        y0 = ty * TH
        cx = jnp.clip(g[4], x0, jnp.minimum(x0 + TW - 1, width - 1))
        cy = jnp.clip(g[5], y0, jnp.minimum(y0 + TH - 1, height - 1))
        dx = g[4] - cx
        dy = g[5] - cy
        keep = in_range & (dx * dx + dy * dy <= g[6])
        tile_id = jnp.where(keep, ty * gw + tx,
                            float(num_tiles)).astype(jnp.int32)
        gid_orig = g[7].astype(jnp.int32)
        sorted_tile, sorted_gid, sorted_gen = jax.lax.sort(
            (tile_id, gid_orig, slot), num_keys=1, is_stable=True)
        bounds = jnp.searchsorted(
            sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        return sorted_tile, sorted_gid, sorted_gen, bounds

    st, sg, sgen, bounds = timeit("s4 entrymath+sort+ranges", s4, g, offsets)

    # ---- align: scatter + gen sort
    bins = jax.jit(lambda: bin_gaussians(
        xy, depth, radius, valid, width, height, TW, TH, MD,
        ext=ext, reff2=reff2))()
    jax.block_until_ready(bins)

    @jax.jit
    def slam(bins):
        return align_bins(bins, num_tiles, 128)

    ab = timeit("align_bins", slam, bins)

    @jax.jit
    def align_noinv(bins):
        ab = align_bins(bins, num_tiles, 128)
        return ab.entry_gid, ab.tile_starts   # drop gen_to_slot consumer

    timeit("align_bins (no gen_to_slot)", align_noinv, bins)


if __name__ == "__main__":
    main()
