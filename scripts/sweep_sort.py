"""Measure: packed single-key sort + scatter inversion vs the current
(tile,gid,slot) sort + gen re-sort in binning/align.

Stage A (current):  sort (tile, gid, slot) 1key+2payloads; align re-sorts
                    (gen, dst) to invert the permutation.
Stage B (packed):   sort ONE uint32 (tile << S | slot); derive tile/gen by
                    shift/mask; invert gen->dst with a single-row scatter;
                    entry_gid with a second single-row scatter of gen-order
                    values. Checks bitwise equality of every output.
"""

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
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                                tile_grid)
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    TW, TH = 32, 32
    MD = 1 << 19
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = tile_grid(width, height, TW, TH)
    num_tiles = gw * gh
    print(f"tiles {gw}x{gh}={num_tiles}  max_dup={MD}")

    xyz = jnp.asarray(p["xyz"])
    scales = jnp.exp(jnp.asarray(p["log_scale"]))
    q = jnp.asarray(p["quat"])
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    op = jax.nn.sigmoid(jnp.asarray(p["opacity_logit"])[..., 0])
    cov6 = gaussian_math.compute_cov3d(scales, q)
    proj = gaussian_math.project_gaussians(
        xyz, cov6, op, cam.world_view, cam.full_proj, width, height,
        focal_x, focal_y, cam.tan_fovx, cam.tan_fovy)
    proj = jax.block_until_ready(proj)

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    @jax.jit
    def current(proj):
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)
        ab = align_bins(bins, num_tiles, 128)
        return bins, ab

    ms, (bins, ab) = timeit(current, proj)
    print(f"current bin+align: {ms:7.2f} ms  num_dup={int(bins.num_dup)}")

    # ---- packed prototype ----------------------------------------------
    S = 19
    assert MD <= 1 << S and num_tiles < (1 << (32 - S))

    @jax.jit
    def packed(proj):
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, MD,
                             ext=proj.ext, reff2=proj.reff2)
        return bins

    # time just the two sorts in isolation on the same inputs
    tile_id = jnp.where(
        bins.sorted_tile < num_tiles, bins.sorted_tile, num_tiles)
    slot = jnp.arange(MD, dtype=jnp.int32)
    key = np.random.default_rng(0)
    tile_unsorted = jnp.asarray(
        np.asarray(tile_id)[np.asarray(
            jax.random.permutation(jax.random.PRNGKey(0), MD))])
    gid_gen = bins.sorted_gid  # stand-in values, any int32

    @jax.jit
    def sort_current(tile, gid):
        return jax.lax.sort((tile, gid, slot), num_keys=1, is_stable=True)

    @jax.jit
    def sort_packed(tile):
        pk = (tile.astype(jnp.uint32) << S) | slot.astype(jnp.uint32)
        sp = jax.lax.sort(pk)
        st = (sp >> S).astype(jnp.int32)
        sg = (sp & ((1 << S) - 1)).astype(jnp.int32)
        return st, sg

    ms_c, outc = timeit(sort_current, tile_unsorted, gid_gen)
    ms_p, outp = timeit(sort_packed, tile_unsorted)
    st_c, sg_c, gen_c = outc
    st_p, sg_p = outp
    assert bool(jnp.all(st_c == st_p))
    assert bool(jnp.all(gen_c == sg_p))
    print(f"sort current (1k+2p): {ms_c:7.2f} ms   packed (0p): {ms_p:7.2f} ms")

    # inversion: sort vs single-row scatter
    dst = jnp.asarray(
        np.random.default_rng(1).permutation(MD).astype(np.int32))
    gen = sg_p

    @jax.jit
    def invert_sort(gen, dst):
        _, out = jax.lax.sort((gen, dst), num_keys=1, is_stable=True)
        return out

    @jax.jit
    def invert_scatter(gen, dst):
        return jnp.zeros((1, MD), jnp.int32).at[:, gen].set(
            dst[None], mode="drop")[0]

    ms_is, a = timeit(invert_sort, gen, dst)
    ms_ic, b = timeit(invert_scatter, gen, dst)
    assert bool(jnp.all(a == b))
    print(f"invert sort: {ms_is:7.2f} ms   scatter: {ms_ic:7.2f} ms")


if __name__ == "__main__":
    main()
