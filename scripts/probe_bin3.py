"""Decompose bin_gaussians_aligned at bench shapes: candidate generation
vs count-sort vs pad-build vs big sort vs inversion sort. Each stage own-jit
(returns all outputs to defeat DCE)."""
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
    from hlod_gaussians_tpu.ops import binning as B
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    TW = TH = 32
    MD = 352 * 1024
    p = make_bench_scene()
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    focal_x = width / (2.0 * cam.tan_fovx)
    focal_y = height / (2.0 * cam.tan_fovy)
    gw, gh = B.tile_grid(width, height, TW, TH)
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

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    CHUNK = 128

    @jax.jit
    def cand(proj):
        return B._make_candidates(proj.xy, proj.depth, proj.radius,
                                  proj.valid, width, height, TW, TH, MD,
                                  ext=proj.ext, reff2=proj.reff2)

    ms, c = timeit(cand, proj)
    (tile_id, gid_orig, slot, keep, order, offsets_exc, touched_s,
     total_cand, overflow) = c
    print(f"candidates (_make_candidates): {ms:7.2f} ms", flush=True)

    @jax.jit
    def countsort(tile_id):
        sk = jax.lax.sort(tile_id)
        bounds = jnp.searchsorted(
            sk, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
        return bounds

    ms, bounds = timeit(countsort, tile_id)
    print(f"count sort+searchsorted [352k keys]: {ms:7.2f} ms", flush=True)

    @jax.jit
    def histo(tile_id):
        return jnp.zeros((num_tiles + 1,), jnp.int32).at[
            jnp.minimum(tile_id, num_tiles)].add(1, mode="drop")

    ms, h = timeit(histo, tile_id)
    counts_ref = np.asarray(bounds[1:num_tiles + 1] - bounds[:num_tiles])
    assert (np.asarray(h)[:num_tiles] == counts_ref).all()
    print(f"histogram scatter-add [352k->2041]: {ms:7.2f} ms", flush=True)

    md = MD
    cap = -(-(md + num_tiles * (CHUNK - 1)) // CHUNK) * CHUNK

    @jax.jit
    def bigsort(tile_id, gid_orig, slot, bounds):
        counts = bounds[1:] - bounds[:num_tiles]
        padded = -(-counts // CHUNK) * CHUNK
        aligned_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        pad_ct = padded - counts
        r = jnp.arange(CHUNK - 1, dtype=jnp.int32)[None, :]
        t = jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
        pad_keys = jnp.where(r < pad_ct[:, None], t, num_tiles).reshape(-1)
        n_fill = cap - md - pad_keys.shape[0]
        fill = jnp.full((n_fill,), num_tiles, jnp.int32)
        keys = jnp.concatenate([tile_id, pad_keys, fill])
        gids = jnp.concatenate([gid_orig, jnp.zeros((cap - md,), jnp.int32)])
        gens = jnp.concatenate([slot, jnp.full((cap - md,), md, jnp.int32)])
        return jax.lax.sort((keys, gids, gens), num_keys=1, is_stable=True), \
            aligned_starts

    ms, (bs, astarts) = timeit(bigsort, tile_id, gid_orig, slot, bounds)
    print(f"pad-build + big sort [620k x3]: {ms:7.2f} ms", flush=True)

    sorted_gen = bs[2]

    @jax.jit
    def invsort(sorted_gen):
        return jax.lax.sort(
            (sorted_gen, jnp.arange(cap, dtype=jnp.int32)), num_keys=1,
            is_stable=True)[1][:md]

    ms, _ = timeit(invsort, sorted_gen)
    print(f"inversion sort [620k x2]: {ms:7.2f} ms", flush=True)

    # candidate-generation sub-pieces
    n = proj.xy.shape[0]

    @jax.jit
    def depth_sort(proj):
        dkey = jnp.where(proj.valid, proj.depth, jnp.inf)
        return jax.lax.sort((dkey, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1)

    ms, _ = timeit(depth_sort, proj)
    print(f"depth sort [100k x2]: {ms:7.2f} ms", flush=True)

    starts = jnp.where(touched_s > 0,
                       offsets_exc.astype(jnp.int32), MD)

    @jax.jit
    def seg_scatter(starts):
        seg = jnp.zeros((1, MD), jnp.float32).at[
            :, starts].add(1.0, mode="drop")[0]
        return (jnp.cumsum(seg) - 1.0).astype(jnp.int32)

    ms, gid_s = timeit(seg_scatter, starts)
    print(f"segment scatter+cumsum [100k->352k]: {ms:7.2f} ms", flush=True)

    attrs = jnp.zeros((8, n), jnp.float32)

    @jax.jit
    def attr_gather(attrs, gid_s):
        return jax.lax.optimization_barrier(attrs[:, gid_s])

    ms, _ = timeit(attr_gather, attrs, gid_s)
    print(f"attrs gather [8,100k]->[8,352k]: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
