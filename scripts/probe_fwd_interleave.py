"""Tile-interleaved forward walk probe (round-4).

probe_fwd_ablate located the forward kernel's cost in the LOOP-CARRIED
transmittance chain: with a real carry + reduces, walking every chunk
costs 33.8 ms (~9.2 us serialized latency per chunk across 3663 chunks)
vs ~10 ms of throughput-equivalent work — the per-chunk dependency chain
(carry -> t_before -> reduce -> carry) stalls the VPU, and the saturation
cond only PRUNES chunks instead of hiding the latency.

This probe processes the program's `tpb` tiles IN LOCKSTEP through the
chunk loop (static x4 unroll, 4 independent carry chains per iteration):
consecutive dependent ops now belong to different tiles, so the machine
can overlap them. Finished tiles ride along masked (their extra chunks
cost throughput, not latency). Compares against the sequential layout.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    CHUNK = rp.CHUNK
    tpb = 4
    pix = TW * TH
    t_eps = 1e-4
    alpha_min = 1.0 / 255.0

    def tile_chunk_math(chunk_t, pxf, pyf, inside, count, c, T_chain, acc4,
                        n_contrib):
        chunk = jnp.transpose(chunk_t)
        col = lambda i: chunk[:, i:i + 1]
        dx = col(0) - pxf
        dy = col(1) - pyf
        s0, s1, s2 = col(2), col(3), col(4)
        power = dx * (s0 * dx + s1 * dy) + (s2 * dy) * dy
        G = jnp.exp(power)
        alpha = jnp.minimum(0.99, col(5) * G)
        k = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pre = (power <= 0.0) & (alpha >= alpha_min) & (k < count) & inside
        alpha = jnp.where(pre, alpha, 0.0)
        one_m = 1.0 - alpha
        cum = rp._scan_ex_prod(one_m)
        t_before = T_chain * cum
        t_incl = t_before * one_m
        apply = pre & (t_incl >= t_eps)
        w = jnp.where(apply, alpha * t_before, 0.0)
        c4 = chunk_t[6:10]
        acc4 = acc4 + rp._mm_split22(c4, w)
        T_chain = -jnp.max(-t_incl, axis=0, keepdims=True)
        n_contrib = jnp.maximum(
            n_contrib, jnp.max(jnp.where(apply, k + 1, 0), axis=0,
                               keepdims=True))
        return T_chain, acc4, n_contrib

    def make_interleaved():
        def kern(starts_ref, counts_ref, entries_hbm, img_ref, ft_ref,
                 chunk_vmem, sem):
            base = pl.program_id(0) * tpb
            starts = [starts_ref[base + j] for j in range(tpb)]
            counts = [counts_ref[base + j] for j in range(tpb)]
            pxys = [rp._pixel_xy(base + j, gw, TH, TW, pix)
                    for j in range(tpb)]
            insides = [(px < width) & (py < height) for px, py in pxys]
            pxfs = [px.astype(jnp.float32) for px, _ in pxys]
            pyfs = [py.astype(jnp.float32) for _, py in pxys]
            ncs = [pl.cdiv(counts[j], CHUNK) for j in range(tpb)]
            max_nc = ncs[0]
            for j in range(1, tpb):
                max_nc = jnp.maximum(max_nc, ncs[j])

            def dma(j, slot, c):
                off = pl.multiple_of(starts[j] + c * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    entries_hbm.at[:, pl.ds(off, CHUNK)],
                    chunk_vmem.at[j, slot], sem.at[j, slot])

            for j in range(tpb):
                @pl.when(ncs[j] > 0)
                def _(j=j):
                    dma(j, 0, 0).start()

            def body(c, carry):
                Ts, accs, nconts = carry
                slot = c % 2
                new_Ts, new_accs, new_ncs2 = [], [], []
                for j in range(tpb):
                    @pl.when(c + 1 < ncs[j])
                    def _(j=j):
                        dma(j, (c + 1) % 2, c + 1).start()
                for j in range(tpb):
                    @pl.when(c < ncs[j])
                    def _(j=j):
                        dma(j, slot, c).wait()
                for j in range(tpb):
                    # live = this tile still has chunks AND not saturated
                    live = (c < ncs[j]) & (jnp.max(
                        jnp.where(insides[j], Ts[j], 0.0)) >= t_eps)
                    T2, a2, n2 = tile_chunk_math(
                        chunk_vmem[j, slot], pxfs[j], pyfs[j], insides[j],
                        counts[j], c, Ts[j], accs[j], nconts[j])
                    # masked carry update keeps finished tiles frozen
                    new_Ts.append(jnp.where(live, T2, Ts[j]))
                    new_accs.append(jnp.where(live, a2, accs[j]))
                    new_ncs2.append(jnp.where(live, n2, nconts[j]))
                return tuple(new_Ts), tuple(new_accs), tuple(new_ncs2)

            init = (tuple(jnp.ones((1, pix), jnp.float32)
                          for _ in range(tpb)),
                    tuple(jnp.zeros((4, pix), jnp.float32)
                          for _ in range(tpb)),
                    tuple(jnp.zeros((1, pix), jnp.int32)
                          for _ in range(tpb)))
            Ts, accs, nconts = jax.lax.fori_loop(0, max_nc, body, init)
            for j in range(tpb):
                img_ref[j] = accs[j]
                ft_ref[j] = Ts[j]

        return kern

    t_pad = -(-num_tiles // tpb) * tpb
    starts, counts, _ = rp._pad_tiles(ab.tile_starts, ab.tile_counts,
                                      num_tiles, tpb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((tpb, 4, pix), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0))),
        scratch_shapes=[
            pltpu.VMEM((tpb, 2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tpb, 2)),
        ])

    f = jax.jit(lambda e, s, c: pl.pallas_call(
        make_interleaved(), grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((t_pad, 4, pix), jnp.float32),
                   jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32)),
    )(s, c, e))
    out = f(entry_data, starts, counts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(entry_data, starts, counts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"interleaved x{tpb} forward walk: {dt:7.2f} ms", flush=True)

    # same-session reference: the production forward kernel
    fwd = jax.jit(lambda e, s, c: rp.blend_forward(
        e, s, c, num_tiles=num_tiles, gw=gw, tile_h=TH, tile_w=TW,
        width=width, height=height))
    o2 = fwd(entry_data, ab.tile_starts, ab.tile_counts)
    jax.block_until_ready(o2)
    t0 = time.perf_counter()
    for _ in range(20):
        o2 = fwd(entry_data, ab.tile_starts, ab.tile_counts)
    jax.block_until_ready(o2)
    dt2 = (time.perf_counter() - t0) / 20 * 1e3
    print(f"sequential production fwd:    {dt2:7.2f} ms", flush=True)

    # sanity: images must match
    img_i = np.asarray(out[0][:num_tiles])
    img_s = np.asarray(o2[0][:num_tiles])
    print("img max|d| =", float(np.abs(img_i - img_s).max()), flush=True)


if __name__ == "__main__":
    main()
