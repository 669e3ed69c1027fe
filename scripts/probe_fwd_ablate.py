"""Locate the forward blend kernel's time (round-4 directive #6).

The floor sweep (probe_kernel_floor2) says structure (DMA+transpose+loop)
is 3.42 ms and dependent [CHUNK,pix] elementwise ops cost ~17 us each at
bench shapes — the ~45-op forward math explains <1 ms of the measured
~10.5. This probe rebuilds the forward tile walk with toggles and times
cumulative variants to find the expensive block: the color MXU matmul,
the prefix scan, the exp, the saturation cond, or fusion breaks from the
reduction/select mix.
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

    def make_kernel(*, do_exp, do_masks, do_scan, do_w, do_mm, do_cond,
                    do_reduce):
        def kern(starts_ref, counts_ref, entries_hbm, img_ref, ft_ref,
                 chunk_vmem, sem):
            base = pl.program_id(0) * tpb

            def one_tile(j, carry):
                t = base + j
                start = starts_ref[t]
                count = counts_ref[t]
                px, py = rp._pixel_xy(t, gw, TH, TW, pix)
                inside = (px < width) & (py < height)
                pxf = px.astype(jnp.float32)
                pyf = py.astype(jnp.float32)
                n_chunks = pl.cdiv(count, CHUNK)

                def dma(slot, c):
                    off = pl.multiple_of(start + c * CHUNK, CHUNK)
                    return pltpu.make_async_copy(
                        entries_hbm.at[:, pl.ds(off, CHUNK)],
                        chunk_vmem.at[slot], sem.at[slot])

                @pl.when(n_chunks > 0)
                def _():
                    dma(0, 0).start()

                def body(c, carry2):
                    T_chain, acc4, n_contrib = carry2
                    slot = c % 2

                    @pl.when(c + 1 < n_chunks)
                    def _():
                        dma((c + 1) % 2, c + 1).start()
                    dma(slot, c).wait()

                    def process(args):
                        T_chain, acc4, n_contrib = args
                        chunk = jnp.transpose(chunk_vmem[slot])
                        col = lambda i: chunk[:, i:i + 1]
                        gx, gy = col(0), col(1)
                        s0, s1, s2 = col(2), col(3), col(4)
                        opc = col(5)
                        dx = gx - pxf
                        dy = gy - pyf
                        power = dx * (s0 * dx + s1 * dy) + (s2 * dy) * dy
                        G = jnp.exp(power) if do_exp else power + 1.0
                        opG = opc * G
                        alpha = jnp.minimum(0.99, opG)
                        if do_masks:
                            k = (c * CHUNK + jax.lax.broadcasted_iota(
                                jnp.int32, (CHUNK, 1), 0))
                            pre = ((power <= 0.0) & (alpha >= alpha_min)
                                   & (k < count) & inside)
                            alpha = jnp.where(pre, alpha, 0.0)
                        one_m = 1.0 - alpha
                        cum = rp._scan_ex_prod(one_m) if do_scan else one_m
                        t_before = T_chain * cum
                        if do_masks:
                            apply = pre & (t_before * one_m >= t_eps)
                            w = (jnp.where(apply, alpha * t_before, 0.0)
                                 if do_w else alpha * t_before)
                        else:
                            apply = (t_before * one_m >= t_eps)
                            w = alpha * t_before
                        if do_mm:
                            c4 = chunk_vmem[slot][6:10]
                            acc4 = acc4 + rp._mm_split22(c4, w)
                        else:
                            acc4 = acc4 + jnp.sum(w, axis=0,
                                                  keepdims=True) * 0.25
                        if do_reduce:
                            T_chain = -jnp.max(-(t_before * one_m), axis=0,
                                               keepdims=True)
                            kk = (jax.lax.broadcasted_iota(
                                jnp.int32, (CHUNK, 1), 0) + 1)
                            n_contrib = jnp.maximum(
                                n_contrib,
                                jnp.max(jnp.where(apply, kk, 0), axis=0,
                                        keepdims=True))
                        else:
                            T_chain = T_chain * 0.999
                        return T_chain, acc4, n_contrib

                    if do_cond:
                        saturated = jnp.max(
                            jnp.where(inside, T_chain, 0.0)) < t_eps
                        return jax.lax.cond(saturated, lambda a: a, process,
                                            (T_chain, acc4, n_contrib))
                    return process((T_chain, acc4, n_contrib))

                acc_shape = 4 if do_mm else 1
                init = (jnp.ones((1, pix), jnp.float32),
                        jnp.zeros((acc_shape, pix), jnp.float32),
                        jnp.zeros((1, pix), jnp.int32))
                T_chain, acc4, n_contrib = jax.lax.fori_loop(
                    0, n_chunks, body, init)
                img_ref[j, :acc_shape] = acc4
                ft_ref[j] = T_chain
                return carry

            jax.lax.fori_loop(0, tpb, one_tile, 0)
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
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    variants = [
        ("base (power+alpha only)", dict(do_exp=False, do_masks=False,
                                         do_scan=False, do_w=False,
                                         do_mm=False, do_cond=False,
                                         do_reduce=False)),
        ("+exp", dict(do_exp=True, do_masks=False, do_scan=False,
                      do_w=False, do_mm=False, do_cond=False,
                      do_reduce=False)),
        ("+masks", dict(do_exp=True, do_masks=True, do_scan=False,
                        do_w=False, do_mm=False, do_cond=False,
                        do_reduce=False)),
        ("+scan", dict(do_exp=True, do_masks=True, do_scan=True,
                       do_w=False, do_mm=False, do_cond=False,
                       do_reduce=False)),
        ("+w-select", dict(do_exp=True, do_masks=True, do_scan=True,
                           do_w=True, do_mm=False, do_cond=False,
                           do_reduce=False)),
        ("+color-matmul", dict(do_exp=True, do_masks=True, do_scan=True,
                               do_w=True, do_mm=True, do_cond=False,
                               do_reduce=False)),
        ("+reduces", dict(do_exp=True, do_masks=True, do_scan=True,
                          do_w=True, do_mm=True, do_cond=False,
                          do_reduce=True)),
        ("+cond (== full fwd)", dict(do_exp=True, do_masks=True,
                                     do_scan=True, do_w=True, do_mm=True,
                                     do_cond=True, do_reduce=True)),
    ]

    for name, kw in variants:
        f = jax.jit(lambda e, s, c, kw=tuple(sorted(kw.items())): pl.pallas_call(
            make_kernel(**dict(kw)), grid_spec=grid_spec,
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
        print(f"{name:28s}: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
