"""Speed-of-light basis for the blend kernels (round-4 directive #6).

Times stripped Pallas kernels that walk the REAL bench chunk structure
(same DMAs + transposes as probe_kernel_floor) with a parameterized count
of dependent [CHUNK, pix] f32 fma ops per chunk. The slope (ms per op)
and intercept (structural floor: DMA + transpose + loop) calibrate an
empirical per-op cost IN KERNEL CONTEXT — microbenches overstate the VPU
(XLA simplifies chains; probe_bf16_vpu measures 28 Tops/s f32 which is
~4x the architectural VPU), so the roofline here is measured, not quoted.
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
    from hlod_gaussians_tpu.ops import gaussian_math
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
    ab = jax.jit(lambda: bin_gaussians_aligned(
        proj.xy, proj.depth, proj.radius, proj.valid, width, height,
        TW, TH, MD, rp.CHUNK, ext=proj.ext, reff2=proj.reff2))()
    cap = ab.entry_gid.shape[0]
    entry_data = jnp.zeros((16, cap), jnp.float32) + 0.25

    CHUNK = rp.CHUNK
    tpb = 4
    pix = TW * TH

    def make_kernel(n_ops):
        def floor_kernel(starts_ref, counts_ref, entries_hbm, out_ref,
                         chunk_vmem, sem):
            base = pl.program_id(0) * tpb

            def one_tile(j, carry):
                t = base + j
                start = starts_ref[t]
                count = counts_ref[t]
                n_chunks = pl.cdiv(count, CHUNK)

                def dma(slot, c):
                    off = pl.multiple_of(start + c * CHUNK, CHUNK)
                    return pltpu.make_async_copy(
                        entries_hbm.at[:, pl.ds(off, CHUNK)],
                        chunk_vmem.at[slot], sem.at[slot])

                @pl.when(n_chunks > 0)
                def _():
                    dma(0, 0).start()

                def body(c, acc):
                    slot = c % 2

                    @pl.when(c + 1 < n_chunks)
                    def _():
                        dma((c + 1) % 2, c + 1).start()
                    dma(slot, c).wait()
                    chunk = jnp.transpose(chunk_vmem[slot])   # [CHUNK, 16]
                    # n_ops DEPENDENT [CHUNK, pix] fma ops with a
                    # data-dependent coefficient (an affine chain with
                    # literal constants is algebraically collapsible)
                    w = chunk[:, 1:2]
                    v = chunk[:, 0:1] + jnp.zeros((CHUNK, pix), jnp.float32)
                    for i in range(n_ops):
                        v = v * w + w
                    return acc + jnp.sum(v, axis=0, keepdims=True)

                acc = jax.lax.fori_loop(0, n_chunks, body,
                                        jnp.zeros((1, pix), jnp.float32))
                out_ref[j] = acc
                return carry

            jax.lax.fori_loop(0, tpb, one_tile, 0)
        return floor_kernel

    t_pad = -(-num_tiles // tpb) * tpb
    starts, counts, _ = rp._pad_tiles(ab.tile_starts, ab.tile_counts,
                                      num_tiles, tpb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    results = {}
    for n_ops in (1, 16, 32, 64):
        f = jax.jit(lambda e, s, c, k=n_ops: pl.pallas_call(
            make_kernel(k), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32),
        )(s, c, e))
        out = f(entry_data, starts, counts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(entry_data, starts, counts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20 * 1e3
        results[n_ops] = dt
        print(f"floor kernel, {n_ops:3d} fma/chunk: {dt:7.2f} ms",
              flush=True)

    ks = sorted(results)
    slope = (results[ks[-1]] - results[ks[0]]) / (ks[-1] - ks[0])
    intercept = results[ks[0]] - slope * ks[0]
    # walked entry-pixels at bench shapes (from the aligned tile counts)
    walked = int(np.ceil(np.asarray(ab.tile_counts) / CHUNK).sum()) * CHUNK
    print(f"slope {slope * 1e3:.1f} us/op  intercept {intercept:.2f} ms",
          flush=True)
    print(f"walked entries {walked} ({walked // CHUNK} chunks); "
          f"empirical elementwise rate "
          f"{walked * pix / (slope * 1e-3) / 1e12:.2f} Tops/s", flush=True)


if __name__ == "__main__":
    main()
