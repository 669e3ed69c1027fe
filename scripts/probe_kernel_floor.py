"""Lower-bound the blend kernels: a stripped Pallas kernel that walks the
same chunks with the same DMAs + transposes but minimal math. The gap to
the real kernels = trimmable compute; the floor itself = structural."""
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
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
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
    bins = jax.jit(lambda: bin_gaussians(
        proj.xy, proj.depth, proj.radius, proj.valid, width, height,
        TW, TH, MD, ext=proj.ext, reff2=proj.reff2))()
    ab = jax.jit(lambda: align_bins(bins, num_tiles, rp.CHUNK))()
    cap = ab.entry_gid.shape[0]
    color = jnp.zeros((proj.xy.shape[0], 3))
    feats = jnp.stack(
        [proj.xy[:, 0], proj.xy[:, 1],
         -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
         -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
         color[:, 2], 1.0 / jnp.maximum(proj.depth, 1e-6)]
        + [jnp.zeros_like(proj.depth)] * 6, axis=0)
    entry_data = jax.jit(lambda: rast._expand(feats, ab))()
    jax.block_until_ready(entry_data)
    print(f"cap={cap}", flush=True)

    CHUNK = rp.CHUNK
    tpb = 4
    pix = TW * TH

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
                # minimal math: one broadcasted op so nothing is DCE'd
                return acc + jnp.sum(chunk[:, 0:1]) * jnp.ones(
                    (1, pix), jnp.float32)

            acc = jax.lax.fori_loop(0, n_chunks, body,
                                    jnp.zeros((1, pix), jnp.float32))
            out_ref[j] = acc
            return carry

        jax.lax.fori_loop(0, tpb, one_tile, 0)

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

    f = jax.jit(lambda e, s, c: pl.pallas_call(
        floor_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32),
    )(s, c, e))

    out = f(entry_data, starts, counts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(entry_data, starts, counts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"floor kernel (DMA+transpose+1op): {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
