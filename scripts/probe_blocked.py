"""Probe: chunk-blocked HBM entry layout vs the current [16, cap] layout.

Round-3 directive #1: the per-chunk [16,128]->[128,16] relayouts inside the
blend kernels are suspected to be a large fraction of kernel time. This
probe measures, at the production bench shapes:
  A. floor kernel, current layout: DMA [16,128] slice + in-kernel transpose
  B. floor kernel, blocked layout: DMA one [128,16] block, no transpose
  C. the XLA-side cost of producing the blocked layout from the [16, cap]
     gather output (reshape+transpose), and of the reverse transform
  D. matmul orientation check: dot_general contracting sublane dims
     (chunk_c [CHUNK,4] x w [CHUNK,pix] -> [4,pix]) compiles + runs
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
    nc = cap // rp.CHUNK
    print(f"cap={cap} nc={nc}", flush=True)

    def timeit(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    CHUNK = rp.CHUNK
    tpb = 4
    pix = TW * TH

    # ---- C: XLA-side layout transforms -------------------------------
    # Mosaic requires DMA slices 128-lane aligned: the blocked layout must
    # be EXPLICITLY lane-padded to [nc, CHUNK, 128] (features in lanes 0:16)
    @jax.jit
    def to_blocked(e):
        # [16, cap] -> [nc, CHUNK, 128]
        b = e.reshape(16, nc, CHUNK).transpose(1, 2, 0)
        return jnp.pad(b, ((0, 0), (0, 0), (0, 128 - 16)))

    ms, entry_blocked = timeit(to_blocked, entry_data)
    print(f"XLA [16,cap]->[nc,128,128]: {ms:7.2f} ms", flush=True)

    @jax.jit
    def from_blocked(b):
        # [nc, CHUNK, 128] -> [16, cap]
        return b[:, :, :16].transpose(2, 0, 1).reshape(16, cap)

    ms, back = timeit(from_blocked, entry_blocked)
    print(f"XLA [nc,128,128]->[16,cap]: {ms:7.2f} ms", flush=True)
    assert np.allclose(np.asarray(back), np.asarray(entry_data))

    # gather fused with the blocking transpose (as _expand would do it)
    @jax.jit
    def gather_blocked(f):
        g = f[:, ab.entry_gid]
        b = g.reshape(16, nc, CHUNK).transpose(1, 2, 0)
        return jnp.pad(b, ((0, 0), (0, 0), (0, 128 - 16)))

    ms, _ = timeit(gather_blocked, feats)
    print(f"gather+block fused: {ms:7.2f} ms", flush=True)

    @jax.jit
    def gather_flat(f):
        return f[:, ab.entry_gid]

    ms, _ = timeit(gather_flat, feats)
    print(f"gather flat (baseline): {ms:7.2f} ms", flush=True)

    # ---- A: floor kernel, current layout ------------------------------
    def floor_a(starts_ref, counts_ref, entries_hbm, out_ref,
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
                return acc + chunk[:, 0:1] * jnp.ones((1, pix), jnp.float32)

            acc = jax.lax.fori_loop(0, n_chunks, body,
                                    jnp.zeros((CHUNK, pix), jnp.float32))
            out_ref[j] = jnp.sum(acc, axis=0, keepdims=True)
            return carry

        jax.lax.fori_loop(0, tpb, one_tile, 0)

    t_pad = -(-num_tiles // tpb) * tpb
    starts, counts, _ = rp._pad_tiles(ab.tile_starts, ab.tile_counts,
                                      num_tiles, tpb)

    grid_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    fa = jax.jit(lambda e, s, c: pl.pallas_call(
        floor_a, grid_spec=grid_a,
        out_shape=jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32),
    )(s, c, e))
    ms, out_a = timeit(fa, entry_data, starts, counts)
    print(f"floor A (DMA+transpose): {ms:7.2f} ms", flush=True)

    # ---- B: floor kernel, blocked layout -------------------------------
    def floor_b(starts_ref, counts_ref, entries_hbm, out_ref,
                chunk_vmem, sem):
        base = pl.program_id(0) * tpb

        def one_tile(j, carry):
            t = base + j
            start_chunk = starts_ref[t] // CHUNK
            count = counts_ref[t]
            n_chunks = pl.cdiv(count, CHUNK)

            def dma(slot, c):
                return pltpu.make_async_copy(
                    entries_hbm.at[start_chunk + c],
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
                chunk = chunk_vmem[slot]                  # [CHUNK, 128]
                return acc + chunk[:, 0:1] * jnp.ones((1, pix), jnp.float32)

            acc = jax.lax.fori_loop(0, n_chunks, body,
                                    jnp.zeros((CHUNK, pix), jnp.float32))
            out_ref[j] = jnp.sum(acc, axis=0, keepdims=True)
            return carry

        jax.lax.fori_loop(0, tpb, one_tile, 0)

    grid_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tpb, 1, pix), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    fb = jax.jit(lambda e, s, c: pl.pallas_call(
        floor_b, grid_spec=grid_b,
        out_shape=jax.ShapeDtypeStruct((t_pad, 1, pix), jnp.float32),
    )(s, c, e))
    ms, out_b = timeit(fb, entry_blocked, starts, counts)
    print(f"floor B (blocked, no transpose): {ms:7.2f} ms", flush=True)
    assert np.allclose(np.asarray(out_a), np.asarray(out_b)), "A != B"

    # ---- D: sublane-contracting matmul orientation ---------------------
    def mm_kernel(a_ref, b_ref, o_ref):
        # [CHUNK, 4] x [CHUNK, pix] -> [4, pix], contracting sublanes
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.randn(CHUNK, 4), jnp.float32)
    b = jnp.asarray(np.random.randn(CHUNK, pix), jnp.float32)
    mm = jax.jit(lambda a, b: pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((4, pix), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    out = mm(a, b)
    ref = np.asarray(a).T @ np.asarray(b)
    assert np.allclose(np.asarray(out), ref, atol=1e-3), "dot_general D"
    print("sublane-contracting dot_general: OK", flush=True)


if __name__ == "__main__":
    main()
