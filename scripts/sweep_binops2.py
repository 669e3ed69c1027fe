"""Microbench replacement candidates for the slow binning ops."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    md = 448 * 1024
    n = 100_352
    nt = 2040
    rng = np.random.default_rng(0)
    touched = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    tile448 = jnp.asarray(np.sort(rng.integers(0, nt + 1, md)
                                  .astype(np.int32)))
    tile_idx = jnp.asarray(rng.integers(0, nt, md).astype(np.int32))
    diff_tbl = jnp.asarray(rng.integers(0, 1 << 20, nt + 1).astype(np.int32))

    def timeit(label, fn, *a, iters=30):
        out = jax.block_until_ready(jax.jit(fn)(*a))
        f = jax.jit(fn)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:6.2f} ms",
              flush=True)
        return out

    # repeat via scatter of segment starts + cumsum
    def rep_scatter(t):
        offs = jnp.cumsum(t) - t                      # exclusive offsets
        starts = jnp.where(t > 0, offs, md)
        z = jnp.zeros((1, md), jnp.float32).at[
            :, starts].add(1.0, mode="drop")[0]
        return (jnp.cumsum(z) - 1.0).astype(jnp.int32)

    r1 = timeit("repeat scatter+cumsum", rep_scatter, touched)
    r0 = timeit("repeat jnp (current)",
                lambda t: jnp.repeat(jnp.arange(n, dtype=jnp.int32), t,
                                     total_repeat_length=md), touched)
    total = int(jnp.sum(touched))
    ok = bool(jnp.all(r1[:min(total, md)] == r0[:min(total, md)]))
    print(f"  repeat parity: {ok}")

    # f32 cumsum vs i32 cumsum at 100k
    timeit("cumsum i32 100k", lambda t: jnp.cumsum(t), touched)
    timeit("cumsum f32 100k",
           lambda t: jnp.cumsum(t.astype(jnp.float32)).astype(jnp.int32),
           touched)

    # searchsorted variants
    q = jnp.arange(nt + 1, dtype=jnp.int32)
    s0 = timeit("searchsorted default",
                lambda s: jnp.searchsorted(s, q), tile448)
    s1 = timeit("searchsorted method=sort",
                lambda s: jnp.searchsorted(s, q, method="sort"), tile448)
    print(f"  searchsorted parity: {bool(jnp.all(s0 == s1))}")

    # small-table gathers: 1-row vs 2-row vs 8-row-padded
    timeit("tbl gather 1-row",
           lambda d, i: jax.lax.optimization_barrier(d[None][:, i])[0],
           diff_tbl, tile_idx)
    tbl2 = jnp.stack([diff_tbl, diff_tbl + 1])
    timeit("tbl gather 2-row",
           lambda d, i: jax.lax.optimization_barrier(d[:, i]),
           tbl2, tile_idx)
    tbl8 = jnp.tile(diff_tbl[None], (8, 1))
    timeit("tbl gather 8-row (same idx)",
           lambda d, i: jax.lax.optimization_barrier(d[:, i]),
           tbl8, tile_idx)

    def batched_take(d, i):
        ii = i.reshape(8, md // 8)
        out = jnp.take_along_axis(jnp.tile(d[None], (8, 1)), ii, axis=1)
        return out.reshape(md)

    t0 = timeit("tbl gather via 8-batched take_along_axis", batched_take,
                diff_tbl, tile_idx)
    ref = diff_tbl[tile_idx]
    print(f"  batched-take parity: {bool(jnp.all(t0 == ref))}")


if __name__ == "__main__":
    main()
