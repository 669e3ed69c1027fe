"""Microbench the non-sort pieces of bin_gaussians/align_bins at bench
scale: repeat, wide gathers, searchsorted, scatters, cumsum."""

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
    cap = 717952
    rng = np.random.default_rng(0)
    touched = rng.integers(0, 9, n).astype(np.int32)
    # scale to sum ~ 430k
    touched = jnp.asarray(touched)
    attrs = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    gid_s_np = np.repeat(np.arange(n, dtype=np.int32),
                         np.asarray(touched))[:md]
    gid_s_const = jnp.asarray(
        np.pad(gid_s_np, (0, md - gid_s_np.shape[0])))
    tile448 = jnp.asarray(rng.integers(0, nt + 1, md).astype(np.int32))
    dst = jnp.asarray(rng.permutation(cap)[:md].astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(md,)).astype(np.float32))
    egr = jnp.asarray(rng.normal(size=(16, cap)).astype(np.float32))
    g2s = jnp.asarray(rng.integers(0, cap, md).astype(np.int32))

    def timeit(label, fn, *a, iters=30):
        out = jax.block_until_ready(jax.jit(fn)(*a))
        f = jax.jit(fn)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:6.2f} ms",
              flush=True)

    timeit("repeat->gid_s [448k]",
           lambda t: jnp.repeat(jnp.arange(n, dtype=jnp.int32), t,
                                total_repeat_length=md), touched)
    timeit("gather attrs[:, order] [8,100k]", lambda a, o: a[:, o],
           attrs, order)
    timeit("gather attrs[:, gid_s] [8,448k]", lambda a, g: a[:, g],
           attrs, gid_s_const)
    timeit("searchsorted 2041 in 448k",
           lambda s: jnp.searchsorted(s, jnp.arange(nt + 1,
                                                    dtype=jnp.int32)),
           jnp.sort(tile448))
    timeit("scatter [1,718k].at[dst].set 448k",
           lambda d, v: jnp.zeros((1, cap), jnp.float32).at[:, d].set(
               v[None], mode="drop")[0], dst, vals)
    timeit("gather egrads[:, g2s] [16,448k]", lambda e, g: e[:, g],
           egr, g2s)
    timeit("cumsum [16,448k] ax1",
           lambda x: jnp.cumsum(x, axis=1), egr[:, :md])
    timeit("cumsum [448k] 1d", lambda x: jnp.cumsum(x), vals)
    timeit("cumsum [100k] 1d", lambda t: jnp.cumsum(t), touched)
    timeit("scatter [16,100k].at[:,ord].set",
           lambda s, o: jnp.zeros((16, n), jnp.float32).at[:, o].set(s),
           egr[:, :n], order)


if __name__ == "__main__":
    main()
