"""v5e sort scaling: f32-key + i32-payload at various sizes, plus the
3-payload binning sort, to locate the sort share of binning at LOD scale."""
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

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)

    rng = np.random.default_rng(0)
    for n in (100_000, 352 * 1024, 1 << 20):
        key = jnp.asarray(rng.random(n).astype(np.float32))
        i1 = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

        @jax.jit
        def s2(key, i1):
            return jax.lax.sort((key, i1), num_keys=1)

        timeit(f"sort f32+i32 n={n}", s2, key, i1)

        k32 = jnp.asarray(rng.integers(0, 2040, n).astype(np.int32))

        @jax.jit
        def s3(k32, i1):
            return jax.lax.sort(
                (k32, i1, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                is_stable=True)

        timeit(f"stable sort i32-key +2 payloads n={n}", s3, k32, i1)


if __name__ == "__main__":
    main()
