"""Isolate InterpTable gather vs output-transpose costs at 384k cut."""
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

    C = 1 << 20
    M = 384 * 1024
    D = 14
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2 * D, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, C, M).astype(np.int32))
    ts = jnp.asarray(rng.random(M).astype(np.float32))

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)
        return out

    @jax.jit
    def gather_only(idx):
        return jax.lax.optimization_barrier(feats[:, idx])

    g = timeit("gather [28, 384k]", gather_only, idx)

    @jax.jit
    def lerp_rows(g, ts):
        t = ts[None, :]
        return t * g[:D] + (1 - t) * g[D:]

    rows = timeit("lerp rows", lerp_rows, g, ts)

    @jax.jit
    def to_params(out):
        k = 1
        return dict(
            means3d=out[0:3].T, scales=out[3:6].T, quats=out[6:10].T,
            opacities=out[10], shs=out[11:11 + 3 * k].T.reshape(M, k, 3))

    timeit("transpose outputs", to_params, rows)

    @jax.jit
    def ts_gather_1row(idx):
        big = feats[0]
        return big[idx]

    timeit("1-row gather [384k] (cut.ts[idx])", ts_gather_1row, idx)

    @jax.jit
    def ts_gather_2row(idx):
        big = feats[:2]
        return jax.lax.optimization_barrier(big[:, idx])

    timeit("2-row stacked gather", ts_gather_2row, idx)


if __name__ == "__main__":
    main()
# appended probes: sorted-index gathers


def more():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    C = 1 << 20
    M = 384 * 1024
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(28, C)).astype(np.float32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, C, M)).astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, C, M).astype(np.int32))

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)

    @jax.jit
    def g28(i):
        return jax.lax.optimization_barrier(feats[:, i])

    timeit("gather [28, 384k] sorted idx", g28, idx_sorted)
    timeit("gather [28, 384k] random idx", g28, idx_rand)

    @jax.jit
    def sort_budget(i):
        return jax.lax.sort((i,), num_keys=1)[0]

    timeit("sort 384k idx", sort_budget, idx_rand)


more()
