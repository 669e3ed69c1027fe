"""Microbench: sort-variant cost for the binning pipeline at bench scale.

Variants for the (tile, depth-ordered slot) grouping sort of max_dup
entries:
  A) 1 key + 2 payloads (current: tile_id keys, gid + slot payloads)
  B) packed key (tile<<19 | slot) + 1 payload (gid)
  C) packed key only + post-gather of gid (1-row gather)
"""

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
    nt = 2040
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, nt + 1, md).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 100_000, md).astype(np.int32))
    slot = jnp.arange(md, dtype=jnp.int32)

    def timeit(fn, *a, iters=30):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    @jax.jit
    def sort_a(tile, gid, slot):
        return jax.lax.sort((tile, gid, slot), num_keys=1, is_stable=True)

    ms, _ = timeit(sort_a, tile, gid, slot)
    print(f"A 1key+2payload stable: {ms:6.2f} ms", flush=True)

    @jax.jit
    def sort_b(tile, gid, slot):
        packed = tile * (1 << 19) + slot
        pk, sg = jax.lax.sort((packed, gid), num_keys=1)
        st = pk >> 19
        ss = pk & ((1 << 19) - 1)
        return st, sg, ss

    ms, _ = timeit(sort_b, tile, gid, slot)
    print(f"B packed+1payload:      {ms:6.2f} ms", flush=True)

    @jax.jit
    def sort_c(tile, gid, slot):
        packed = tile * (1 << 19) + slot
        pk = jax.lax.sort(packed)
        st = pk >> 19
        ss = pk & ((1 << 19) - 1)
        sg = jax.lax.optimization_barrier(gid[None][:, ss])[0]
        return st, sg, ss

    ms, _ = timeit(sort_c, tile, gid, slot)
    print(f"C packed+gather:        {ms:6.2f} ms", flush=True)

    @jax.jit
    def sort_d(tile, gid, slot):
        packed = tile * (1 << 19) + slot
        pk = jax.lax.sort(packed)
        st = pk >> 19
        ss = pk & ((1 << 19) - 1)
        return st, ss

    ms, _ = timeit(sort_d, tile, gid, slot)
    print(f"D packed only:          {ms:6.2f} ms", flush=True)

    # align's inverse-permutation sort at the same size
    dst = jnp.asarray(rng.permutation(md).astype(np.int32))

    @jax.jit
    def sort_e(gen, dst):
        return jax.lax.sort((gen, dst), num_keys=1, is_stable=True)

    ms, _ = timeit(sort_e, slot, dst)
    print(f"E inv-perm 1key+1payload: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
