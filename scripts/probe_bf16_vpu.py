"""Measure v5e VPU elementwise throughput: f32 vs bf16 (packed?) and
exp/log1p transcendental cost in both dtypes."""
import functools
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
    from jax.experimental import pallas as pl

    SUB, LANE = 512, 1024       # per-block work: 512x1024 elements
    STEPS = 64                  # sequential grid steps
    REPS = 40                   # fma chain length per element

    def kern(dtype, x_ref, o_ref):
        x = x_ref[...]
        a = x
        for _ in range(REPS):
            a = a * x + x
        o_ref[...] = a

    def kern_exp(dtype, x_ref, o_ref):
        x = x_ref[...]
        a = x
        for _ in range(REPS // 4):
            a = jnp.exp(a * 0.0078125) + x
        o_ref[...] = a

    def run(name, body, dtype):
        x = jnp.asarray(
            np.random.default_rng(0).random((SUB, LANE)), dtype=dtype)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                functools.partial(body, dtype),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), dtype),
                grid=(STEPS,),
                in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0)),
            )(x)

        o = f(x)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 10
        elems = SUB * LANE * STEPS
        print(f"{name}: {dt * 1e3:7.3f} ms  "
              f"({elems * (REPS if body is kern else REPS // 4) / dt / 1e12:.2f} Tops/s)",
              flush=True)

    run("fma-chain f32", kern, jnp.float32)
    run("fma-chain bf16", kern, jnp.bfloat16)
    run("exp-chain f32", kern_exp, jnp.float32)
    run("exp-chain bf16", kern_exp, jnp.bfloat16)


if __name__ == "__main__":
    main()
