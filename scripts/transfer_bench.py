"""Host<->device paging microbenchmark.

Counterpart of the reference's pinned-memory gather scaffold
(torch_test.py:1-48): measures (a) host->device transfer bandwidth of a
working set, (b) in-jit host-space gather + DMA (the out-of-core fetch used
by train/offload.py), (c) device-side gather for comparison. Prints one
JSON line per case.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu.train import offload

    n_rows, n_fetch, width = 10_000_000, 5_000_000, 3
    rng = np.random.default_rng(0)
    host_np = rng.normal(size=(n_rows, width)).astype(np.float32)
    idx_np = rng.choice(n_rows, n_fetch, replace=False).astype(np.int32)

    host = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind=offload.host_memory_kind())
    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                            memory_kind="device")

    def timeit(f, *a, n=5):
        o = f(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*a)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n

    gb = n_fetch * width * 4 / 1e9

    # (a) raw host->device of the gathered rows (numpy gather + device_put)
    def numpy_page():
        return jax.device_put(host_np[idx_np], dev)
    dt = timeit(numpy_page, n=3)
    print(json.dumps({"metric": "numpy_gather_h2d", "value": round(gb / dt, 2),
                      "unit": "GB/s"}))

    # (b) in-jit host gather -> device (the offload fetch path)
    xh = jax.device_put(host_np, host)
    ih = jax.device_put(idx_np, host)

    @jax.jit
    def jit_fetch(xh, ih):
        return jax.device_put(xh[ih], dev)
    dt = timeit(jit_fetch, xh, ih)
    print(json.dumps({"metric": "jit_host_gather_fetch",
                      "value": round(gb / dt, 2), "unit": "GB/s"}))

    # (c) device-resident gather
    xd = jax.device_put(host_np, dev)
    idd = jax.device_put(idx_np, dev)

    @jax.jit
    def dev_gather(xd, idd):
        return xd[idd]
    dt = timeit(dev_gather, xd, idd)
    print(json.dumps({"metric": "device_gather", "value": round(gb / dt, 2),
                      "unit": "GB/s"}))


if __name__ == "__main__":
    main()
