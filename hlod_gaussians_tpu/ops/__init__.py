"""Compute ops: spherical harmonics, quaternions, projection, rasterization."""

import jax as _jax
import jax.numpy as _jnp


def gather_rows(tables, idx):
    """Gather several same-length 1-D arrays by a shared index vector with
    ONE stacked [K, N] 2-D gather.

    Separate 1-D gathers lower to a scalarized fusion on TPU (~12x slower
    at millions of indices — see ops/binning.py); gathering along the minor
    axis of a stacked table hits the vectorized path. All tables are cast
    to a common dtype; returns a list of [M] arrays in the input dtypes.
    """
    out = [None] * len(tables)
    # group by 4-byte class to avoid float round-trips of large ints
    groups = {}
    for i, t in enumerate(tables):
        key = "i" if _jnp.issubdtype(t.dtype, _jnp.integer) else "f"
        groups.setdefault(key, []).append(i)
    for key, ids in groups.items():
        dt = _jnp.int32 if key == "i" else _jnp.float32
        stacked = _jnp.stack([tables[i].astype(dt) for i in ids], axis=0)
        g = _jax.lax.optimization_barrier(stacked[:, idx])
        for row, i in enumerate(ids):
            out[i] = g[row].astype(tables[i].dtype)
    return out
