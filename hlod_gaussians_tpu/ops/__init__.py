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
    # BITCAST every 4-byte row to one shared i32 table: mixed-dtype inputs
    # must still produce a SINGLE stacked gather (two single-row gathers
    # scalarize — measured 25 ms vs 2.5 ms for [2, 1M])
    def enc(t):
        if _jnp.issubdtype(t.dtype, _jnp.integer):
            return t.astype(_jnp.int32)
        if t.dtype == _jnp.bool_:
            return t.astype(_jnp.int32)
        return _jax.lax.bitcast_convert_type(
            t.astype(_jnp.float32), _jnp.int32)

    def dec(row, t):
        if _jnp.issubdtype(t.dtype, _jnp.integer):
            return row.astype(t.dtype)
        if t.dtype == _jnp.bool_:
            return row.astype(t.dtype)
        return _jax.lax.bitcast_convert_type(row, _jnp.float32).astype(
            t.dtype)

    stacked = _jnp.stack([enc(t) for t in tables], axis=0)
    g = _jax.lax.optimization_barrier(stacked[:, idx])
    return [dec(g[row], t) for row, t in enumerate(tables)]
