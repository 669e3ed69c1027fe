"""Storage reordering + occlusion culling.

* `sort_morton` — permute the live rows into Morton (Z-curve) order and fix
  every node-table index (reference sort_morton,
  scene/gaussian_model.py:570-601 + morton.cu:8-45): spatially-coherent rows
  make per-view working sets contiguous, which on TPU turns the binning
  gathers into near-sequential HBM reads.
* `occlusion_cull` — render a candidate subset at low resolution with the
  XLA rasterizer and keep the Gaussians that actually contributed (the
  reference renders the upper tree and reads back the `seen` buffer,
  gaussian_renderer/__init__.py:24-33).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu import optim
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.ops import morton


def sort_morton(state: GaussianState, adam: Optional[optim.AdamState] = None
                ) -> Tuple[GaussianState, Optional[optim.AdamState]]:
    """Reorder rows: [skybox | live rows in Morton order | dead rows].

    Node-table indices (parent / first_child / next_sibling) are remapped
    through the permutation. Returns the permuted (state, adam)."""
    cap = state.capacity
    sky = state.n_skybox
    idx = jnp.arange(cap)

    hi_w, lo_w = morton.morton_codes(state.xyz)
    is_sky = idx < sky
    # lexicographic sort keys: (bucket, morton_hi, morton_lo) with bucket
    # 0 = skybox (fixed at the front), 1 = live rows, 2 = dead rows
    bucket = jnp.where(is_sky, 0, jnp.where(state.alive, 1, 2)).astype(jnp.int32)
    hi_k = jnp.where(is_sky, 0, hi_w)
    lo_k = jnp.where(is_sky, jnp.arange(cap, dtype=jnp.uint32), lo_w)
    _, _, _, order = jax.lax.sort(
        (bucket, hi_k, lo_k, jnp.arange(cap, dtype=jnp.int32)), num_keys=3)
    inv = jnp.zeros((cap,), jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))          # old_row -> new_row

    def permute(x):
        return x[order]

    nodes = state.nodes[order]
    # column conventions: parent >= 0 is an index (-1 root sentinel);
    # first_child > 0 is an index (0 / -1 leaf sentinels, and index 0 can
    # never be a child); next_sibling > 0 is an index (0 chain-end sentinel)
    v = nodes[:, gm.NODE_PARENT]
    nodes = nodes.at[:, gm.NODE_PARENT].set(
        jnp.where(v >= 0, inv[jnp.clip(v, 0, cap - 1)], v).astype(jnp.int32))
    for col in (gm.NODE_FIRST_CHILD, gm.NODE_NEXT_SIBLING):
        v = nodes[:, col]
        nodes = nodes.at[:, col].set(
            jnp.where(v > 0, inv[jnp.clip(v, 0, cap - 1)], v).astype(jnp.int32))

    new_state = dataclasses.replace(
        state,
        xyz=permute(state.xyz), f_dc=permute(state.f_dc),
        f_rest=permute(state.f_rest), log_scale=permute(state.log_scale),
        quat=permute(state.quat), opacity_logit=permute(state.opacity_logit),
        alive=permute(state.alive), nodes=nodes)

    new_adam = None
    if adam is not None:
        def permute_rows(t):
            if t.ndim >= 1 and t.shape[0] == cap:
                return t[order]
            return t
        new_adam = optim.AdamState(
            m={k: permute_rows(v) for k, v in adam.m.items()},
            v={k: permute_rows(v) for k, v in adam.v.items()},
            step=adam.step)
    return new_state, new_adam


def occlusion_cull(
    state: GaussianState,
    candidate_mask: jnp.ndarray,
    world_view, full_proj, campos, tan_fovx, tan_fovy,
    *,
    width: int = 256, height: int = 256,
    k_max: int = 512,
) -> jnp.ndarray:
    """[C] bool — candidates that contributed to a low-res render."""
    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig

    act = gm.activate(state, candidate_mask)
    # production Pallas path with exact per-Gaussian seen flags on TPU
    # (forward.cu:568); the XLA scan path computes them natively on CPU
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterizerConfig(backend=backend, tile_w=16, tile_h=16,
                           max_dup=1 << 17)
    out = render_mod.render_arrays(
        act.means3d, act.scales, act.quats, act.opacities, act.shs,
        act.valid, world_view, full_proj, campos, tan_fovx, tan_fovy,
        jnp.zeros(3), sh_degree=state.sh_degree, width=width, height=height,
        cfg=cfg, k_max=k_max, want_seen=True)
    return out.seen & candidate_mask
