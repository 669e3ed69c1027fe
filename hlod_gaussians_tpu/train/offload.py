"""Out-of-core training: host-resident parameters, device working sets.

The fork's core scaling trick re-designed for TPU: the reference keeps all
50M Gaussians + Adam moments in CPU RAM / np.memmap and pages per-view
working sets over PCIe (move_storage_to, scene/gaussian_model.py:399-492;
the [WRITE-BACK]/[LOAD] phases of train_post.py:440-479). Here the master
arrays live in the TPU runtime's **pinned host memory**
(`memory_kind="pinned_host"`), the per-view SPT cut produces a padded index
set, and ONE jitted program gathers the rows in host space, DMAs only the
working set into HBM, runs render + backward + masked Adam on the compact
arrays, and scatters the updated rows back into host memory — no Python in
the loop, XLA schedules the transfers.

The SPT-cache reuse rule (train_post.py:362-394, Reuse_SPT_Tolerance) is
index arithmetic on the cut between consecutive views and composes on top.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu import optim, render as render_mod
from hlod_gaussians_tpu.config import OptimizationConfig, PostConfig, RasterizerConfig
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.ops import ssim as ssim_ops

_ROW_KEYS = ("xyz", "f_dc", "f_rest", "log_scale", "quat", "opacity_logit")


def host_memory_kind() -> str:
    """'pinned_host' on TPU; the CPU backend has no host memory space (the
    in-jit placement custom call is unregistered there), so tests fall back
    to 'device' — identical semantics, placement becomes a no-op."""
    return "pinned_host" if jax.default_backend() == "tpu" else "device"


def _host_sharding():
    return jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                             memory_kind=host_memory_kind())


def _dev_sharding():
    return jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                             memory_kind="device")


class HostStore(NamedTuple):
    """Pinned-host master storage: parameters + Adam moments, [cap, ...]."""

    params: Dict[str, jnp.ndarray]
    m: Dict[str, jnp.ndarray]
    v: Dict[str, jnp.ndarray]
    step: jnp.ndarray               # device scalar


def to_host_store(state: GaussianState,
                  adam: Optional[optim.AdamState] = None) -> HostStore:
    host = _host_sharding()
    params = {k: jax.device_put(getattr(state, k), host) for k in _ROW_KEYS}
    if adam is None:
        adam = optim.init_adam(state.params())
    m = {k: jax.device_put(adam.m[k], host) for k in _ROW_KEYS}
    v = {k: jax.device_put(adam.v[k], host) for k in _ROW_KEYS}
    return HostStore(params=params, m=m, v=v, step=adam.step)


def from_host_store(store: HostStore, template: GaussianState
                    ) -> Tuple[GaussianState, optim.AdamState]:
    dev = _dev_sharding()
    state = dataclasses.replace(
        template, **{k: jax.device_put(store.params[k], dev)
                     for k in _ROW_KEYS})
    exp = template.exposure
    adam = optim.AdamState(
        m={**{k: jax.device_put(store.m[k], dev) for k in _ROW_KEYS},
           "exposure": jnp.zeros_like(exp)},
        v={**{k: jax.device_put(store.v[k], dev) for k in _ROW_KEYS},
           "exposure": jnp.zeros_like(exp)},
        step=store.step)
    return state, adam


def make_offloaded_step(
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 1,
    antialiasing: bool = False,
    scene_extent: float = 1.0,
):
    """Build the jitted out-of-core step with host-pinned out_shardings
    (jit would otherwise migrate the master arrays back into HBM; donation
    composes only when input/output memory kinds match)."""
    host = _host_sharding()
    dev = _dev_sharding()
    out_shardings = (HostStore(
        params={k: host for k in _ROW_KEYS},
        m={k: host for k in _ROW_KEYS},
        v={k: host for k in _ROW_KEYS},
        step=dev), dev, dev)
    step = jax.jit(
        functools.partial(
            _offloaded_post_step, opt=opt, post=post, cfg=cfg, width=width,
            height=height, k_max=k_max, sh_degree=sh_degree,
            antialiasing=antialiasing, scene_extent=scene_extent),
        out_shardings=out_shardings, donate_argnums=(0,))
    return step


def _offloaded_post_step(
    store: HostStore,
    idx: jnp.ndarray,          # [K] int32 working-set rows (cap = pad)
    idx_valid: jnp.ndarray,    # [K] bool
    world_view, full_proj, campos, tan_fovx, tan_fovy,
    gt_image, bg,
    *,
    opt, post, cfg, width, height, k_max, sh_degree, antialiasing,
    scene_extent,
):
    """One out-of-core step: host-gather rows -> render/optimize the compact
    working set on device -> scatter rows back to host."""
    host = _host_sharding()
    dev = _dev_sharding()
    cap = store.params["xyz"].shape[0]
    idx_c = jnp.clip(idx, 0, cap - 1)
    idx_h = jax.device_put(idx_c, host)

    # [LOAD] host-space gather, DMA only the working set to HBM.
    # promise_in_bounds: indices are pre-clipped on device; XLA's host
    # offload legalizer only supports plain gathers (bounds-check compare
    # ops in host space hard-fail inside host_offload_utils).
    def hgather(x):
        return jax.device_put(x.at[idx_h].get(mode="promise_in_bounds"), dev)

    rows = {k: hgather(store.params[k]) for k in _ROW_KEYS}
    m_rows = {k: hgather(store.m[k]) for k in _ROW_KEYS}
    v_rows = {k: hgather(store.v[k]) for k in _ROW_KEYS}

    def loss_fn(p):
        q = p["quat"] / jnp.linalg.norm(p["quat"], axis=-1,
                                        keepdims=True).clip(1e-12)
        shs = jnp.concatenate([p["f_dc"], p["f_rest"]], axis=1)
        out = render_mod.render_arrays(
            p["xyz"], jnp.exp(p["log_scale"]), q,
            jax.nn.sigmoid(p["opacity_logit"][..., 0]), shs, idx_valid,
            world_view, full_proj, campos, tan_fovx, tan_fovy, bg,
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=k_max, antialiasing=antialiasing)
        image = out.image
        l1 = jnp.abs(image - gt_image).mean()
        ssim_v = ssim_ops.ssim(image, gt_image)
        loss = (1 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1 - ssim_v)
        if post.lambda_opacity > 0:
            n_ws = jnp.maximum(jnp.sum(idx_valid), 1)
            op = jax.nn.sigmoid(p["opacity_logit"][:, 0])
            loss = loss + post.lambda_opacity * jnp.sum(
                jnp.where(idx_valid, jnp.abs(op), 0.0)) / n_ws
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(rows)

    lrs = optim.param_lrs(opt, store.step, scene_extent)
    adam_rows = optim.AdamState(m=m_rows, v=v_rows, step=store.step)
    new_rows, adam2 = optim.sparse_adam_update(
        rows, grads, adam_rows,
        {k: lrs[k] for k in _ROW_KEYS}, visible=out.visible & idx_valid)

    # [WRITE-BACK] scatter the updated rows into the host master copy.
    # Padding lanes all alias clipped row cap-1; writing the ORIGINAL values
    # there keeps the store unchanged for invalid lanes.
    del dev  # outputs are pinned by out_shardings

    def wb(x_host, upd, old):
        v = jnp.where(idx_valid.reshape((-1,) + (1,) * (upd.ndim - 1)),
                      upd, old)
        v_h = jax.device_put(v, host)
        return x_host.at[idx_h].set(v_h, mode="promise_in_bounds")

    new_params = {k: wb(store.params[k], new_rows[k], rows[k])
                  for k in _ROW_KEYS}
    new_m = {k: wb(store.m[k], adam2.m[k], m_rows[k]) for k in _ROW_KEYS}
    new_v = {k: wb(store.v[k], adam2.v[k], v_rows[k]) for k in _ROW_KEYS}

    new_store = HostStore(params=new_params, m=new_m, v=new_v,
                          step=store.step + 1)
    return new_store, loss, jnp.sum(out.visible & idx_valid)


def cut_to_indices(mask: jnp.ndarray, budget: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact a working-set mask into a padded index list."""
    cap = mask.shape[0]
    idx = jnp.nonzero(mask, size=budget, fill_value=cap)[0].astype(jnp.int32)
    return idx, idx < cap


def reuse_diff(prev_idx: jnp.ndarray, prev_dist: jnp.ndarray,
               new_dist: jnp.ndarray, rtol: float):
    """The fork's SPT cache reuse rule (train_post.py:362-394): an SPT's
    resident rows can be kept when its camera distance changed by less than
    `rtol` relative. Returns a bool mask over the previous SPT set."""
    lo = prev_dist * rtol
    hi = prev_dist / jnp.maximum(rtol, 1e-6)
    return (new_dist >= lo) & (new_dist <= hi)
