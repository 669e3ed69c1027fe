"""Out-of-core training: host-resident parameters, device working sets.

The fork's core scaling trick re-designed for TPU: the reference keeps all
50M Gaussians + Adam moments in CPU RAM / np.memmap and pages per-view
working sets over PCIe (move_storage_to, scene/gaussian_model.py:399-492;
the [WRITE-BACK]/[LOAD] phases of train_post.py:440-479).

Two backends:

* ``numpy`` (default, robust): master arrays in host RAM as numpy; the
  per-view SPT cut indexes a working set, which is `device_put` to HBM,
  optimized by ONE jitted compute program, and written back with numpy
  fancy assignment — the exact paging strategy of the reference, with the
  whole hot path (render, backward, masked Adam) still inside XLA.
* ``pinned_host`` (experimental): master arrays in the TPU runtime's host
  memory space with in-jit host-space gather/scatter. The XLA build in this
  image legalizes only a narrow op set on the host side (scatter bounds
  checks and even plain gather fusions hard-fail in host_offload_utils /
  the CPU thunk emitter), so this path stays opt-in until the toolchain
  catches up.

The SPT-cache reuse rule (train_post.py:362-394, Reuse_SPT_Tolerance) is
index arithmetic on the cut between consecutive views and composes on top.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """Build the out-of-core step as THREE jitted phases — fetch (pure host
    gather + H2D copy), compute (pure device), write-back (pure host
    scatter). XLA's host-offload legalizer only accepts trivially
    gather/scatter-shaped host sections; in a fused program the optimizer
    drags compare/select ops into the host partition and hard-fails
    (host_offload_utils.cc), so the phases stay separate programs."""
    host = _host_sharding()
    dev = _dev_sharding()
    host_rows = {k: host for k in _ROW_KEYS}
    dev_rows = {k: dev for k in _ROW_KEYS}

    @functools.partial(jax.jit, out_shardings=(dev_rows,) * 3)
    def fetch(store, idx_h):
        def hg(x):
            return jax.device_put(x.at[idx_h].get(mode="promise_in_bounds"),
                                  dev)
        return ({k: hg(store.params[k]) for k in _ROW_KEYS},
                {k: hg(store.m[k]) for k in _ROW_KEYS},
                {k: hg(store.v[k]) for k in _ROW_KEYS})

    compute = jax.jit(functools.partial(
        _compute_phase, opt=opt, post=post, cfg=cfg, width=width,
        height=height, k_max=k_max, sh_degree=sh_degree,
        antialiasing=antialiasing, scene_extent=scene_extent))

    @functools.partial(
        jax.jit,
        out_shardings=HostStore(params=host_rows, m=host_rows, v=host_rows,
                                step=dev),
        donate_argnums=(0,))
    def writeback(store, idx_h, new_p, new_m, new_v):
        def ws(x_host, v):
            v_h = jax.device_put(v, host)
            return x_host.at[idx_h].set(v_h, mode="promise_in_bounds")
        return HostStore(
            params={k: ws(store.params[k], new_p[k]) for k in _ROW_KEYS},
            m={k: ws(store.m[k], new_m[k]) for k in _ROW_KEYS},
            v={k: ws(store.v[k], new_v[k]) for k in _ROW_KEYS},
            step=store.step + 1)

    def step(store, idx, idx_valid, world_view, full_proj, campos,
             tan_fovx, tan_fovy, gt_image, bg):
        cap = store.params["xyz"].shape[0]
        idx_h = jax.device_put(jnp.clip(idx, 0, cap - 1), host)
        rows, m_rows, v_rows = fetch(store, idx_h)
        new_p, new_m, new_v, loss, n_vis = compute(
            rows, m_rows, v_rows, store.step, idx_valid, world_view,
            full_proj, campos, tan_fovx, tan_fovy, gt_image, bg)
        store2 = writeback(store, idx_h, new_p, new_m, new_v)
        return store2, loss, n_vis

    return step


def _compute_phase(
    rows, m_rows, v_rows, step_count,
    idx_valid: jnp.ndarray,    # [K] bool
    world_view, full_proj, campos, tan_fovx, tan_fovy,
    gt_image, bg,
    *,
    opt, post, cfg, width, height, k_max, sh_degree, antialiasing,
    scene_extent,
):
    """Device-only phase: render + backward + masked Adam on compact rows."""

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

    lrs = optim.param_lrs(opt, step_count, scene_extent)
    adam_rows = optim.AdamState(m=m_rows, v=v_rows, step=step_count)
    new_rows, adam2 = optim.sparse_adam_update(
        rows, grads, adam_rows,
        {k: lrs[k] for k in _ROW_KEYS}, visible=out.visible & idx_valid)

    # padding lanes all alias clipped row cap-1: keep their ORIGINAL values
    # so the host scatter leaves the store unchanged there
    def keep_valid(upd, old):
        m = idx_valid.reshape((-1,) + (1,) * (upd.ndim - 1))
        return jnp.where(m, upd, old)

    new_p = {k: keep_valid(new_rows[k], rows[k]) for k in _ROW_KEYS}
    new_m = {k: keep_valid(adam2.m[k], m_rows[k]) for k in _ROW_KEYS}
    new_v = {k: keep_valid(adam2.v[k], v_rows[k]) for k in _ROW_KEYS}
    return new_p, new_m, new_v, loss, jnp.sum(out.visible & idx_valid)


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


class NumpyStore:
    """Mutable numpy master storage (the default out-of-core backend)."""

    def __init__(self, params: Dict[str, np.ndarray],
                 m: Dict[str, np.ndarray], v: Dict[str, np.ndarray],
                 step: int = 0):
        self.params = params
        self.m = m
        self.v = v
        self.step = step

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]


def to_numpy_store(state: GaussianState,
                   adam: Optional[optim.AdamState] = None) -> NumpyStore:
    params = {k: np.array(getattr(state, k)) for k in _ROW_KEYS}
    if adam is None:
        zeros = {k: np.zeros_like(params[k]) for k in _ROW_KEYS}
        return NumpyStore(params, zeros,
                          {k: np.zeros_like(params[k]) for k in _ROW_KEYS})
    m = {k: np.array(adam.m[k]) for k in _ROW_KEYS}
    v = {k: np.array(adam.v[k]) for k in _ROW_KEYS}
    return NumpyStore(params, m, v, step=int(adam.step))


def make_numpy_offloaded_step(
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 1,
    antialiasing: bool = False,
    scene_extent: float = 1.0,
):
    """Out-of-core step over a NumpyStore: numpy gather -> jitted device
    compute -> numpy write-back (the reference's paging loop,
    train_post.py:440-479, with the compute fully fused in XLA)."""
    compute = jax.jit(functools.partial(
        _compute_phase, opt=opt, post=post, cfg=cfg, width=width,
        height=height, k_max=k_max, sh_degree=sh_degree,
        antialiasing=antialiasing, scene_extent=scene_extent))

    def step(store: NumpyStore, idx_np: np.ndarray, world_view, full_proj,
             campos, tan_fovx, tan_fovy, gt_image, bg):
        k_budget = idx_np.shape[0]
        valid_np = idx_np < store.capacity
        idx_c = np.minimum(idx_np, store.capacity - 1)

        rows = {k: jnp.asarray(store.params[k][idx_c]) for k in _ROW_KEYS}
        m_rows = {k: jnp.asarray(store.m[k][idx_c]) for k in _ROW_KEYS}
        v_rows = {k: jnp.asarray(store.v[k][idx_c]) for k in _ROW_KEYS}

        new_p, new_m, new_v, loss, n_vis = compute(
            rows, m_rows, v_rows, jnp.int32(store.step),
            jnp.asarray(valid_np), world_view, full_proj, campos,
            tan_fovx, tan_fovy, gt_image, bg)

        wb = idx_c[valid_np]
        for k in _ROW_KEYS:
            store.params[k][wb] = np.asarray(new_p[k])[valid_np]
            store.m[k][wb] = np.asarray(new_m[k])[valid_np]
            store.v[k][wb] = np.asarray(new_v[k])[valid_np]
        store.step += 1
        return loss, n_vis

    return step
