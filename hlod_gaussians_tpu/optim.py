"""Sparse per-Gaussian Adam + learning-rate schedules.

TPU-native equivalent of the reference's three optimizers:
  * ``OurAdam.Adam.step(relevant)`` — Adam that only updates rows whose
    gradients are nonzero (reference scene/OurAdam.py:106-176),
  * the fused ``SparseGaussianAdam`` CUDA kernel masked by per-Gaussian
    visibility (alt-rasterizer/cuda_rasterizer/adam.cu:9-38),
  * ``_single_tensor_adam2`` with externally-managed moment state used by the
    out-of-core post-training loop (scene/OurAdam.py:357-452).

Here it is one functional transform: a dense masked update. Rows outside the
``visible`` mask keep parameters AND moments untouched (exactly the fused
kernel's semantics); the whole thing is a single fused VPU pass per tensor —
no gather/scatter needed on TPU since the mask select is free relative to the
HBM traffic of touching the moments.

Bias correction uses the global step count, matching the reference (a shared
``step_t`` per tensor, scene/OurAdam.py:137-149).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from hlod_gaussians_tpu.config import OptimizationConfig


class AdamState(NamedTuple):
    m: Dict[str, jnp.ndarray]
    v: Dict[str, jnp.ndarray]
    step: jnp.ndarray  # int32 scalar


def init_adam(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = {k: jnp.zeros_like(p) for k, p in params.items()}
    return AdamState(m=zeros, v={k: jnp.zeros_like(p) for k, p in params.items()},
                     step=jnp.zeros((), jnp.int32))


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-lerp LR schedule with sine delay (reference
    utils/general_utils.py:get_expon_lr_func)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    # frozen parameter (both rates 0, e.g. the coarse stage's xyz): the
    # log-lerp would be exp(log(0)*(1-t) + log(0)*t) = NaN and poison the
    # frozen tensor through Adam — the reference special-cases this to 0
    # (get_expon_lr_func's `if lr_init == lr_final == 0` guard). Rates may
    # be traced (xyz LR scales by scene extent), hence the where-guard.
    frozen = (jnp.asarray(lr_init) == 0.0) & (jnp.asarray(lr_final) == 0.0)
    li = jnp.where(frozen, 1.0, lr_init)
    lf = jnp.where(frozen, 1.0, lr_final)
    log_lerp = jnp.exp(jnp.log(li) * (1 - t) + jnp.log(lf) * t)
    return jnp.where(frozen, 0.0, delay_rate * log_lerp)


def param_lrs(cfg: OptimizationConfig, step, spatial_lr_scale: float,
              lr_multiplier: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Per-tensor learning rates (reference training_setup,
    scene/gaussian_model.py:921-948): xyz scheduled and scaled by scene
    extent; f_rest at feature_lr/20; exposure on its own delayed schedule."""
    xyz_lr = expon_lr(step, cfg.position_lr_init * spatial_lr_scale,
                      cfg.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=cfg.position_lr_delay_mult,
                      max_steps=cfg.position_lr_max_steps)
    exp_lr = expon_lr(step, cfg.exposure_lr_init, cfg.exposure_lr_final,
                      lr_delay_steps=cfg.exposure_lr_delay_steps,
                      lr_delay_mult=cfg.exposure_lr_delay_mult,
                      max_steps=cfg.iterations)
    m = lr_multiplier
    return dict(
        xyz=xyz_lr * m,
        f_dc=jnp.float32(cfg.feature_lr * m),
        f_rest=jnp.float32(cfg.feature_lr / 20.0 * m),
        opacity_logit=jnp.float32(cfg.opacity_lr * m),
        log_scale=jnp.float32(cfg.scaling_lr * m),
        quat=jnp.float32(cfg.rotation_lr * m),
        exposure=exp_lr,
    )


def sparse_adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    visible: Optional[jnp.ndarray] = None,   # [C] bool mask over Gaussian rows
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15,
):
    """One masked Adam step.

    ``visible`` masks rows of every per-Gaussian tensor (leading dim C);
    tensors with a different leading dim (exposure) are updated where their
    gradient is nonzero, mirroring ``OurAdam.step(relevant)``'s
    nonzero-grad row selection (scene/OurAdam.py:117-135).
    """
    step = state.step + 1
    step_f = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** step_f
    bc2 = 1.0 - b2 ** step_f

    new_p, new_m, new_v = {}, {}, {}
    cap = None
    for k in params:
        p, g = params[k], grads[k]
        m0, v0 = state.m[k], state.v[k]
        if visible is not None and p.ndim >= 1 and k != "exposure":
            if cap is None:
                cap = visible.shape[0]
            mask = visible if p.shape[0] == cap else None
        else:
            mask = None
        if mask is None and k == "exposure":
            # rows (images) with any nonzero grad
            row_nz = jnp.any(g != 0.0, axis=tuple(range(1, g.ndim)))
            mask = row_nz
        if mask is not None:
            bshape = (mask.shape[0],) + (1,) * (p.ndim - 1)
            msk = mask.reshape(bshape)
            m1 = jnp.where(msk, b1 * m0 + (1 - b1) * g, m0)
            v1 = jnp.where(msk, b2 * v0 + (1 - b2) * g * g, v0)
            upd = lrs[k] * (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps)
            p1 = jnp.where(msk, p - upd, p)
        else:
            m1 = b1 * m0 + (1 - b1) * g
            v1 = b2 * v0 + (1 - b2) * g * g
            p1 = p - lrs[k] * (m1 / bc1) / (jnp.sqrt(v1 / bc2) + eps)
        new_p[k], new_m[k], new_v[k] = p1, m1, v1
    return new_p, AdamState(m=new_m, v=new_v, step=step)


def zero_rows(state: AdamState, mask: jnp.ndarray, keys=None) -> AdamState:
    """Reset moments of masked rows (used when Gaussians are respawned /
    densified — reference replace_tensors_to_optimizer,
    scene/gaussian_model.py:1531-1553). With ``keys``, only those tensors'
    moments are reset (the reference swaps single tensors — e.g. the
    opacity reset must not erase xyz/SH momentum)."""
    def z(k, t):
        if keys is not None and k not in keys:
            return t
        if t.ndim >= 1 and t.shape[0] == mask.shape[0]:
            return jnp.where(mask.reshape((mask.shape[0],) + (1,) * (t.ndim - 1)),
                             jnp.zeros_like(t), t)
        return t
    return AdamState(m={k: z(k, t) for k, t in state.m.items()},
                     v={k: z(k, t) for k, t in state.v.items()},
                     step=state.step)
