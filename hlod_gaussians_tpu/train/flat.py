"""Flat 3DGS training: the canonical per-chunk train step.

TPU-native re-design of the reference's ``train_single.py::training`` loop
(train_single.py:28-192) and the hierarchy-aware densification of
``scene/gaussian_model.py:1348-1530``. The whole step — render, loss,
backward, stats accumulation, masked Adam, scale clamp — is ONE jitted
function over the capacity-padded :class:`GaussianState`. Densification is a
second jitted function that writes new children into free capacity slots
(XLA scatter with dropped out-of-bounds rows) instead of growing tensors.

Loss (train_single.py:106-117):
    (1-lambda_dssim) * L1 + lambda_dssim * (1 - SSIM)
    + depth_l1_weight(iter) * mean|invdepth - mono_invdepth| * depth_mask

Densify condition (fork variant, scene/gaussian_model.py:1452-1470):
    |grad_2d| * max_radii2D * opacity^(1/5) >= threshold
    AND opacity > 0.15 AND leaf (child_count == 0) AND not skybox/scaffold.
Selected leaves get TWO children (same position, scale and opacity divided
by 0.8*N with N=2); the parent stays alive (it becomes an interior node).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hlod_gaussians_tpu import optim, render as render_mod
from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.ops import ssim as ssim_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatTrainState:
    gaussians: GaussianState
    adam: optim.AdamState
    xyz_grad_accum: jnp.ndarray   # [C] running max of screen-space grad norms
    denom: jnp.ndarray            # [C] int32 visibility counts
    max_radii: jnp.ndarray        # [C] float32 max screen radius since last densify
    step: jnp.ndarray             # int32 scalar


def init_flat_train(state: GaussianState) -> FlatTrainState:
    c = state.capacity
    return FlatTrainState(
        gaussians=state,
        adam=optim.init_adam(state.params()),
        xyz_grad_accum=jnp.zeros((c,), jnp.float32),
        denom=jnp.zeros((c,), jnp.int32),
        max_radii=jnp.zeros((c,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    ssim: jnp.ndarray
    depth_l1: jnp.ndarray
    image: jnp.ndarray
    n_visible: jnp.ndarray
    truncated: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("opt", "cfg", "width", "height", "k_max", "sh_degree",
                     "use_exposure", "skybox_locked", "antialiasing",
                     "scale_big_gauss", "big_gauss_frac"),
    donate_argnames=("ts",))
def train_step(
    ts: FlatTrainState,
    world_view: jnp.ndarray, full_proj: jnp.ndarray, campos: jnp.ndarray,
    tan_fovx, tan_fovy,
    gt_image: jnp.ndarray,                 # [3,H,W]
    bg: jnp.ndarray,                       # [3]
    alpha_mask: Optional[jnp.ndarray] = None,     # [1,H,W] or None
    mono_invdepth: Optional[jnp.ndarray] = None,  # [H,W] or None
    depth_mask: Optional[jnp.ndarray] = None,     # [H,W] or None
    exposure_idx: jnp.ndarray = None,      # int32 scalar
    scene_extent: float = 1.0,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 3,
    use_exposure: bool = True,
    skybox_locked: bool = False,
    antialiasing: bool = False,
    scale_big_gauss: bool = True,
    big_gauss_frac: float = 0.02,
) -> Tuple[FlatTrainState, StepAux]:
    """One fused optimization step on a single view."""
    g = ts.gaussians
    cap = g.capacity

    depth_w = optim.expon_lr(ts.step, opt.depth_l1_weight_init,
                             opt.depth_l1_weight_final,
                             max_steps=opt.iterations)

    def loss_fn(params, xy_offset):
        st = g.replace_params(params)
        act = gm.activate(st)
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, world_view, full_proj, campos, tan_fovx, tan_fovy,
            bg, None, None, xy_offset,
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=k_max, antialiasing=antialiasing)
        image = out.image
        if use_exposure and exposure_idx is not None:
            image = render_mod.apply_exposure(image, params["exposure"][exposure_idx])
        if alpha_mask is not None:
            image = image * alpha_mask
        l1 = jnp.abs(image - gt_image).mean()
        ssim_v = ssim_ops.ssim(image, gt_image)
        photo = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
        if mono_invdepth is not None:
            dmask = depth_mask if depth_mask is not None else 1.0
            depth_l1 = jnp.abs((out.invdepth - mono_invdepth) * dmask).mean()
        else:
            depth_l1 = jnp.zeros(())
        loss = photo + depth_w * depth_l1
        return loss, (out, image, l1, ssim_v, depth_l1)

    params = g.params()
    xy_offset = jnp.zeros((cap, 2), jnp.float32)
    (loss, (out, image, l1, ssim_v, depth_l1)), (grads, xy_grad) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params, xy_offset))

    if skybox_locked:
        sky = g.skybox_mask
        for k in ("xyz", "quat", "f_dc", "f_rest", "opacity_logit", "log_scale"):
            gk = grads[k]
            grads[k] = jnp.where(sky.reshape((cap,) + (1,) * (gk.ndim - 1)),
                                 0.0, gk)

    # densification stats (scene/gaussian_model.py:1522-1530): running MAX of
    # screen-space gradient norms over visible rows; radii tracked likewise.
    visible = out.visible
    g2d = jnp.linalg.norm(xy_grad, axis=-1)
    xyz_accum = jnp.where(visible, jnp.maximum(ts.xyz_grad_accum, g2d),
                          ts.xyz_grad_accum)
    denom = ts.denom + visible.astype(jnp.int32)
    max_radii = jnp.where(visible,
                          jnp.maximum(ts.max_radii, out.radii.astype(jnp.float32)),
                          ts.max_radii)

    lrs = optim.param_lrs(opt, ts.step, scene_extent)
    new_params, adam = optim.sparse_adam_update(params, grads, ts.adam, lrs,
                                                visible=visible)

    # big-Gaussian shrink (train_single.py:180-186): scales over
    if scale_big_gauss:
        new_params = shrink_big_gaussians(new_params, g, scene_extent,
                                          big_gauss_frac)

    new_ts = FlatTrainState(
        gaussians=g.replace_params(new_params),
        adam=adam,
        xyz_grad_accum=xyz_accum, denom=denom, max_radii=max_radii,
        step=ts.step + 1)
    aux = StepAux(loss=loss, l1=l1, ssim=ssim_v, depth_l1=depth_l1, image=image,
                  n_visible=jnp.sum(visible), truncated=out.truncated)
    return new_ts, aux


@functools.partial(jax.jit, static_argnames=("opt", "mode"),
                   donate_argnames=("ts",))
def densify_step(ts: FlatTrainState, scene_extent,
                 *, opt: OptimizationConfig = OptimizationConfig(),
                 mode: str = "split",
                 ) -> Tuple[FlatTrainState, jnp.ndarray]:
    """Hierarchy-aware densification: each selected leaf gains two children
    written into free capacity slots.

    mode="split" divides the children's scale and opacity by 0.8*N
    (reference densify, gaussian_model.py:1452-1503); mode="clone" copies
    them unchanged (densify_and_clone, gaussian_model.py:1404-1449).
    Returns (new_state, number_of_densified_leaves).
    """
    g = ts.gaussians
    cap = g.capacity
    opacity = jax.nn.sigmoid(g.opacity_logit[:, 0])

    score = ts.xyz_grad_accum * ts.max_radii * jnp.power(opacity, 0.2)
    sel = (score >= opt.densify_grad_threshold) & (opacity > 0.15)
    sel = sel & g.alive & (~g.protected_mask)
    sel = sel & (g.nodes[:, gm.NODE_CHILD_COUNT] <= 0)

    free = ~g.alive
    n_free = jnp.sum(free)
    free_idx = jnp.nonzero(free, size=cap, fill_value=cap)[0].astype(jnp.int32)

    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1           # rank among selected
    can = sel & (2 * rank + 1 < n_free)
    c0 = jnp.where(can, free_idx[jnp.clip(2 * rank, 0, cap - 1)], cap)
    c1 = jnp.where(can, free_idx[jnp.clip(2 * rank + 1, 0, cap - 1)], cap)

    # child parameters: same xyz/features/rotation; split divides scale &
    # opacity by 0.8*N, clone copies verbatim
    if mode == "split":
        inv08n = 1.0 / (0.8 * 2.0)
        child_ls = g.log_scale + jnp.log(inv08n)
        child_op = gm.inverse_sigmoid(
            jnp.clip(opacity * inv08n, 1e-6, 1 - 1e-6))[:, None]
    elif mode == "clone":
        child_ls = g.log_scale
        child_op = g.opacity_logit
    else:
        raise ValueError(mode)

    def scatter2(dst, src):
        return dst.at[c0].set(src, mode="drop").at[c1].set(src, mode="drop")

    xyz = scatter2(g.xyz, g.xyz)
    f_dc = scatter2(g.f_dc, g.f_dc)
    f_rest = scatter2(g.f_rest, g.f_rest)
    quat = scatter2(g.quat, g.quat)
    log_scale = scatter2(g.log_scale, child_ls)
    op_logit = scatter2(g.opacity_logit, child_op)
    alive = g.alive.at[c0].set(True, mode="drop").at[c1].set(True, mode="drop")

    parent_idx = jnp.arange(cap, dtype=jnp.int32)
    depth1 = g.nodes[:, gm.NODE_DEPTH] + 1
    node_c0 = jnp.stack([depth1, parent_idx, jnp.zeros_like(depth1),
                         jnp.full_like(depth1, -1), c1.astype(jnp.int32),
                         jnp.zeros_like(depth1)], axis=-1)
    node_c1 = jnp.stack([depth1, parent_idx, jnp.zeros_like(depth1),
                         jnp.full_like(depth1, -1), jnp.zeros_like(depth1),
                         jnp.zeros_like(depth1)], axis=-1)
    nodes = g.nodes.at[c0].set(node_c0, mode="drop").at[c1].set(node_c1, mode="drop")
    # parent becomes interior
    nodes = jnp.where(can[:, None],
                      nodes.at[:, gm.NODE_CHILD_COUNT].set(2)
                           .at[:, gm.NODE_FIRST_CHILD].set(c0.astype(jnp.int32)),
                      nodes)

    new_g = dataclasses.replace(
        g, xyz=xyz, f_dc=f_dc, f_rest=f_rest, quat=quat, log_scale=log_scale,
        opacity_logit=op_logit, alive=alive, nodes=nodes)

    # fresh Adam moments for the new rows
    new_mask = jnp.zeros((cap,), bool).at[c0].set(True, mode="drop") \
                                      .at[c1].set(True, mode="drop")
    adam = optim.zero_rows(ts.adam, new_mask)

    new_ts = FlatTrainState(
        gaussians=new_g, adam=adam,
        xyz_grad_accum=jnp.zeros_like(ts.xyz_grad_accum),
        denom=jnp.zeros_like(ts.denom),
        max_radii=jnp.zeros_like(ts.max_radii),
        step=ts.step)
    return new_ts, jnp.sum(can)


@jax.jit
def shrink_big_gaussians(new_params, g, scene_extent, big_gauss_frac):
    """Gaussians above big_gauss_frac of the scene extent shrink by 0.8
    each step (2% for chunk training, 10% for the coarse scaffold,
    train_coarse.py:168-172); skybox and scaffold rows excluded
    (train_single.py:184-185)."""
    ls = new_params["log_scale"]
    viol = (jnp.max(ls, axis=-1)
            > jnp.log(scene_extent * big_gauss_frac)) & g.alive
    viol = viol & (~g.protected_mask)
    ls = jnp.where(viol[:, None], ls + jnp.log(0.8), ls)
    return dict(new_params, log_scale=ls)


def reset_opacity(ts: FlatTrainState) -> FlatTrainState:
    """Clamp opacity to <= 0.01 for non-skybox rows (reference
    reset_opacity, scene/gaussian_model.py:1214-1218)."""
    g = ts.gaussians
    op = jax.nn.sigmoid(g.opacity_logit)
    new_logit = gm.inverse_sigmoid(jnp.minimum(op, 0.01))
    sky = g.skybox_mask[:, None]
    logit = jnp.where(sky, g.opacity_logit, new_logit)
    # the reference swaps ONLY the opacity tensor in the optimizer,
    # resetting its moments — the other tensors keep their momentum
    # (replace_tensor_to_optimizer, scene/gaussian_model.py:1214-1218)
    adam = optim.zero_rows(ts.adam, ~g.skybox_mask,
                           keys=("opacity_logit",))
    return dataclasses.replace(
        ts, gaussians=dataclasses.replace(g, opacity_logit=logit), adam=adam)
