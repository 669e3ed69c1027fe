"""Multi-chip training via jax.sharding over a device Mesh.

The reference scales out with process-level SLURM jobs, one chunk per GPU,
synchronized through the filesystem (scripts/full_train.py:79-236). Here
scale-out is ONE jitted SPMD program over a `Mesh`:

  * axis ``data``  — views (cameras) of the current scene are sharded across
    devices; every device renders + differentiates its own view and the
    parameter gradient mean is an XLA `psum` over ICI (the role the
    filesystem merge plays in the reference).
  * axis ``gauss`` — the Gaussian capacity axis is sharded for the
    projection/preprocessing stage (per-Gaussian closed-form math is
    embarrassingly parallel); XLA inserts the all-gather needed before
    binning. For replicated-parameter DP set gauss=1.

Both axes are expressed purely through `NamedSharding` constraints on the
same single-program train step — no NCCL/MPI analog, no SLURM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hlod_gaussians_tpu import optim, render as render_mod
from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import flat


def make_mesh(n_data: int, n_gauss: int = 1,
              devices: Optional[list] = None,
              data_axis: str = "data", gauss_axis: str = "gauss") -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_data * n_gauss]
    arr = mesh_utils.create_device_mesh((n_data, n_gauss),
                                        devices=np.asarray(devices))
    return Mesh(arr, (data_axis, gauss_axis))


def make_mesh_from_config(mcfg, devices: Optional[list] = None) -> Mesh:
    """Mesh from a config.MeshConfig (axis names + shape): the `tile` axis
    doubles as the per-Gaussian shard axis of shard_train_state."""
    return make_mesh(mcfg.data, mcfg.tile, devices=devices,
                     data_axis=mcfg.data_axis, gauss_axis=mcfg.tile_axis)


def shard_train_state(ts: flat.FlatTrainState, mesh: Mesh) -> flat.FlatTrainState:
    """Place the train state on the mesh: per-Gaussian arrays sharded along
    the capacity axis over ``gauss`` (replicated over ``data``); scalars and
    small tensors replicated."""
    cap = ts.gaussians.capacity

    def spec_for(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == cap:
            return NamedSharding(
                mesh, P(mesh.axis_names[1], *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), ts)


@functools.partial(
    jax.jit,
    static_argnames=("opt", "cfg", "width", "height", "k_max", "sh_degree",
                     "use_exposure", "antialiasing"),
    donate_argnames=("ts",))
def dp_train_step(
    ts: flat.FlatTrainState,
    world_view: jnp.ndarray,   # [B,4,4]
    full_proj: jnp.ndarray,    # [B,4,4]
    campos: jnp.ndarray,       # [B,3]
    tan_fovx: jnp.ndarray,     # [B]
    tan_fovy: jnp.ndarray,     # [B]
    gt_images: jnp.ndarray,    # [B,3,H,W]
    bg: jnp.ndarray,           # [3]
    exposure_idx: jnp.ndarray, # [B] int32
    scene_extent: float = 1.0,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 3,
    use_exposure: bool = True,
    antialiasing: bool = False,
    skybox_locked: bool = False,
    scale_big_gauss: bool = True,
    big_gauss_frac: float = 0.02,
) -> Tuple[flat.FlatTrainState, jnp.ndarray]:
    """Data-parallel train step: B views rendered in parallel (sharded over
    the ``data`` mesh axis), gradients averaged across views.

    Returns (new_state, mean loss). Densification stats match a B-step
    sequential loop of the reference (up to Adam's gradient averaging):
    per-view screen-gradient NORMS are summed via a per-view xy_offset
    hook (the norm of the AVERAGED gradient cancels between opposing
    views), max_radii takes the per-view max, and the big-Gaussian shrink
    + skybox gradient locking of flat.train_step apply. Monocular-depth
    regularization is not plumbed through this path.
    """
    g = ts.gaussians
    cap = g.capacity

    def view_loss(params, xy_offset, wv, fp, cp, tfx, tfy, gt, eidx):
        st = g.replace_params(params)
        act = gm.activate(st)
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, wv, fp, cp, tfx, tfy, bg, None, None, xy_offset,
            sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=k_max, antialiasing=antialiasing)
        image = out.image
        if use_exposure:
            image = render_mod.apply_exposure(image, params["exposure"][eidx])
        l1 = jnp.abs(image - gt).mean()
        from hlod_gaussians_tpu.ops import ssim as ssim_ops
        ssim_v = ssim_ops.ssim(image, gt)
        loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
        return loss, (out.visible, out.radii)

    b = world_view.shape[0]

    def batch_loss(params, xy_offset):
        losses, (visible, radii) = jax.vmap(
            view_loss, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))(
                params, xy_offset, world_view, full_proj, campos,
                tan_fovx, tan_fovy, gt_images, exposure_idx)
        return jnp.mean(losses), (visible, radii)

    params = g.params()
    # PER-VIEW screen-space hook [B, cap, 2]: its gradient separates the
    # views, so densify stats use per-view norms (a shared hook would give
    # the norm of the view-averaged gradient, which cancels between views
    # looking at a Gaussian from opposite sides)
    xy_offset = jnp.zeros((b, cap, 2), jnp.float32)
    (loss, (visible_b, radii_b)), (grads, xy_grad) = jax.value_and_grad(
        batch_loss, argnums=(0, 1), has_aux=True)(params, xy_offset)

    visible = jnp.any(visible_b, axis=0)
    # mean-loss gradients are 1/B of the sequential per-step gradients;
    # the reference SUMS per-step norms into xyz_grad_accum
    g2d = jnp.sum(jnp.linalg.norm(xy_grad * b, axis=-1), axis=0)
    xyz_accum = jnp.where(visible, ts.xyz_grad_accum + g2d,
                          ts.xyz_grad_accum)
    denom = ts.denom + jnp.sum(visible_b.astype(jnp.int32), axis=0)
    max_radii = jnp.maximum(ts.max_radii, jnp.max(radii_b, axis=0))

    if skybox_locked:
        sky = g.skybox_mask
        grads = {k: (v if v.shape[:1] != (cap,) else
                     jnp.where(sky.reshape((cap,) + (1,) * (v.ndim - 1)),
                               jnp.zeros_like(v), v))
                 for k, v in grads.items()}

    lrs = optim.param_lrs(opt, ts.step, scene_extent)
    new_params, adam = optim.sparse_adam_update(params, grads, ts.adam, lrs,
                                                visible=visible)
    if scale_big_gauss:
        new_params = flat.shrink_big_gaussians(
            new_params, g, scene_extent, big_gauss_frac)
    new_ts = flat.FlatTrainState(
        gaussians=g.replace_params(new_params), adam=adam,
        xyz_grad_accum=xyz_accum, denom=denom, max_radii=max_radii,
        step=ts.step + 1)
    return new_ts, loss


def batch_sharding(mesh: Mesh):
    """Sharding for per-view batched arrays (leading dim = views)."""
    def f(ndim):
        return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))
    return f
