"""Hierarchy post-optimization: LOD-aware training on the full tree.

TPU re-design of the fork's core loop (reference train_post.py:112-886):
per step, an SPT working-set cut selects the granularity-appropriate subset
of the tree for the current view; only those rows are rendered and
optimized. On the reference GPU this drives CPU<->GPU paging; on TPU the
full capacity-padded state stays in HBM and the cut is a boolean mask — the
projection math over dead/unselected rows is masked out and costs one fused
VPU pass, while binning/blending only ever see the selected rows.

Loss (train_post.py:558-576):
    L1 + lambda_dssim * (1 - SSIM)
    + lambda_opacity * mean|sigmoid(opacity)|   (over the working set)
    + lambda_scaling * mean|exp(scale)|

Densification rounds (train_post.py:707-788): add_new_gs growth toward
cap_max, then relocate_gs of dead leaves, then SPT rebuild — see
hierarchy/mcmc.py and hierarchy/spt.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import optim, render as render_mod
from hlod_gaussians_tpu.config import OptimizationConfig, PostConfig, RasterizerConfig
from hlod_gaussians_tpu.data import dhier as dhier_io
from hlod_gaussians_tpu.hierarchy import mcmc, spt as spt_mod
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.ops import ssim as ssim_ops


def create_from_dhier(
    d: dhier_io.DHier,
    capacity: int,
    skybox_num: int = 0,
    scene_radius: float = 1.0,
    n_exposures: int = 1,
    opacity_is_activated: bool = True,
) -> GaussianState:
    """Load a .dhier into a capacity-padded state, prepending the skybox and
    shifting the node table (reference create_from_hier,
    scene/gaussian_model.py:990-1095). ``opacity_is_activated`` mirrors the
    reference's .dhier convention of storing activated opacities
    (create_from_hier applies inverse_sigmoid on load)."""
    g = d.pos.shape[0]
    total = g + skybox_num
    if total > capacity:
        raise ValueError(f"capacity {capacity} < {g} + skybox {skybox_num}")
    state = gm.empty_state(capacity, d.sh_degree, n_exposures,
                           n_skybox=skybox_num)

    if skybox_num > 0:
        sky_pos, sky_col = gm.make_skybox(skybox_num, 10.0 * scene_radius)
        from hlod_gaussians_tpu.ops import sh as sh_ops
        state = dataclasses.replace(
            state,
            xyz=state.xyz.at[:skybox_num].set(jnp.asarray(sky_pos)),
            f_dc=state.f_dc.at[:skybox_num].set(
                sh_ops.rgb_to_sh(jnp.asarray(sky_col))[:, None, :]),
            opacity_logit=state.opacity_logit.at[:skybox_num].set(
                gm.inverse_sigmoid(jnp.float32(0.7))),
            log_scale=state.log_scale.at[:skybox_num].set(
                jnp.log(jnp.float32(scene_radius * 0.1))),
        )
        # skybox rows are flagged depth=-1 (skipped by cuts, reference
        # markNodesForSizeDynamic runtime_switching.cu:560-563)
        sky_nodes = jnp.tile(
            jnp.asarray([[-1, -1, 0, -1, 0, 0]], jnp.int32), (skybox_num, 1))
        state = dataclasses.replace(
            state, nodes=state.nodes.at[:skybox_num].set(sky_nodes))

    op = d.opacity
    if opacity_is_activated:
        op_logit = np.log(np.clip(op, 1e-6, 1 - 1e-6)
                          / (1.0 - np.clip(op, 1e-6, 1 - 1e-6)))
    else:
        op_logit = op

    nodes = d.nodes.copy()
    # shift child/parent/sibling indices by the skybox offset
    for col in (gm.NODE_PARENT, gm.NODE_FIRST_CHILD, gm.NODE_NEXT_SIBLING):
        pos_mask = nodes[:, col] > 0
        nodes[:, col] = np.where(pos_mask, nodes[:, col] + skybox_num,
                                 nodes[:, col])
    # parent == 0 means root's parent (-1 stays); first_child == 0 leaf stays
    root_like = d.nodes[:, gm.NODE_PARENT] == 0
    nodes[root_like, gm.NODE_PARENT] = skybox_num

    sl = slice(skybox_num, total)
    k = d.shs.shape[1]
    state = dataclasses.replace(
        state,
        xyz=state.xyz.at[sl].set(jnp.asarray(d.pos)),
        quat=state.quat.at[sl].set(jnp.asarray(d.quat)),
        log_scale=state.log_scale.at[sl].set(jnp.asarray(d.log_scale)),
        opacity_logit=state.opacity_logit.at[sl].set(
            jnp.asarray(op_logit)[:, None]),
        f_dc=state.f_dc.at[sl].set(jnp.asarray(d.shs[:, :1])),
        f_rest=state.f_rest.at[sl, :k - 1].set(jnp.asarray(d.shs[:, 1:])),
        nodes=state.nodes.at[sl].set(jnp.asarray(nodes)),
        alive=state.alive.at[:total].set(True),
    )
    return state


def state_to_dhier(state: GaussianState) -> dhier_io.DHier:
    """Export the non-skybox rows back to a .dhier (reference save_hier,
    scene/gaussian_model.py:1115-1124)."""
    alive = np.asarray(state.alive)
    sky = state.n_skybox
    rows = np.where(alive)[0]
    rows = rows[rows >= sky]
    remap = np.full(state.capacity, -1, np.int64)
    remap[rows] = np.arange(len(rows))

    nodes = np.asarray(state.nodes)[rows].copy()
    for col in (gm.NODE_PARENT, gm.NODE_FIRST_CHILD, gm.NODE_NEXT_SIBLING):
        v = nodes[:, col]
        nodes[:, col] = np.where(v >= sky, remap[np.clip(v, 0, state.capacity - 1)],
                                 np.minimum(v, 0))
    shs = np.concatenate([np.asarray(state.f_dc)[rows],
                          np.asarray(state.f_rest)[rows]], axis=1)
    op = 1.0 / (1.0 + np.exp(-np.asarray(state.opacity_logit)[rows, 0]))
    return dhier_io.DHier(
        sh_degree=state.sh_degree,
        pos=np.asarray(state.xyz)[rows],
        quat=np.asarray(state.quat)[rows],
        log_scale=np.asarray(state.log_scale)[rows],
        opacity=op.astype(np.float32),
        shs=shs.astype(np.float32),
        nodes=nodes.astype(np.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PostTrainState:
    gaussians: GaussianState
    adam: optim.AdamState
    step: jnp.ndarray


def init_post_train(state: GaussianState) -> PostTrainState:
    return PostTrainState(gaussians=state, adam=optim.init_adam(state.params()),
                          step=jnp.zeros((), jnp.int32))


class PostAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    ssim: jnp.ndarray
    n_rendered: jnp.ndarray
    image: jnp.ndarray
    truncated: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("opt", "post", "cfg", "width", "height", "k_max",
                     "sh_degree", "antialiasing"),
    donate_argnames=("ts",))
def post_train_step(
    ts: PostTrainState,
    cut_mask: jnp.ndarray,            # [C] bool working set for this view
    world_view, full_proj, campos, tan_fovx, tan_fovy,
    gt_image: jnp.ndarray,
    bg: jnp.ndarray,
    scene_extent: float = 1.0,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 1,
    antialiasing: bool = True,
) -> Tuple[PostTrainState, PostAux]:
    """One post-optimization step over the masked working set
    (train_post.py:495-620 + 790-818)."""
    g = ts.gaussians
    render_mask = cut_mask | g.skybox_mask

    def loss_fn(params):
        st = g.replace_params(params)
        act = gm.activate(st, render_mask)
        out = render_mod.render_arrays(
            act.means3d, act.scales, act.quats, act.opacities, act.shs,
            act.valid, world_view, full_proj, campos, tan_fovx, tan_fovy,
            bg, sh_degree=sh_degree, width=width, height=height, cfg=cfg,
            k_max=k_max, antialiasing=antialiasing)
        image = out.image
        l1 = jnp.abs(image - gt_image).mean()
        ssim_v = ssim_ops.ssim(image, gt_image)
        loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
        # MCMC regularizers over the working set (train_post.py:565-576)
        ws = cut_mask & g.alive
        n_ws = jnp.maximum(jnp.sum(ws), 1)
        if post.lambda_opacity > 0:
            op = jax.nn.sigmoid(params["opacity_logit"][:, 0])
            loss = loss + post.lambda_opacity * jnp.sum(
                jnp.where(ws, jnp.abs(op), 0.0)) / n_ws
        if post.lambda_scaling > 0:
            sc = jnp.exp(params["log_scale"])
            loss = loss + post.lambda_scaling * jnp.sum(
                jnp.where(ws[:, None], jnp.abs(sc), 0.0)) / n_ws
        return loss, (out, image, l1, ssim_v)

    params = g.params()
    (loss, (out, image, l1, ssim_v)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    # skybox rows train color/opacity but not geometry (train_post.py:790-800)
    sky = g.skybox_mask
    cap = g.capacity
    for k in ("xyz", "quat", "log_scale"):
        gk = grads[k]
        grads[k] = jnp.where(sky.reshape((cap,) + (1,) * (gk.ndim - 1)), 0.0, gk)

    lrs = optim.param_lrs(opt, ts.step, scene_extent,
                          lr_multiplier=post.lr_multiplier)
    visible = out.visible
    new_params, adam = optim.sparse_adam_update(params, grads, ts.adam, lrs,
                                                visible=visible)

    if post.mcmc_noise_lr > 0:
        # covariance-shaped exploration noise on low-opacity working-set
        # rows (3DGS-as-MCMC; reference train_post.py:869-885):
        #   noise = Sigma @ randn * sigmoid(-100*(opacity - 0.995)) * lr
        from hlod_gaussians_tpu.ops import gaussian_math, quaternion
        key = jax.random.fold_in(jax.random.PRNGKey(0), ts.step)
        op = jax.nn.sigmoid(new_params["opacity_logit"][:, 0])
        gate = jax.nn.sigmoid(-100.0 * (op - 0.995))
        eps = jax.random.normal(key, new_params["xyz"].shape)
        cov = gaussian_math.unpack_cov3d(gaussian_math.compute_cov3d(
            jnp.exp(new_params["log_scale"]),
            quaternion.normalize(new_params["quat"])))
        shaped = jnp.einsum("nij,nj->ni", cov, eps)
        mask = (visible & (~sky))[:, None]
        new_params = dict(new_params, xyz=new_params["xyz"] + jnp.where(
            mask, shaped * gate[:, None] * post.mcmc_noise_lr * lrs["xyz"],
            0.0))

    new_ts = PostTrainState(gaussians=g.replace_params(new_params), adam=adam,
                            step=ts.step + 1)
    aux = PostAux(loss=loss, l1=l1, ssim=ssim_v,
                  n_rendered=jnp.sum(visible), image=image,
                  truncated=out.truncated)
    return new_ts, aux


def densify_round(
    ts: PostTrainState,
    key: jax.Array,
    *,
    post: PostConfig = PostConfig(),
    budget: int = 4096,
    max_depth: int = 40,
    extra_dead=None,
) -> Tuple[PostTrainState, dict]:
    """Grow + relocate, as the reference does every densify_interval
    (train_post.py:707-788): add_new_gs toward cap_max (5% growth), then
    relocate dead leaves. ``extra_dead`` feeds the MIP respawn of
    never-visible SPT entries (spt.mip_respawn_mask)."""
    if not post.mcmc_densification:
        # reference train_post runs NO densification without the MCMC flag
        # (every grow/relocate site is inside `if MCMC_Densification`)
        return ts, dict(n_added_pairs=0, n_relocated=0,
                        size=jnp.sum(ts.gaussians.alive))
    g = ts.gaussians
    k1, k2 = jax.random.split(key)
    size = jnp.sum(g.alive)
    target = jnp.minimum(post.max_cap,
                         (size.astype(jnp.float32) * (1.0 + post.grow_fraction)
                          ).astype(jnp.int32))
    n_new = jnp.maximum(target - size, 0)

    # The MCMC jits never touch the exposure table, but it sits in the
    # state/Adam pytrees — and its leading dim is the PER-CHUNK view count,
    # so passing it through retriggers a full relocate/add compile for
    # every chunk (~60 s each through the remote compile service; this was
    # 1117 s of the 1682 s PIPELINE_r04 wall). Swap in a fixed-shape dummy
    # for the call and splice the real table back afterwards.
    import dataclasses as _dc
    exp_real, exp_m, exp_v = g.exposure, ts.adam.m["exposure"], \
        ts.adam.v["exposure"]
    # three DISTINCT dummies: the mcmc jits donate their inputs, and one
    # buffer aliased into several donated slots is a donation error
    def _dummy():
        return jnp.zeros((1,) + exp_real.shape[1:], exp_real.dtype)

    g = _dc.replace(g, exposure=_dummy())
    adam = ts.adam._replace(m=dict(ts.adam.m, exposure=_dummy()),
                            v=dict(ts.adam.v, exposure=_dummy()))

    g2, adam2, n_pairs = mcmc.add_new_gs(g, adam, k1, n_new, budget=budget)
    g3, adam3, n_reloc = mcmc.relocate_gs(
        g2, adam2, k2, post.dead_opacity, budget=budget, max_depth=max_depth,
        extra_dead=extra_dead)

    g3 = _dc.replace(g3, exposure=exp_real)
    adam3 = adam3._replace(m=dict(adam3.m, exposure=exp_m),
                           v=dict(adam3.v, exposure=exp_v))
    stats = dict(n_added_pairs=n_pairs, n_relocated=n_reloc,
                 size=jnp.sum(g3.alive))
    return PostTrainState(gaussians=g3, adam=adam3, step=ts.step), stats


def rebuild_spt(state: GaussianState, *, post: PostConfig = PostConfig(),
                max_depth: int = 64) -> spt_mod.SPTForest:
    """(Re)build the SPT forest from the current state (host-side sweep)."""
    alive = np.asarray(state.alive)
    sky = state.n_skybox
    nodes = np.asarray(state.nodes)
    root_candidates = np.where(alive & (nodes[:, gm.NODE_PARENT] == -1)
                               & (nodes[:, gm.NODE_DEPTH] >= 0))[0]
    root = int(root_candidates[0])
    return spt_mod.build_spt(
        nodes, np.asarray(state.xyz), np.exp(np.asarray(state.log_scale)),
        alive, root,
        root_volume=post.spt_root_volume,
        target_granularity=post.spt_target_granularity,
        min_spt_size=post.min_spt_size, max_depth=max_depth,
        use_bounding_spheres=post.use_bounding_spheres)
