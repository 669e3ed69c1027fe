"""Chunk-parallel training: every chunk trains simultaneously, one program.

The reference's only scale-out is process-level data parallelism over
chunks via SLURM job arrays polled through `sacct`
(scripts/full_train.py:85-96,161-236). Here the same parallelism is ONE
SPMD program: the per-chunk train states are stacked along a leading chunk
axis, sharded across the `data` mesh axis, and the flat train step is
`vmap`-ed over chunks. There is no cross-chunk communication during
training (chunks are independent, as in the reference); consolidation
happens afterwards in pipeline/merge.py.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.train import flat


def stack_states(tss: Sequence[flat.FlatTrainState]) -> flat.FlatTrainState:
    """Stack per-chunk train states along a leading chunk axis. All chunks
    must share the same capacity / SH degree / exposure count."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *tss)


def unstack_states(bts: flat.FlatTrainState) -> List[flat.FlatTrainState]:
    k = bts.step.shape[0]
    return [jax.tree.map(lambda x: x[i], bts) for i in range(k)]


def shard_chunk_states(bts: flat.FlatTrainState, mesh: Mesh
                       ) -> flat.FlatTrainState:
    """Chunk axis -> `data` mesh axis; everything else stays local."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, bts)


@functools.partial(
    jax.jit,
    static_argnames=("opt", "cfg", "width", "height", "k_max", "sh_degree",
                     "use_exposure", "scale_big_gauss", "skybox_locked"),
    donate_argnames=("bts",))
def chunk_parallel_step(
    bts: flat.FlatTrainState,        # leaves have leading chunk dim K
    world_view, full_proj, campos, tan_fovx, tan_fovy,   # [K, ...]
    gt_images,                        # [K, 3, H, W]
    bg,                               # [3]
    exposure_idx,                     # [K]
    scene_extent: float = 1.0,
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024, sh_degree: int = 3,
    use_exposure: bool = True,
    scale_big_gauss: bool = True,
    skybox_locked: bool = False,
) -> Tuple[flat.FlatTrainState, flat.StepAux]:
    """One step of every chunk at once (vmapped flat.train_step). Pass
    ``skybox_locked=True`` when the chunks share a coarse-stage skybox
    (the sequential chunk loop locks it, full_train.py — otherwise each
    chunk's copy drifts independently and the merge cannot reconcile
    them)."""
    def one(ts, wv, fp, cp, tfx, tfy, gt, eidx):
        return flat.train_step(
            ts, wv, fp, cp, tfx, tfy, gt, bg, exposure_idx=eidx,
            scene_extent=scene_extent, opt=opt, cfg=cfg, width=width,
            height=height, k_max=k_max, sh_degree=sh_degree,
            use_exposure=use_exposure, skybox_locked=skybox_locked,
            scale_big_gauss=scale_big_gauss)

    return jax.vmap(one)(bts, world_view, full_proj, campos, tan_fovx,
                         tan_fovy, gt_images, exposure_idx)


@functools.partial(jax.jit, static_argnames=("opt",), donate_argnames=("bts",))
def chunk_parallel_densify(bts: flat.FlatTrainState, scene_extent,
                           *, opt: OptimizationConfig = OptimizationConfig()):
    def one(ts):
        return flat.densify_step(ts, scene_extent, opt=opt)
    return jax.vmap(one)(bts)
