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
    """Arrays get ONE extra SCRATCH row (index cap): the write-back scatter
    routes padding lanes there so they can never clobber a real row, while
    staying in bounds for the host legalizer (which rejects drop-mode's
    bounds-check select in the host partition). Fetches clip to cap-1, so
    the scratch row is never read back."""
    host = _host_sharding()
    pad1 = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    params = {k: jax.device_put(pad1(getattr(state, k)), host)
              for k in _ROW_KEYS}
    if adam is None:
        adam = optim.init_adam(state.params())
    m = {k: jax.device_put(pad1(adam.m[k]), host) for k in _ROW_KEYS}
    v = {k: jax.device_put(pad1(adam.v[k]), host) for k in _ROW_KEYS}
    return HostStore(params=params, m=m, v=v, step=adam.step)


def from_host_store(store: HostStore, template: GaussianState
                    ) -> Tuple[GaussianState, optim.AdamState]:
    dev = _dev_sharding()
    state = dataclasses.replace(
        template, **{k: jax.device_put(store.params[k][:-1], dev)
                     for k in _ROW_KEYS})
    exp = template.exposure
    adam = optim.AdamState(
        m={**{k: jax.device_put(store.m[k][:-1], dev) for k in _ROW_KEYS},
           "exposure": jnp.zeros_like(exp)},
        v={**{k: jax.device_put(store.v[k][:-1], dev) for k in _ROW_KEYS},
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
    def writeback(store, idx_wb, new_p, new_m, new_v):
        # padding lanes write to the dedicated SCRATCH row (index cap,
        # see to_host_store): a clipped index would alias row cap-1 and
        # nondeterministically overwrite its update with the stale
        # pre-update values the padding lanes carry; drop-mode is rejected
        # by the host-offload legalizer, so the scratch row keeps the
        # scatter in promise_in_bounds form
        def ws(x_host, v):
            v_h = jax.device_put(v, host)
            return x_host.at[idx_wb].set(v_h, mode="promise_in_bounds")
        return HostStore(
            params={k: ws(store.params[k], new_p[k]) for k in _ROW_KEYS},
            m={k: ws(store.m[k], new_m[k]) for k in _ROW_KEYS},
            v={k: ws(store.v[k], new_v[k]) for k in _ROW_KEYS},
            step=store.step + 1)

    def step(store, idx, idx_valid, world_view, full_proj, campos,
             tan_fovx, tan_fovy, gt_image, bg):
        cap = store.params["xyz"].shape[0] - 1   # last row = scratch
        idx_h = jax.device_put(jnp.clip(idx, 0, cap - 1), host)
        idx_wb = jax.device_put(
            jnp.where(idx_valid, jnp.clip(idx, 0, cap - 1), cap), host)
        rows, m_rows, v_rows = fetch(store, idx_h)
        new_p, new_m, new_v, loss, n_vis = compute(
            rows, m_rows, v_rows, store.step, idx_valid, world_view,
            full_proj, campos, tan_fovx, tan_fovy, gt_image, bg)
        store2 = writeback(store, idx_wb, new_p, new_m, new_v)
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
        n_ws = jnp.maximum(jnp.sum(idx_valid), 1)
        if post.lambda_opacity > 0:
            op = jax.nn.sigmoid(p["opacity_logit"][:, 0])
            loss = loss + post.lambda_opacity * jnp.sum(
                jnp.where(idx_valid, jnp.abs(op), 0.0)) / n_ws
        if post.lambda_scaling > 0:
            sc = jnp.exp(p["log_scale"])
            loss = loss + post.lambda_scaling * jnp.sum(
                jnp.where(idx_valid[:, None], jnp.abs(sc), 0.0)) / n_ws
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
    """Compact a working-set mask into a padded index list.

    Rows past `budget` are DROPPED (jnp.nonzero truncates at `size`);
    `spt_cut_budgeted` can return an over-budget cut when even its largest
    distance multiplier does not fit, so offloaded callers must compare
    the cut's n_selected against `budget` (an async one-frame-lagged check
    is enough) and grow the budget or the multiplier when it trips."""
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


def post_optimize_offloaded(
    store: "PackedStore",
    forest,
    views,
    *,
    budget: int,
    post: PostConfig = PostConfig(),
    opt: OptimizationConfig = OptimizationConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    scene_extent: float = 1.0,
    n_iters: Optional[int] = None,
    bg=None,
):
    """Out-of-core post-training loop: the composed reference train_post
    (train_post.py:323-491) — per-view SPT cut (with the cache_spts reuse
    rule), device-resident row cache paging only the cut DELTA, and the
    NEXT view's cut+gather prefetched while the device runs the current
    step. The packed host store can exceed HBM by orders of magnitude
    (50M rows = ~14 GB host at sh1).

    Returns (trainer, losses list). The caller flushes/unpacks the store.
    """
    import jax.numpy as jnp_  # noqa: F401  (kept local for clarity)

    trainer = DeviceResidentTrainer(
        store, budget, opt=opt, post=post, cfg=cfg, width=width,
        height=height, k_max=k_max, scene_extent=scene_extent)
    cutter = CachedCutter(forest, store.capacity, post)
    bg = jnp.zeros(3) if bg is None else bg
    n_iters = len(views) if n_iters is None else n_iters

    def rows_for(v):
        c = cutter.cut(v.campos, v.full_proj)
        idx, valid = cut_to_indices(c.gaussian_mask, budget)
        return np.asarray(idx)[np.asarray(valid)]

    losses = []
    next_rows = rows_for(views[0])
    for it in range(n_iters):
        v = views[it % len(views)]
        rows = next_rows
        if it + 1 < n_iters:
            nxt_v = views[(it + 1) % len(views)]
            next_rows = rows_for(nxt_v)
        else:
            next_rows = None
        loss, _ = trainer.step(
            rows, v.world_view, v.full_proj, v.campos, v.tan_fovx,
            v.tan_fovy, v.image, bg, prefetch_rows=next_rows)
        losses.append(loss)
    return trainer, losses


class CachedCutter:
    """Per-view SPT working-set cuts with the fork's cache-reuse rule.

    Wires PostConfig.cache_spts + reuse_spt_tolerance: with caching on,
    SPTs whose camera distance moved < rtol keep the PREVIOUS view's cut
    distance, so their rows are bit-identical frame to frame and the
    out-of-core cache (DeviceResidentTrainer) pages only the real delta
    (train_post.py:323-394)."""

    def __init__(self, forest, capacity: int,
                 post: PostConfig = PostConfig(),
                 use_frustum: Optional[bool] = None):
        from hlod_gaussians_tpu.hierarchy import spt as spt_mod

        self._spt = spt_mod
        self.forest = forest
        self.post = post
        self.use_frustum = (post.use_frustum_culling
                            if use_frustum is None else use_frustum)
        self._shape = jnp.zeros((capacity,))
        self._prev = None

    def cut(self, campos, full_proj, distance_multiplier=1.0):
        if not self.post.cache_spts or self._prev is None:
            c = self._spt.spt_cut(
                self.forest, self._shape, campos, full_proj,
                distance_multiplier, use_frustum=self.use_frustum)
        else:
            sel, dist = self._prev
            c = self._spt.spt_cut_cached(
                self.forest, self._shape, campos, full_proj, sel, dist,
                jnp.float32(self.post.reuse_spt_tolerance),
                distance_multiplier, use_frustum=self.use_frustum)
        if self.post.cache_spts:
            self._prev = (c.spt_selected, c.spt_distance)
        return c


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


# ---------------------------------------------------------------------------
# Packed + pipelined out-of-core loop
# ---------------------------------------------------------------------------
#
# The plain NumpyStore path pays 18 host gathers + 18 H2D transfers + 18
# D2H readbacks per step (params/m/v x 6 keys), each a separate tunnel RPC.
# The packed path stores params+Adam moments as ONE row-major [cap, D]
# matrix, so a step is: ONE numpy gather -> ONE transfer -> jitted compute
# (which unpacks/repacks by column slicing, free under XLA) -> ONE readback
# -> ONE numpy scatter. On top, the step's (dispatch, writeback) split software-pipelines the
# host work against the device: compute(k) is dispatched asynchronously,
# then the host writes back view k-1 and prefetches view k+1 while the
# device renders — the double-buffering of the reference's [WRITE-BACK]/
# [LOAD] phases (train_post.py:440-479) without streams.

def _packed_layout(sh_degree: int):
    """Column layout of one packed row: params then m then v."""
    k_rest = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    sizes = dict(xyz=3, f_dc=3, f_rest=3 * k_rest, log_scale=3, quat=4,
                 opacity_logit=1)
    cols = {}
    off = 0
    for group in ("p", "m", "v"):
        for k in _ROW_KEYS:
            cols[(group, k)] = (off, off + sizes[k])
            off += sizes[k]
    return cols, off, k_rest


def pack_store(state: GaussianState,
               adam: Optional[optim.AdamState] = None) -> np.ndarray:
    """GaussianState (+Adam) -> packed [cap, D] float32 host matrix."""
    cols, d, k_rest = _packed_layout(state.sh_degree)
    cap = state.capacity
    out = np.zeros((cap, d), np.float32)

    def put(group, key, arr):
        lo, hi = cols[(group, key)]
        out[:, lo:hi] = np.asarray(arr).reshape(cap, -1)

    for k in _ROW_KEYS:
        put("p", k, getattr(state, k))
        if adam is not None:
            put("m", k, adam.m[k])
            put("v", k, adam.v[k])
    return out


def unpack_rows(packed: jnp.ndarray, sh_degree: int):
    """[K, D] device rows -> (params dict, m dict, v dict)."""
    cols, _, k_rest = _packed_layout(sh_degree)
    k = packed.shape[0]
    shapes = dict(xyz=(k, 3), f_dc=(k, 1, 3), f_rest=(k, k_rest, 3),
                  log_scale=(k, 3), quat=(k, 4), opacity_logit=(k, 1))

    def grab(group):
        return {key: packed[:, cols[(group, key)][0]:cols[(group, key)][1]]
                .reshape(shapes[key]) for key in _ROW_KEYS}

    return grab("p"), grab("m"), grab("v")


def pack_rows(p: Dict, m: Dict, v: Dict, sh_degree: int) -> jnp.ndarray:
    """(params, m, v) row dicts -> [K, D] packed device matrix."""
    cols, d, _ = _packed_layout(sh_degree)
    k = p["xyz"].shape[0]
    parts = []
    for group, src in (("p", p), ("m", m), ("v", v)):
        for key in _ROW_KEYS:
            parts.append(src[key].reshape(k, -1))
    return jnp.concatenate(parts, axis=1)


class PackedStore:
    """Packed mutable host store: params + Adam moments in one matrix."""

    def __init__(self, packed: np.ndarray, sh_degree: int, step: int = 0):
        self.data = packed
        self.sh_degree = sh_degree
        self.step = step

    @classmethod
    def from_state(cls, state: GaussianState,
                   adam: Optional[optim.AdamState] = None) -> "PackedStore":
        return cls(pack_store(state, adam), state.sh_degree,
                   step=0 if adam is None else int(adam.step))

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


def make_packed_offloaded_step(
    *,
    opt: OptimizationConfig = OptimizationConfig(),
    post: PostConfig = PostConfig(),
    cfg: RasterizerConfig = RasterizerConfig(),
    width: int, height: int, k_max: int = 1024,
    sh_degree: int = 1,
    antialiasing: bool = False,
    scene_extent: float = 1.0,
):
    """Returns (dispatch, writeback): the two host-side halves of a step.

    dispatch(store, idx_np, cam...) -> handle — gathers+uploads the working
    set and dispatches the jitted compute (returns immediately; device runs
    in the background).
    writeback(store, handle) -> (loss, n_vis) — blocks on the device
    result and scatters it into the store.
    """

    @functools.partial(jax.jit, static_argnames=())
    def compute(packed_rows, step_count, idx_valid, world_view, full_proj,
                campos, tan_fovx, tan_fovy, gt_image, bg):
        rows, m_rows, v_rows = unpack_rows(packed_rows, sh_degree)
        new_p, new_m, new_v, loss, n_vis = _compute_phase(
            rows, m_rows, v_rows, step_count, idx_valid, world_view,
            full_proj, campos, tan_fovx, tan_fovy, gt_image, bg,
            opt=opt, post=post, cfg=cfg, width=width, height=height,
            k_max=k_max, sh_degree=sh_degree, antialiasing=antialiasing,
            scene_extent=scene_extent)
        return pack_rows(new_p, new_m, new_v, sh_degree), loss, n_vis

    def dispatch(store: PackedStore, idx_np, world_view, full_proj, campos,
                 tan_fovx, tan_fovy, gt_image, bg):
        valid_np = idx_np < store.capacity
        idx_c = np.minimum(idx_np, store.capacity - 1)
        rows = jnp.asarray(store.data[idx_c])           # ONE gather+upload
        out = compute(rows, jnp.int32(store.step), jnp.asarray(valid_np),
                      world_view, full_proj, campos, tan_fovx, tan_fovy,
                      gt_image, bg)
        store.step += 1
        return (out, idx_c, valid_np)

    def writeback(store: PackedStore, handle):
        (packed_new, loss, n_vis), idx_c, valid_np = handle
        wb = idx_c[valid_np]
        store.data[wb] = np.asarray(packed_new)[valid_np]   # ONE readback
        return loss, n_vis

    return dispatch, writeback


class DeviceResidentTrainer:
    """Out-of-core training with a device-resident working-set cache.

    The reference's SPT cache (train_post.py:323-491): parameters + Adam
    moments live packed in host RAM; the device owns `budget` row slots.
    Per view, rows ENTERING the working set are fetched (one gather +
    upload), rows LEAVING are read back and scattered into the host store,
    and retained rows never move — so per-step transfer scales with the
    cut DELTA, which the cache-coherent view schedule
    (utils/scheduler.py, consistency_graph.py:18-48) keeps small. Updates
    stay on-device between steps; results are bit-identical to the
    sequential path because every row has exactly one live copy.
    """

    def __init__(self, store: PackedStore, budget: int, *,
                 opt: OptimizationConfig = OptimizationConfig(),
                 post: PostConfig = PostConfig(),
                 cfg: RasterizerConfig = RasterizerConfig(),
                 width: int, height: int, k_max: int = 1024,
                 antialiasing: bool = False, scene_extent: float = 1.0):
        self.store = store
        self.budget = budget
        self.sh_degree = store.sh_degree
        self.slot_of_row = np.full(store.capacity, -1, np.int32)
        self.row_of_slot = np.full(budget, -1, np.int32)
        self._need = np.zeros(store.capacity, bool)   # scratch, reset per step
        self.free = list(range(budget - 1, -1, -1))
        d = store.data.shape[1]
        # TRANSPOSED device buffer [D, budget]: slot fetch/evict are
        # minor-axis gathers/scatters (row-major slot indexing scalarizes
        # on TPU — 32k-row evictions took seconds; see tpu notes)
        self.buf = jnp.zeros((d, budget), jnp.float32)
        self._opt = opt
        sh_degree = store.sh_degree

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _compute(packed_cols, step_count, valid, world_view, full_proj,
                     campos, tan_fovx, tan_fovy, gt_image, bg):
            rows, m_rows, v_rows = unpack_rows(packed_cols.T, sh_degree)
            new_p, new_m, new_v, loss, n_vis = _compute_phase(
                rows, m_rows, v_rows, step_count, valid, world_view,
                full_proj, campos, tan_fovx, tan_fovy, gt_image, bg,
                opt=opt, post=post, cfg=cfg, width=width, height=height,
                k_max=k_max, sh_degree=sh_degree, antialiasing=antialiasing,
                scene_extent=scene_extent)
            return pack_rows(new_p, new_m, new_v, sh_degree).T, loss, n_vis

        self._compute = _compute
        self.last_fetch = 0
        self.last_evict = 0
        self._prefetched = None

        # ONE device program for the whole cache update (evict-gather +
        # fetch-scatter): over a remote-dispatch link every separate device
        # interaction costs ~5-15 ms of tunnel latency, so the two halves
        # are fused and padded to power-of-2 bucket sizes (few compiles).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _cache_update(buf, ev_slots, fetch_slots, staged):
            ev_vals = buf[:, ev_slots]
            buf = buf.at[:, fetch_slots].set(staged)
            return buf, ev_vals

        self._cache_update = _cache_update

    def prepare(self, rows_needed: np.ndarray) -> dict:
        """HOST half of the cache sync: compute the evict/fetch sets and
        GATHER the missing rows from the numpy store into a staging buffer.
        Pure CPU + an async H2D upload — safe to run while the device is
        still computing the previous step (the prefetch overlap of the
        reference's [LOAD] phase, train_post.py:440-479)."""
        rows_needed = np.asarray(rows_needed, np.int32)
        # O(working set) evict/miss computation: a fresh capacity-sized
        # `need` array + full-store resident scan cost ~40 ms/step at 16M
        # rows and would be ~130 ms at the 50M reference envelope — the
        # `need` flags are kept allocated and reset sparsely, and residency
        # is enumerated through the budget-sized row_of_slot instead
        self._need[rows_needed] = True
        res_rows = self.row_of_slot[self.row_of_slot >= 0]
        ev_rows = res_rows[~self._need[res_rows]].astype(np.int32)
        miss_rows = rows_needed[self.slot_of_row[rows_needed] < 0]
        miss_rows = np.unique(miss_rows).astype(np.int32)
        self._need[rows_needed] = False
        n_free = len(self.free) + len(ev_rows)
        if len(miss_rows) > n_free:
            raise RuntimeError(
                f"working set {int(need.sum())} > budget {self.budget}")
        # the big host gather + upload dispatch happen NOW (overlappable);
        # jnp.asarray returns as soon as the transfer is enqueued
        staged = (jnp.asarray(self.store.data[miss_rows].T)
                  if len(miss_rows) else None)
        return dict(evict=ev_rows, missing=miss_rows, staged=staged)

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b <<= 1
        return b

    def apply(self, prep: dict) -> None:
        """DEVICE/bookkeeping half: ONE fused device call reads back the
        evicted slots and places the staged rows (evict-read is ordered
        before the fetch-write inside the program, so a fetched row may
        reuse a just-evicted slot); the host then scatters the evicted
        values into the store."""
        ev_rows = prep["evict"]
        miss = prep["missing"]
        if len(ev_rows) == 0 and len(miss) == 0:
            self.last_fetch = self.last_evict = 0
            return
        ev_slots = (self.slot_of_row[ev_rows] if len(ev_rows)
                    else np.zeros(0, np.int32))
        pool = self.free + [int(s) for s in ev_slots]
        if len(miss) > len(pool):
            raise RuntimeError("working set > budget")
        slots = np.asarray(pool[:len(miss)], np.int32)
        self.free = pool[len(miss):]

        # pad to bucket sizes (few distinct compiles): duplicate evict
        # reads are free; fetch padding re-targets the first REAL slot so
        # the duplicate write stores the same value twice
        nb_e = self._bucket(max(len(ev_slots), 1))
        nb_f = self._bucket(max(len(slots), 1))
        ev_pad = np.full(nb_e, int(ev_slots[0]) if len(ev_slots) else 0,
                         np.int32)
        ev_pad[:len(ev_slots)] = ev_slots
        anchor = int(slots[0]) if len(slots) else 0
        f_pad = np.full(nb_f, anchor, np.int32)
        f_pad[:len(slots)] = slots
        staged = prep["staged"]
        if staged is None:
            staged = self.buf[:, jnp.asarray(f_pad)]     # no-op rewrite
        elif staged.shape[1] < nb_f:
            d = staged.shape[0]
            staged = jnp.concatenate(
                [staged, jnp.broadcast_to(staged[:, :1],
                                          (d, nb_f - staged.shape[1]))],
                axis=1)

        self.buf, ev_vals = self._cache_update(
            self.buf, jnp.asarray(ev_pad), jnp.asarray(f_pad), staged)

        if len(ev_rows):
            self.store.data[ev_rows] = np.asarray(
                ev_vals)[:, :len(ev_rows)].T
            self.slot_of_row[ev_rows] = -1
            self.row_of_slot[ev_slots] = -1
        if len(miss):
            self.slot_of_row[miss] = slots
            self.row_of_slot[slots] = miss
        self.last_fetch = len(miss)
        self.last_evict = len(ev_rows)

    def _sync(self, rows_needed: np.ndarray) -> None:
        """Evict slots whose rows left the set; fetch missing rows."""
        self.apply(self.prepare(rows_needed))

    def step(self, rows_needed: np.ndarray, world_view, full_proj, campos,
             tan_fovx, tan_fovy, gt_image, bg,
             prefetch_rows: Optional[np.ndarray] = None):
        """One training step on the given working-set rows (host indices).

        With ``prefetch_rows`` (the NEXT view's working set) the host
        gathers and uploads the next delta WHILE the device runs this
        step's compute — per-step host work hides behind device time. The
        prepared delta is consumed by the next step() call automatically.
        """
        rows_needed = np.asarray(rows_needed, np.int32)
        if self._prefetched is not None and np.array_equal(
                self._prefetched[0], rows_needed):
            self.apply(self._prefetched[1])
        else:
            self._sync(rows_needed)
        self._prefetched = None
        valid = jnp.asarray(self.row_of_slot >= 0)
        self.buf, loss, n_vis = self._compute(
            self.buf, jnp.int32(self.store.step), valid, world_view,
            full_proj, campos, tan_fovx, tan_fovy, gt_image, bg)
        self.store.step += 1
        if prefetch_rows is not None:
            # runs on the host while the dispatched compute occupies the
            # device; apply() next step syncs on the compute anyway
            prefetch_rows = np.asarray(prefetch_rows, np.int32)
            self._prefetched = (prefetch_rows, self.prepare(prefetch_rows))
        return loss, n_vis

    def flush(self) -> None:
        """Write every resident row back to the host store."""
        rows = np.where(self.slot_of_row >= 0)[0]
        if len(rows):
            slots = self.slot_of_row[rows]
            self.store.data[rows] = np.asarray(
                self.buf[:, jnp.asarray(slots)]).T
