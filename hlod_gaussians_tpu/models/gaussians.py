"""Gaussian model state: the TPU-native counterpart of the reference's
`GaussianModel` (reference scene/gaussian_model.py:54-1775).

Design differences from the reference (deliberate, TPU-first):

* The reference grows/shrinks torch tensors dynamically (densify_and_split
  cats new rows, prune masks rows out). XLA requires static shapes, so the
  state is **capacity-padded**: every array has a fixed leading capacity
  ``C`` and an ``alive`` mask selects the live rows. This matches the
  reference's own out-of-core mode, which pre-allocates
  ``max_number_of_gaussians`` rows (scene/gaussian_model.py:399-492) — we
  adopt that as the only mode.
* Parameters are stored RAW (pre-activation) exactly like the reference:
  log-scales (exp activation), opacity logits (sigmoid), unnormalized
  quaternions (normalize activation) — scene/gaussian_model.py:677-693.
* The state is a plain pytree (``flax.struct``-style frozen dataclass via
  jax.tree_util.register_dataclass) so it passes through jit/grad/pjit and
  shards over a device mesh with `NamedSharding` along the capacity axis.
* Skybox rows (reference: 100k faint-blue points on a far sphere,
  scene/gaussian_model.py:827-842) occupy rows ``[0, n_skybox)`` and are
  flagged in ``skybox_mask`` so training can zero their position/scale
  gradients (train_single.py:162-168).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.ops import knn as knn_ops
from hlod_gaussians_tpu.ops import sh as sh_ops

# Hierarchy node-table column indices (reference scene/gaussian_model.py:31-36).
# nodes[i] describes the node whose Gaussian is row i — node idx == gaussian idx.
NODE_DEPTH = 0
NODE_PARENT = 1
NODE_CHILD_COUNT = 2
NODE_FIRST_CHILD = 3
NODE_NEXT_SIBLING = 4
NODE_AUX = 5  # max_side_length upstream; repurposed as scratch (global index map)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    """Capacity-padded Gaussian parameter pytree.

    All arrays have leading dim C (static capacity). Raw parameters:
      xyz           [C,3]   world positions
      f_dc          [C,1,3] SH DC coefficients
      f_rest        [C,K,3] SH rest coefficients (K = num_coeffs(max_degree)-1)
      log_scale     [C,3]
      quat          [C,4]   (w,x,y,z), unnormalized
      opacity_logit [C,1]
      exposure      [E,3,4] per-image affine color transform
    Bookkeeping:
      alive         [C] bool
      nodes         [C,6] int32 hierarchy node table (all -1 when flat)
      n_skybox      static int — rows [0, n_skybox) are skybox
    """

    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    log_scale: jnp.ndarray
    quat: jnp.ndarray
    opacity_logit: jnp.ndarray
    exposure: jnp.ndarray
    alive: jnp.ndarray
    nodes: jnp.ndarray
    n_skybox: int = dataclasses.field(metadata=dict(static=True), default=0)
    # trained-scaffold rows prepended for chunk conditioning occupy
    # [n_skybox, n_skybox + n_scaffold). They stay trainable (the reference
    # locks only the skybox, train_single.py:162-168) but are excluded from
    # densification, pruning and the big-Gaussian shrink
    # (gaussian_model.py:1465-1466,1513-1514; train_single.py:184-185).
    n_scaffold: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.f_rest.shape[1]
        return {1: 0, 4: 1, 9: 2, 16: 3}[k]

    def num_alive(self):
        return jnp.sum(self.alive)

    @property
    def skybox_mask(self) -> jnp.ndarray:
        idx = jnp.arange(self.capacity)
        return idx < self.n_skybox

    @property
    def protected_mask(self) -> jnp.ndarray:
        """Skybox + scaffold rows: never densified/pruned/shrunk."""
        idx = jnp.arange(self.capacity)
        return idx < self.n_skybox + self.n_scaffold

    def params(self) -> dict:
        """The trainable leaves as a dict (for grads/optimizer)."""
        return dict(xyz=self.xyz, f_dc=self.f_dc, f_rest=self.f_rest,
                    log_scale=self.log_scale, quat=self.quat,
                    opacity_logit=self.opacity_logit, exposure=self.exposure)

    def replace_params(self, p: dict) -> "GaussianState":
        return dataclasses.replace(self, **p)


class Activated(NamedTuple):
    """Activated per-Gaussian quantities consumed by the renderer."""

    means3d: jnp.ndarray   # [C,3]
    scales: jnp.ndarray    # [C,3] exp(log_scale)
    quats: jnp.ndarray     # [C,4] normalized
    opacities: jnp.ndarray  # [C] sigmoid(logit)
    shs: jnp.ndarray       # [C,K,3]
    valid: jnp.ndarray     # [C] bool


def activate(state: GaussianState, valid: Optional[jnp.ndarray] = None) -> Activated:
    """Apply the reference's activations (scene/gaussian_model.py:677-693)."""
    q = state.quat / jnp.linalg.norm(state.quat, axis=-1, keepdims=True).clip(1e-12)
    shs = jnp.concatenate([state.f_dc, state.f_rest], axis=1)
    return Activated(
        means3d=state.xyz,
        scales=jnp.exp(state.log_scale),
        quats=q,
        opacities=jax.nn.sigmoid(state.opacity_logit[..., 0]),
        shs=shs,
        valid=state.alive if valid is None else (state.alive & valid),
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def empty_state(capacity: int, sh_degree: int = 3, n_exposures: int = 1,
                n_skybox: int = 0) -> GaussianState:
    k_rest = sh_ops.NUM_COEFFS[sh_degree] - 1
    ident_exp = jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)[None],
        (max(n_exposures, 1), 1, 1)).astype(jnp.float32)
    return GaussianState(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, k_rest, 3), jnp.float32),
        log_scale=jnp.full((capacity, 3), -10.0, jnp.float32),
        quat=jnp.concatenate([jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))],
                             axis=1).astype(jnp.float32),
        opacity_logit=jnp.full((capacity, 1), -10.0, jnp.float32),
        exposure=ident_exp,
        alive=jnp.zeros((capacity,), bool),
        nodes=jnp.full((capacity, 6), -1, jnp.int32),
        n_skybox=n_skybox,
    )


def make_skybox(n: int, radius: float, seed: int = 0):
    """Skybox point cloud: n points on the upper 2/3 of a sphere of
    ``radius`` (= 10x scene radius in the reference), faint blue color
    (reference scene/gaussian_model.py:827-842).

    Returns (positions [n,3] np, colors [n,3] np in [0,1]).
    """
    rng = np.random.default_rng(seed)
    theta = 2.0 * np.pi * rng.random(n)
    # reference: phi = arccos(1 - 1.4*rand) — biased toward the upper sphere
    phi = np.arccos(1.0 - 1.4 * rng.random(n))
    pos = np.stack([
        radius * np.cos(theta) * np.sin(phi),
        radius * np.sin(theta) * np.sin(phi),
        radius * np.cos(phi),
    ], axis=-1).astype(np.float32)
    colors = np.tile(np.array([[0.7, 0.8, 0.95]], np.float32), (n, 1))
    return pos, colors


def create_from_points(
    points: np.ndarray,            # [N,3]
    colors: np.ndarray,            # [N,3] in [0,1]
    capacity: int,
    sh_degree: int = 3,
    n_exposures: int = 1,
    scene_radius: float = 1.0,
    skybox_num: int = 0,
    skybox_seed: int = 0,
    opacity_init: float = 0.01,
    skybox_opacity: float = 0.7,
    scale_clip_max: Optional[float] = None,
) -> GaussianState:
    """Initialize from a point cloud (reference create_from_pcd,
    scene/gaussian_model.py:804-919):

    * optional skybox rows prepended (at 10x scene radius upstream — the
      caller passes the radius via ``scene_radius`` and count via
      ``skybox_num``),
    * log-scale init from mean squared distance to the 3 nearest neighbors
      (``distCUDA2`` equivalent, ops/knn.py),
    * identity rotation, constant opacity logit, colors -> SH DC.
    """
    n = points.shape[0]
    total = n + skybox_num
    if total > capacity:
        raise ValueError(f"capacity {capacity} < points {n} + skybox {skybox_num}")

    if skybox_num > 0:
        sky_pos, sky_col = make_skybox(skybox_num, 10.0 * scene_radius, skybox_seed)
        all_pos = np.concatenate([sky_pos, points.astype(np.float32)], axis=0)
        all_col = np.concatenate([sky_col, colors.astype(np.float32)], axis=0)
    else:
        all_pos = points.astype(np.float32)
        all_col = colors.astype(np.float32)

    state = empty_state(capacity, sh_degree, n_exposures, n_skybox=skybox_num)

    pos_j = jnp.asarray(all_pos)
    dist2 = knn_ops.knn_mean_sq_dist(pos_j, k=3)
    dist2 = jnp.clip(dist2, 1e-7, None)
    log_s = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    if scale_clip_max is not None:
        log_s = jnp.minimum(log_s, jnp.log(scale_clip_max))

    f_dc = sh_ops.rgb_to_sh(jnp.asarray(all_col))[:, None, :]

    op = np.full((total, 1), inverse_sigmoid(jnp.float32(opacity_init)), np.float32)
    if skybox_num > 0:
        op[:skybox_num] = float(inverse_sigmoid(jnp.float32(skybox_opacity)))
        # skybox scale: reference uses distCUDA2 over the combined cloud too;
        # keep the knn-derived scales.

    state = dataclasses.replace(
        state,
        xyz=state.xyz.at[:total].set(pos_j),
        f_dc=state.f_dc.at[:total].set(f_dc),
        log_scale=state.log_scale.at[:total].set(log_s),
        opacity_logit=state.opacity_logit.at[:total].set(jnp.asarray(op)),
        alive=state.alive.at[:total].set(True),
    )
    return state


def create_from_gaussian_ply(ply, capacity: int, n_exposures: int = 1
                             ) -> GaussianState:
    """Initialize from a saved 3DGS point cloud (the reference's
    --pretrained path, scene/__init__.py:82-83 create_from_pt): raw
    parameters are adopted verbatim, no knn re-init."""
    n = ply.xyz.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < ply points {n}")
    sh_degree = {0: 0, 3: 1, 8: 2, 15: 3}[ply.f_rest.shape[1]]
    state = empty_state(capacity, sh_degree, n_exposures, n_skybox=0)
    q = ply.quat / np.maximum(
        np.linalg.norm(ply.quat, axis=-1, keepdims=True), 1e-12)
    return dataclasses.replace(
        state,
        xyz=state.xyz.at[:n].set(jnp.asarray(ply.xyz)),
        f_dc=state.f_dc.at[:n].set(jnp.asarray(ply.f_dc)),
        f_rest=state.f_rest.at[:n].set(jnp.asarray(ply.f_rest)),
        log_scale=state.log_scale.at[:n].set(jnp.asarray(ply.log_scale)),
        quat=state.quat.at[:n].set(jnp.asarray(q.astype(np.float32))),
        opacity_logit=state.opacity_logit.at[:n].set(
            jnp.asarray(ply.opacity.reshape(n, 1).astype(np.float32))),
        alive=state.alive.at[:n].set(True),
    )


def select_scaffold_ring(scaffold_xyz: np.ndarray, center: np.ndarray,
                         extent0: float, n_skybox: int) -> np.ndarray:
    """Scaffold rows a chunk conditions on (reference
    scene/gaussian_model.py:890-895): points whose Chebyshev x/y distance to
    the chunk center lies in (0.5*extent, 1.5*extent) — the ring AROUND the
    chunk, the interior being covered by the chunk's own points — plus every
    skybox row. extent0 is the chunk's extent[0] (the reference uses the
    first component for both axes)."""
    d = np.abs(np.asarray(scaffold_xyz)[:, :2] - np.asarray(center)[:2])
    m = np.maximum(d[:, 0], d[:, 1])
    sel = (m > 0.5 * extent0) & (m < 1.5 * extent0)
    sel[:n_skybox] = True
    return sel


def create_with_scaffold(
    scaffold: GaussianState,
    chunk_center: np.ndarray,
    chunk_extent0: float,
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    n_exposures: int = 1,
    opacity_init: float = 0.01,
    max_scaffold_rows: Optional[int] = None,
) -> GaussianState:
    """Chunk state conditioned on the trained coarse scaffold (reference
    create_from_pcd with scaffold_file, scene/gaussian_model.py:866-919):

    rows = [scaffold skybox | scaffold ring (trained params, SH zero-padded
    deg1->deg`sh_degree`) | chunk points]. Scaffold rows keep their trained
    raw parameters; chunk points get the usual kNN scale / SH-DC init.
    """
    sel = select_scaffold_ring(np.asarray(scaffold.xyz), chunk_center,
                               chunk_extent0, scaffold.n_skybox)
    sel &= np.asarray(scaffold.alive)
    rows = np.where(sel)[0]
    if max_scaffold_rows is not None and len(rows) > max_scaffold_rows:
        # Deviation for DENSE scaffolds: the reference conditions on every
        # ring row (its coarse model is a sparse global scaffold, so the
        # ring is small); when the scaffold is as dense as the chunks
        # themselves the ring can exceed the chunk capacity. Keep all
        # skybox rows and an even subsample of the rest — the ring only
        # provides frozen boundary context, not trained content.
        sky = rows[rows < scaffold.n_skybox]
        rest = rows[rows >= scaffold.n_skybox]
        keep = max(0, max_scaffold_rows - len(sky))
        if keep < len(rest):
            idx = np.linspace(0, len(rest) - 1, keep).astype(np.int64)
            rest = rest[idx]
        rows = np.concatenate([sky, rest])
    n_scaf = len(rows)
    n = points.shape[0]
    if n_scaf + n > capacity:
        raise ValueError(f"capacity {capacity} < scaffold {n_scaf} + points {n}")

    state = empty_state(capacity, sh_degree, n_exposures,
                        n_skybox=int(np.sum(rows < scaffold.n_skybox)))
    k_rest = sh_ops.NUM_COEFFS[sh_degree] - 1

    # trained scaffold rows, SH-rest zero-padded to the chunk's degree
    f_rest_s = np.zeros((n_scaf, k_rest, 3), np.float32)
    src_rest = np.asarray(scaffold.f_rest)[rows]
    # degree mismatch either way: pad a lower-degree scaffold with zeros,
    # TRUNCATE a higher-degree one (a deg-3 scaffold into a deg-1 chunk
    # would otherwise raise a broadcast error)
    kk = min(k_rest, src_rest.shape[1])
    f_rest_s[:, :kk, :] = src_rest[:, :kk, :]

    # chunk point init (reference: kNN scales over the chunk pcd only)
    pos_j = jnp.asarray(points.astype(np.float32))
    dist2 = jnp.clip(knn_ops.knn_mean_sq_dist(pos_j, k=3), 1e-7, None)
    log_s = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    f_dc_p = sh_ops.rgb_to_sh(jnp.asarray(colors.astype(np.float32)))[:, None, :]
    op_p = float(inverse_sigmoid(jnp.float32(opacity_init)))

    total = n_scaf + n
    state = dataclasses.replace(
        state,
        xyz=state.xyz.at[:n_scaf].set(jnp.asarray(np.asarray(scaffold.xyz)[rows]))
                    .at[n_scaf:total].set(pos_j),
        f_dc=state.f_dc.at[:n_scaf].set(jnp.asarray(np.asarray(scaffold.f_dc)[rows]))
                      .at[n_scaf:total].set(f_dc_p),
        f_rest=state.f_rest.at[:n_scaf].set(jnp.asarray(f_rest_s)),
        log_scale=state.log_scale.at[:n_scaf].set(
            jnp.asarray(np.asarray(scaffold.log_scale)[rows]))
                                 .at[n_scaf:total].set(log_s),
        quat=state.quat.at[:n_scaf].set(jnp.asarray(np.asarray(scaffold.quat)[rows])),
        opacity_logit=state.opacity_logit.at[:n_scaf].set(
            jnp.asarray(np.asarray(scaffold.opacity_logit)[rows]))
                                         .at[n_scaf:total].set(op_p),
        alive=state.alive.at[:total].set(True),
        n_scaffold=n_scaf - int(np.sum(rows < scaffold.n_skybox)),
    )
    return state


def scene_extent(cam_centers: np.ndarray) -> float:
    """NeRF++-style scene extent: 1.1 x max distance from the average camera
    center (reference getNerfppNorm, scene/dataset_readers.py:52-73)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=-1)
    return float(dist.max() * 1.1)
