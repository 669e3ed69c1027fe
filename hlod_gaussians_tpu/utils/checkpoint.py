"""Checkpoint / resume for training states.

Covers the reference's three persistence mechanisms
(scene/gaussian_model.py:732-764 capture/restore incl. optimizer moments,
:1152-1212 model snapshots, :1115-1124 hierarchy snapshots) with one
mechanism: a flat .npz of the full train-state pytree (parameters, alive
mask, node table, Adam moments, step) plus the static metadata needed to
rebuild the pytree. Model-only exports go through data/ply.py and
data/dhier.py instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu import optim
from hlod_gaussians_tpu.models.gaussians import GaussianState
from hlod_gaussians_tpu.train.flat import FlatTrainState
from hlod_gaussians_tpu.train.post import PostTrainState

_PARAM_KEYS = ("xyz", "f_dc", "f_rest", "log_scale", "quat", "opacity_logit",
               "exposure")


def _state_arrays(g: GaussianState) -> dict:
    out = {f"g_{k}": np.asarray(v) for k, v in g.params().items()}
    out["g_alive"] = np.asarray(g.alive)
    out["g_nodes"] = np.asarray(g.nodes)
    return out


def _adam_arrays(a: optim.AdamState) -> dict:
    out = {f"m_{k}": np.asarray(v) for k, v in a.m.items()}
    out.update({f"v_{k}": np.asarray(v) for k, v in a.v.items()})
    out["adam_step"] = np.asarray(a.step)
    return out


def save_checkpoint(path: str, ts: Union[FlatTrainState, PostTrainState]
                    ) -> None:
    arrays = _state_arrays(ts.gaussians)
    arrays.update(_adam_arrays(ts.adam))
    arrays["step"] = np.asarray(ts.step)
    if isinstance(ts, FlatTrainState):
        arrays["xyz_grad_accum"] = np.asarray(ts.xyz_grad_accum)
        arrays["denom"] = np.asarray(ts.denom)
        arrays["max_radii"] = np.asarray(ts.max_radii)
    meta = dict(kind=type(ts).__name__, n_skybox=ts.gaussians.n_skybox,
                n_scaffold=ts.gaussians.n_scaffold)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def save_flat_state(path: str, ts: FlatTrainState) -> None:
    """Alias used by the pipeline's stage-resume (scaffold snapshot)."""
    save_checkpoint(path, ts)


def load_flat_state(path: str) -> FlatTrainState:
    ts = load_checkpoint(path)
    assert isinstance(ts, FlatTrainState), type(ts)
    return ts


def load_checkpoint(path: str) -> Union[FlatTrainState, PostTrainState]:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))

    g = GaussianState(
        xyz=jnp.asarray(z["g_xyz"]), f_dc=jnp.asarray(z["g_f_dc"]),
        f_rest=jnp.asarray(z["g_f_rest"]),
        log_scale=jnp.asarray(z["g_log_scale"]),
        quat=jnp.asarray(z["g_quat"]),
        opacity_logit=jnp.asarray(z["g_opacity_logit"]),
        exposure=jnp.asarray(z["g_exposure"]),
        alive=jnp.asarray(z["g_alive"]), nodes=jnp.asarray(z["g_nodes"]),
        n_skybox=int(meta["n_skybox"]),
        n_scaffold=int(meta.get("n_scaffold", 0)))
    adam = optim.AdamState(
        m={k: jnp.asarray(z[f"m_{k}"]) for k in _PARAM_KEYS},
        v={k: jnp.asarray(z[f"v_{k}"]) for k in _PARAM_KEYS},
        step=jnp.asarray(z["adam_step"]))
    step = jnp.asarray(z["step"])

    if meta["kind"] == "FlatTrainState":
        return FlatTrainState(
            gaussians=g, adam=adam,
            xyz_grad_accum=jnp.asarray(z["xyz_grad_accum"]),
            denom=jnp.asarray(z["denom"]),
            max_radii=jnp.asarray(z["max_radii"]), step=step)
    return PostTrainState(gaussians=g, adam=adam, step=step)
