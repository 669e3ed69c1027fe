"""Multi-host distributed runtime: jax.distributed + process-spanning mesh.

The reference's multi-GPU story is SLURM job-per-chunk with `sacct` polling
and filesystem hand-off (scripts/full_train.py:79-236). The TPU-native
replacement is ONE SPMD program across hosts:

  * every process calls :func:`initialize` (jax.distributed) — on TPU pods
    the coordinator/process topology comes from the environment, on CPU/GPU
    test rigs it is passed explicitly;
  * :func:`make_global_mesh` lays the GLOBAL device set onto a
    ``(data, gauss)`` mesh — `data` spans processes (DCN between hosts, ICI
    within), `gauss` stays intra-host so the per-Gaussian all-gather before
    binning rides ICI;
  * per-host input views become one global array via
    :func:`global_view_batch` (jax.make_array_from_process_local_data), and
    the existing dp/chunk-parallel steps run unchanged — XLA inserts the
    cross-host psum for gradient reduction.

Chunk-parallel training maps each host's chunks onto its local `data`
slices: zero cross-chunk traffic during training, exactly the reference's
job-array semantics but without processes-as-scheduler.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Start the jax.distributed runtime (idempotent).

    With no args, relies on the TPU pod environment (JAX auto-detects the
    coordinator on Cloud TPU). Explicit args support CPU/GPU test rigs:
    e.g. ``initialize("127.0.0.1:29500", 2, rank)``.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(n_data: Optional[int] = None, n_gauss: int = 1) -> Mesh:
    """(data, gauss) mesh over ALL processes' devices.

    Device order is process-major, so contiguous `data` slices map to
    whole hosts: a host's local batch lands on its own devices and the
    gradient psum is the only DCN traffic.
    """
    devs = jax.devices()
    if n_data is None:
        n_data = len(devs) // n_gauss
    assert n_data * n_gauss == len(devs), (n_data, n_gauss, len(devs))
    arr = np.asarray(devs).reshape(n_data, n_gauss)
    return Mesh(arr, ("data", "gauss"))


def global_view_batch(mesh: Mesh, local_arrays) -> "jax.Array":
    """Per-process view batch [B_local, ...] -> one global array sharded
    over `data` ([B_global, ...]). Equivalent of each SLURM job reading its
    own chunk's images."""
    x = np.asarray(local_arrays)
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), x)


def replicate(mesh: Mesh, x) -> "jax.Array":
    """Replicate a host-local array across every device of the mesh."""
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), x)


def process_chunk_assignment(n_chunks: int) -> list:
    """Which chunk indices this process trains (block partition — the
    reference's job array, scripts/full_train.py:161-214)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_chunks // n)
    return list(range(p * per, min((p + 1) * per, n_chunks)))
