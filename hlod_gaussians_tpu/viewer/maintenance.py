"""Viewer runtime maintenance: incremental cuts + budget-regulated streaming.

TPU re-design of the SIBR viewer's runtime kernels:

* ``incremental_cut_step`` — one split/collapse pass per frame over the
  persistent active-node mask (the role of ``changeNodesOnce`` /
  ``changeToSizeStep``, runtime_switching.cu:236-491). Starting from any
  proper hierarchy cut, repeated steps converge to the full granularity cut
  of the current camera; each step only moves the cut by one level, which
  bounds the per-frame working-set delta.
* ``ActiveRowCache`` — the VRAM-budget streaming of
  ``runtime_maintenance.cu:39-387`` re-imagined for host-resident
  parameters: a fixed ``budget`` of device-resident row slots; per frame
  only the NEWLY activated rows are fetched host->device and collapsed rows'
  slots are recycled, so transfer bytes scale with the cut delta rather
  than the cut size.
* ``BudgetController`` — the viewer's auto-regulating granularity
  (README.md:233-256): raises the target size when the active set
  approaches the budget, relaxes it when there is headroom.

On TPU the per-frame mask arithmetic is O(total nodes) vectorized ops
(cheap, bandwidth-bound); the quantity that actually scales with the delta
is the host<->device traffic, which dominates out-of-core viewing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.hierarchy.cut import node_size_dynamic
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_PARENT)


@jax.jit
def incremental_cut_step(
    nodes: jnp.ndarray,      # [C,6]
    pos: jnp.ndarray,        # [C,3]
    max_scale: jnp.ndarray,  # [C]
    alive: jnp.ndarray,      # [C]
    active: jnp.ndarray,     # [C] current cut mask
    viewpoint: jnp.ndarray,  # [3]
    target_size,
):
    """One split/collapse pass. Returns (new_active, n_split, n_collapse).

    Split: an active interior node that projects larger than the target is
    replaced by its children. Collapse: a sibling group is replaced by its
    parent when the parent projects smaller than the target AND every
    child of that parent is itself active (changeNodesOnce's sibling-group
    moves, runtime_switching.cu:236-292). The all-children-active guard is
    what keeps simultaneous collapses at DIFFERENT levels proper: without
    it, zooming out could activate an ancestor while a deeper descendant
    group collapses into its own parent, double-rendering the subtree.
    Collapse wins over split so one step maps proper cuts to proper cuts;
    multi-level coarsening settles over successive frames.
    """
    c = nodes.shape[0]
    parent = nodes[:, NODE_PARENT]
    has_parent = parent >= 0
    parent_c = jnp.clip(parent, 0, c - 1)
    real = alive & (nodes[:, NODE_DEPTH] >= 0)
    is_leaf = nodes[:, NODE_CHILD_COUNT] == 0

    size = node_size_dynamic(pos, max_scale, viewpoint)
    parent_size = jnp.where(has_parent, size[parent_c], jnp.inf)

    # a parent is collapsible only if ALL its children are in the cut
    act_i = active.astype(jnp.int32)
    all_child_active = jnp.ones((c,), jnp.int32).at[
        jnp.where(has_parent & real, parent_c, c)].min(act_i, mode="drop")
    collapse = (active & has_parent & (parent_size < target_size) & real
                & (all_child_active[parent_c] > 0))
    split = active & (size >= target_size) & ~is_leaf & ~collapse & real

    # children of split nodes activate (one row per node: child iff its
    # parent is in the split set)
    child_of_split = has_parent & split[parent_c] & real
    # parents of collapsing children activate
    parent_activate = jnp.zeros((c,), bool).at[
        jnp.where(collapse, parent_c, c - 1)].max(collapse)
    # don't double-activate the parent's own potential re-split this frame
    new_active = (active & ~split & ~collapse) | child_of_split \
        | parent_activate
    return new_active, jnp.sum(split), jnp.sum(collapse)


def initial_cut(nodes: np.ndarray, alive: np.ndarray) -> np.ndarray:
    """Coarsest proper cut: the root(s)."""
    nodes = np.asarray(nodes)
    real = np.asarray(alive) & (nodes[:, NODE_DEPTH] >= 0)
    mask = np.zeros(nodes.shape[0], bool)
    mask[real & (nodes[:, NODE_PARENT] == -1)] = True
    return mask


@dataclasses.dataclass
class BudgetController:
    """Auto-regulating granularity under a node budget (the SIBR viewer's
    VRAM budget behavior, README.md:233-235)."""

    budget: int
    target: float = 1e-3
    grow: float = 1.5
    shrink: float = 1.15
    high_water: float = 0.9
    low_water: float = 0.4
    min_target: float = 1e-7

    def update(self, n_active: int) -> float:
        if n_active > self.high_water * self.budget:
            self.target *= self.grow          # coarsen
        elif n_active < self.low_water * self.budget:
            self.target = max(self.target / self.shrink, self.min_target)
        return self.target


class ActiveRowCache:
    """Device-resident row slots for the active set, fed by deltas.

    Host master arrays (numpy) hold every node's parameters; the cache owns
    ``budget`` device slots. `update(active_mask)` fetches ONLY rows that
    became active and frees slots of rows that left the set — the
    fixed-capacity re-design of runtime_maintenance.cu's rearrange/compact
    cycle (device buffers never reallocate; slots recycle).
    """

    def __init__(self, host_arrays: Dict[str, np.ndarray], budget: int):
        self.host = host_arrays
        self.budget = budget
        cap = next(iter(host_arrays.values())).shape[0]
        self.cap = cap
        self.slot_of_row = np.full(cap, -1, np.int32)
        self.row_of_slot = np.full(budget, -1, np.int32)
        self.free = list(range(budget - 1, -1, -1))
        self.device: Dict[str, jnp.ndarray] = {
            k: jnp.zeros((budget,) + v.shape[1:], v.dtype)
            for k, v in host_arrays.items()}
        self.slot_valid = jnp.zeros((budget,), bool)
        self.last_fetch_rows = 0

    def update(self, active_mask: np.ndarray) -> Tuple[int, int]:
        """Sync the cache to the new active set.

        Returns (n_fetched, n_evicted); device transfer is one gather of
        just the fetched rows per array."""
        # vectorized delta bookkeeping: Python set/loop bookkeeping cost
        # tens of ms per frame at 100k-row cuts, defeating the cache
        resident_mask = self.slot_of_row >= 0
        evict_rows = np.where(resident_mask & ~active_mask)[0]
        need_rows = np.where(active_mask & ~resident_mask)[0]
        # validate the budget BEFORE mutating any map: raising after the
        # evictions were applied would leave slot_valid stale while the
        # caller recovers (coarsen + retry), rendering evicted rows
        if len(need_rows) > len(self.free) + len(evict_rows):
            raise RuntimeError(
                f"active set {int(active_mask.sum())} exceeds budget "
                f"{self.budget}")
        ev_slots = self.slot_of_row[evict_rows]
        self.slot_of_row[evict_rows] = -1
        self.row_of_slot[ev_slots] = -1
        self.free.extend(int(s) for s in ev_slots)

        rows = need_rows.astype(np.int32)
        slots = np.asarray([self.free.pop() for _ in rows], np.int32)
        if len(rows):
            self.slot_of_row[rows] = slots
            self.row_of_slot[slots] = rows
            sl = jnp.asarray(slots)
            for k, h in self.host.items():
                self.device[k] = self.device[k].at[sl].set(
                    jnp.asarray(h[rows]))
        valid = np.zeros(self.budget, bool)
        valid[self.row_of_slot >= 0] = True
        self.slot_valid = jnp.asarray(valid)
        self.last_fetch_rows = len(rows)
        return len(rows), len(evict_rows)

    def device_rows(self) -> Dict[str, jnp.ndarray]:
        return self.device

    def slot_rows(self) -> np.ndarray:
        """row index per slot (-1 = free)."""
        return self.row_of_slot
