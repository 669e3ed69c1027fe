"""Hierarchy binary formats: the fork's `.dhier` and the upstream `.hier`.

Byte-compatible with the reference C++ writer/loader so models interoperate
with the SIBR viewer and the reference tools:

`.dhier` (hierarchy_writer.cpp:122-168, loader :133-200):
    int32 G | int32 sh_degree
    pos f32[G,3] | rot f32[G,4] | logscale f32[G,3] | opacity f32[G]
    shs f32[G, 3*(sh_degree+1)^2]
    int32 N | HierarchyNode int32[N,6]
        (depth, parent, child_count, first_child, next_sibling,
         max_side_length — types.h:60-79)

`.hier` (hierarchy_writer.cpp:27-119, loader hierarchy_loader.cpp:25-130):
    int32 P (negative => f16-compressed variant)
    pos f32[P,3] | rot f32[P,4] | logscale f32[P,3] | opacity f32[P]
    shs f32[P,48]
    int32 N | Node int32[N,7]
        (depth, parent, start, count_leafs, count_merged, start_children,
         count_children — types.h:83-92)
    Box f32[N,8]  (min xyz + w, max xyz + w; w = longest AABB side)
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class DHier(NamedTuple):
    sh_degree: int
    pos: np.ndarray        # [G,3] f32
    quat: np.ndarray       # [G,4]
    log_scale: np.ndarray  # [G,3]
    opacity: np.ndarray    # [G] (raw, as stored)
    shs: np.ndarray        # [G,K,3]
    nodes: np.ndarray      # [N,6] int32 (model node-table order)


def save_dhier(path: str, h: DHier) -> None:
    g = h.pos.shape[0]
    k = (h.sh_degree + 1) ** 2
    assert h.shs.shape[1] == k, (h.shs.shape, k)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", g, h.sh_degree))
        f.write(h.pos.astype("<f4").tobytes())
        f.write(h.quat.astype("<f4").tobytes())
        f.write(h.log_scale.astype("<f4").tobytes())
        f.write(h.opacity.astype("<f4").tobytes())
        f.write(h.shs.astype("<f4").reshape(g, -1).tobytes())
        f.write(struct.pack("<i", h.nodes.shape[0]))
        f.write(h.nodes.astype("<i4").tobytes())


def load_dhier(path: str) -> DHier:
    with open(path, "rb") as f:
        raw = f.read()
    off = 0

    def take(dtype, shape):
        nonlocal off
        a = np.frombuffer(raw, dtype=dtype, count=int(np.prod(shape)),
                          offset=off).reshape(shape)
        off += a.nbytes
        return np.ascontiguousarray(a)

    g, sh_degree = struct.unpack_from("<ii", raw, 0)
    off = 8
    pos = take("<f4", (g, 3))
    quat = take("<f4", (g, 4))
    log_scale = take("<f4", (g, 3))
    opacity = take("<f4", (g,))
    k = (sh_degree + 1) ** 2
    shs = take("<f4", (g, k, 3))
    (n,) = struct.unpack_from("<i", raw, off)
    off += 4
    nodes = take("<i4", (n, 6))
    return DHier(sh_degree=sh_degree, pos=pos, quat=quat,
                 log_scale=log_scale, opacity=opacity, shs=shs, nodes=nodes)


def save_gdf(path: str, nodes: np.ndarray, max_depth: int = 15) -> None:
    """Hierarchy graph dump in the reference's `.gdf` format
    (writer.cpp::writeHierarchyGDF + writeRec:294-340, emitted by the
    creator at mainHierarchyCreator.cpp:184 with max_depth=15).

    Replicates the reference algorithm EXACTLY — including its
    idiosyncratic labelling, where each node's printed label is the shared
    edge counter's value at entry (so a node whose elder sibling subtree
    advanced the counter gets a label unrelated to its table index, and
    leaf labels repeat). Byte-equality with the reference output is
    enforced by tests/test_oracle_parity.py against a committed fixture.

    ``nodes`` is the model node-table layout [N,6]
    (depth, parent, child_count, first_child, next_sibling, aux).
    """
    import sys

    n = nodes.shape[0]
    parent = nodes[:, 1]
    children: list = [[] for _ in range(n)]
    # preorder table: children blocks are pushed in sibling order, so
    # grouping by parent in increasing index order preserves child order
    for i in range(1, n):
        p = int(parent[i])
        if p >= 0:
            children[p].append(i)

    lines = ["nodedef>name VARCHAR \n"]
    edges: list = []
    counter = [0]

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, n + 100))
    try:
        def rec(i: int, parent_label: int, depth: int) -> None:
            lines.append(f"{counter[0]}\n")
            if not children[i] or depth >= max_depth:
                return
            for c in children[i]:
                edges.append((counter[0], parent_label))
                cur = counter[0]
                counter[0] += 1
                rec(c, cur, depth + 1)

        rec(0, -1, 0)
    finally:
        sys.setrecursionlimit(old_limit)

    lines.append("edgedef>node1 VARCHAR,node2 VARCHAR\n")
    lines.extend(f"{a},{b}\n" for a, b in edges)
    with open(path, "w", newline="") as f:
        f.write("".join(lines))


class UpstreamHier(NamedTuple):
    pos: np.ndarray        # [P,3]
    quat: np.ndarray       # [P,4]
    log_scale: np.ndarray  # [P,3]
    opacity: np.ndarray    # [P]
    shs: np.ndarray        # [P,16,3]
    nodes: np.ndarray      # [N,7] int32 upstream Node layout
    boxes: np.ndarray      # [N,2,4] f32 (min4, max4)


def save_hier(path: str, h: UpstreamHier, compressed: bool = False) -> None:
    p = h.pos.shape[0]
    n = h.nodes.shape[0]
    with open(path, "wb") as f:
        if not compressed:
            f.write(struct.pack("<i", p))
            f.write(h.pos.astype("<f4").tobytes())
            f.write(h.quat.astype("<f4").tobytes())
            f.write(h.log_scale.astype("<f4").tobytes())
            f.write(h.opacity.astype("<f4").tobytes())
            f.write(h.shs.astype("<f4").reshape(p, -1).tobytes())
            f.write(struct.pack("<i", n))
            f.write(h.nodes.astype("<i4").tobytes())
            f.write(h.boxes.astype("<f4").tobytes())
        else:
            f.write(struct.pack("<i", -p))
            f.write(h.pos.astype("<f4").tobytes())
            f.write(h.quat.astype("<f2").tobytes())
            f.write(h.log_scale.astype("<f2").tobytes())
            f.write(h.opacity.astype("<f2").tobytes())
            f.write(h.shs.astype("<f2").reshape(p, -1).tobytes())
            f.write(struct.pack("<i", n))
            # HalfNode: int parent, start, start_children + short dccc[4]
            hn = np.zeros(n, dtype=[("parent", "<i4"), ("start", "<i4"),
                                    ("start_children", "<i4"),
                                    ("dccc", "<i2", (4,))])
            hn["parent"] = h.nodes[:, 1]
            hn["start"] = h.nodes[:, 2]
            hn["start_children"] = h.nodes[:, 5]
            # the short fields overflow silently under numpy; the reference
            # writer throws "Would lose information!" past 32000
            # (hierarchy_writer.cpp:27-119) — the root's count_leafs equals
            # the total leaf count, so any multi-32k-leaf scene trips this
            for col in (0, 6, 3, 4):
                if np.abs(h.nodes[:, col]).max(initial=0) > 32000:
                    raise ValueError(
                        "compressed .hier cannot hold node counts > 32000 "
                        f"(column {col}); write uncompressed instead")
            hn["dccc"][:, 0] = h.nodes[:, 0]
            hn["dccc"][:, 1] = h.nodes[:, 6]
            hn["dccc"][:, 2] = h.nodes[:, 3]
            hn["dccc"][:, 3] = h.nodes[:, 4]
            f.write(hn.tobytes())
            f.write(h.boxes.astype("<f2").tobytes())


def load_hier(path: str) -> UpstreamHier:
    with open(path, "rb") as f:
        raw = f.read()
    (p,) = struct.unpack_from("<i", raw, 0)
    off = 4
    compressed = p < 0
    p = abs(p)

    def take(dtype, shape):
        nonlocal off
        a = np.frombuffer(raw, dtype=dtype, count=int(np.prod(shape)),
                          offset=off).reshape(shape)
        off += a.nbytes
        return np.ascontiguousarray(a)

    if not compressed:
        pos = take("<f4", (p, 3))
        quat = take("<f4", (p, 4))
        log_scale = take("<f4", (p, 3))
        opacity = take("<f4", (p,))
        shs = take("<f4", (p, 16, 3))
        (n,) = struct.unpack_from("<i", raw, off)
        off += 4
        nodes = take("<i4", (n, 7))
        boxes = take("<f4", (n, 2, 4))
    else:
        pos = take("<f4", (p, 3))
        quat = take("<f2", (p, 4)).astype(np.float32)
        log_scale = take("<f2", (p, 3)).astype(np.float32)
        opacity = take("<f2", (p,)).astype(np.float32)
        shs = take("<f2", (p, 16, 3)).astype(np.float32)
        (n,) = struct.unpack_from("<i", raw, off)
        off += 4
        hn = np.frombuffer(raw, dtype=[("parent", "<i4"), ("start", "<i4"),
                                       ("start_children", "<i4"),
                                       ("dccc", "<i2", (4,))],
                           count=n, offset=off)
        off += hn.nbytes
        nodes = np.zeros((n, 7), np.int32)
        nodes[:, 0] = hn["dccc"][:, 0]
        nodes[:, 1] = hn["parent"]
        nodes[:, 2] = hn["start"]
        nodes[:, 3] = hn["dccc"][:, 2]
        nodes[:, 4] = hn["dccc"][:, 3]
        nodes[:, 5] = hn["start_children"]
        nodes[:, 6] = hn["dccc"][:, 1]
        boxes = take("<f2", (n, 2, 4)).astype(np.float32)
    return UpstreamHier(pos=pos, quat=quat, log_scale=log_scale,
                        opacity=opacity, shs=shs, nodes=nodes, boxes=boxes)
