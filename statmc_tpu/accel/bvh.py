"""Binned-SAH BVH build + skip-link flattening.

The reference's BVHAccel (src/accelerators/bvh.cpp:183) builds an SAH
tree and flattens it into 32-byte LinearBVHNodes traversed with a
per-thread 64-entry stack (bvh.cpp:707+).  A per-lane traversal stack is
hostile to a vector machine, so we flatten depth-first with *skip links*
instead: every node stores the index of the node to visit when its
subtree is skipped (miss) and the next DFS node on hit is implicit
(node+1).  Traversal state is then a single int per lane and the whole
wavefront walks the tree in a lax.while_loop (accel/traverse.py).

Build is numpy (host-side, like the reference's CPU build); a native C++
builder can swap in behind the same flat-array contract for huge scenes.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LEAF_SIZE = 4  # max primitives per leaf (padded to exactly LEAF_SIZE slots)
N_BUCKETS = 12  # SAH bins (bvh.cpp uses 12 buckets too)


@dataclass
class FlatBVH:
    """Flat skip-link BVH over triangle ids.

    node_lo/node_hi: [N,3] AABBs
    node_miss:       [N] node index when bbox misses (or -1 = done)
    node_leaf_off:   [N] index into prim_ids*LEAF_SIZE slots, or -1 internal
    prim_slots:      [N_leafslots] triangle ids, -1 padded, LEAF_SIZE/leaf
    """
    node_lo: np.ndarray
    node_hi: np.ndarray
    node_miss: np.ndarray
    node_leaf_off: np.ndarray
    prim_slots: np.ndarray

    def to_device(self):
        import jax.numpy as jnp

        return FlatBVH(
            jnp.asarray(self.node_lo),
            jnp.asarray(self.node_hi),
            jnp.asarray(self.node_miss),
            jnp.asarray(self.node_leaf_off),
            jnp.asarray(self.prim_slots),
        )


class _Node:
    __slots__ = ("lo", "hi", "left", "right", "prims")

    def __init__(self, lo, hi, left=None, right=None, prims=None):
        self.lo, self.hi = lo, hi
        self.left, self.right, self.prims = left, right, prims


def build_bvh(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              use_native: bool = True, leaf_size: int = LEAF_SIZE) -> FlatBVH:
    """Build over triangles given as (p0, e1, e2) arrays [T,3].

    Dispatches to the C++ builder (statmc_tpu/native) when available;
    the numpy path below is the reference implementation and fallback.
    """
    T = p0.shape[0]
    global LEAF_SIZE
    old_leaf = LEAF_SIZE
    LEAF_SIZE = leaf_size
    try:
        if use_native and T > 0:
            from ..native import build_bvh_native

            res = build_bvh_native(p0, e1, e2, leaf_size)
            if res is not None:
                lo, hi, miss, leaf, slots = res
                return FlatBVH(lo, hi, miss, leaf, slots)
        return _build_python(p0, e1, e2)
    finally:
        LEAF_SIZE = old_leaf


def _build_python(p0, e1, e2) -> FlatBVH:
    T = p0.shape[0]
    if T == 0:
        return FlatBVH(
            np.zeros((1, 3), np.float32),
            np.zeros((1, 3), np.float32),
            np.array([-1], np.int32),
            np.array([0], np.int32),
            -np.ones((LEAF_SIZE,), np.int32),
        )
    v0, v1, v2 = p0, p0 + e1, p0 + e2
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cent = 0.5 * (lo + hi)

    root = _build(np.arange(T), lo, hi, cent)
    return _flatten(root)


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def _build(ids, lo, hi, cent) -> _Node:
    node_lo = lo[ids].min(axis=0)
    node_hi = hi[ids].max(axis=0)
    n = len(ids)
    if n <= LEAF_SIZE:
        return _Node(node_lo, node_hi, prims=ids)

    c = cent[ids]
    clo, chi = c.min(axis=0), c.max(axis=0)
    axis = int(np.argmax(chi - clo))
    extent = chi[axis] - clo[axis]
    if extent < 1e-12:
        mid = n // 2
        order = np.argsort(c[:, axis], kind="stable")
        return _Node(
            node_lo, node_hi,
            left=_build(ids[order[:mid]], lo, hi, cent),
            right=_build(ids[order[mid:]], lo, hi, cent),
        )

    # Binned SAH along the widest centroid axis.
    b = np.minimum(
        ((c[:, axis] - clo[axis]) / extent * N_BUCKETS).astype(np.int32),
        N_BUCKETS - 1,
    )
    costs = np.full(N_BUCKETS - 1, np.inf)
    for split in range(N_BUCKETS - 1):
        lmask = b <= split
        nl = int(lmask.sum())
        nr = n - nl
        if nl == 0 or nr == 0:
            continue
        la = _surface_area(lo[ids[lmask]].min(axis=0),
                           hi[ids[lmask]].max(axis=0))
        ra = _surface_area(lo[ids[~lmask]].min(axis=0),
                           hi[ids[~lmask]].max(axis=0))
        costs[split] = la * nl + ra * nr
    best = int(np.argmin(costs))
    if not np.isfinite(costs[best]):
        mid = n // 2
        order = np.argsort(c[:, axis], kind="stable")
        return _Node(
            node_lo, node_hi,
            left=_build(ids[order[:mid]], lo, hi, cent),
            right=_build(ids[order[mid:]], lo, hi, cent),
        )
    lmask = b <= best
    return _Node(
        node_lo, node_hi,
        left=_build(ids[lmask], lo, hi, cent),
        right=_build(ids[~lmask], lo, hi, cent),
    )


def _flatten(root: _Node) -> FlatBVH:
    nodes_lo, nodes_hi, miss, leaf_off = [], [], [], []
    prim_slots: list[int] = []

    def size(node: _Node) -> int:
        if node.prims is not None:
            return 1
        return 1 + size(node.left) + size(node.right)

    def emit(node: _Node, miss_idx: int) -> int:
        idx = len(nodes_lo)
        nodes_lo.append(node.lo)
        nodes_hi.append(node.hi)
        miss.append(miss_idx)
        if node.prims is not None:
            off = len(prim_slots)
            leaf_off.append(off)
            slots = list(node.prims) + [-1] * (LEAF_SIZE - len(node.prims))
            prim_slots.extend(slots[:LEAF_SIZE])
        else:
            leaf_off.append(-1)
            # DFS layout: left subtree at idx+1, right subtree right after
            # it.  The left subtree's miss link (at every level that would
            # fall off its right edge) is the right subtree's root; the
            # right subtree falls through to this node's miss.
            right_pos = idx + 1 + size(node.left)
            emit(node.left, right_pos)
            emit(node.right, miss_idx)
        return idx

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(1_000_000)
    try:
        emit(root, -1)
    finally:
        sys.setrecursionlimit(old)

    return FlatBVH(
        np.asarray(nodes_lo, np.float32),
        np.asarray(nodes_hi, np.float32),
        np.asarray(miss, np.int32),
        np.asarray(leaf_off, np.int32),
        np.asarray(prim_slots, np.int32) if prim_slots
        else -np.ones((LEAF_SIZE,), np.int32),
    )
