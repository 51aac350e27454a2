"""Stackless skip-link BVH traversal for ray wavefronts.

Replaces the reference's per-thread stack walk
(src/accelerators/bvh.cpp:707+, BVHAccel::Intersect) with a masked
whole-wavefront lax.while_loop: every lane carries one int node cursor;
each step gathers one node per lane, tests its AABB, tests the
LEAF_SIZE padded primitive slots when it is a leaf, and advances to
node+1 (hit, internal) or the node's miss link.  Lanes finish
independently; the loop ends when all cursors reach -1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as cm
from .bvh import LEAF_SIZE, FlatBVH

Array = jax.Array


def _slab_test(lo, hi, o, inv_d, t_max):
    """Ray-AABB slab test; returns hit bool. lo/hi/o/inv_d: [R,3]."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # Conservative robustness factor (pbrt gamma(3)-style scaling).
    tfar = tfar * 1.0001
    return (tnear <= tfar) & (tfar > 0.0) & (tnear < t_max)


def intersect_bvh(bvh: FlatBVH, tri_p0, tri_e1, tri_e2, o: Array, d: Array,
                  t_max: Array, any_hit: bool = False):
    """Closest-hit (or any-hit) of rays against the triangle BVH.

    Returns (t_best [R], tri_idx [R] (-1 miss), hit_any [R]).
    """
    R = o.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)

    def tri_test(tri_ids, o, d, t_best):
        """Test LEAF_SIZE gathered triangles per lane: [R,K]."""
        valid = tri_ids >= 0
        tid = jnp.maximum(tri_ids, 0)
        p0 = tri_p0[tid]  # [R,K,3]
        e1 = tri_e1[tid]
        e2 = tri_e2[tid]
        dd = d[:, None, :]
        oo = o[:, None, :]
        pvec = jnp.cross(dd, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = oo - p0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(dd * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        ok = (
            valid & (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 1e-4) & (t < t_best[:, None])
        )
        t = jnp.where(ok, t, cm.INF)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        idj = jnp.take_along_axis(tid, j[:, None], axis=-1)[:, 0]
        found = tj < t_best
        return tj, idj, found

    def cond(state):
        node, _, _, done = state
        return jnp.any(~done)

    def body(state):
        node, t_best, best_id, done = state
        nid = jnp.maximum(node, 0)
        lo = bvh.node_lo[nid]
        hi = bvh.node_hi[nid]
        miss = bvh.node_miss[nid]
        leaf = bvh.node_leaf_off[nid]
        live = ~done

        bbox_hit = _slab_test(lo, hi, o, inv_d, t_best) & live
        is_leaf = (leaf >= 0) & bbox_hit

        # Leaf primitive tests (masked; lanes at internal nodes waste the
        # gather but stay converged -- acceptable at LEAF_SIZE=4).
        slot0 = jnp.maximum(leaf, 0)
        tri_ids = bvh.prim_slots[
            slot0[:, None] + jnp.arange(LEAF_SIZE)[None, :]
        ]
        tri_ids = jnp.where(is_leaf[:, None], tri_ids, -1)
        tj, idj, found = tri_test(tri_ids, o, d, t_best)
        t_best = jnp.where(found, tj, t_best)
        best_id = jnp.where(found, idj, best_id)

        # Advance: internal+hit -> node+1; otherwise -> miss link.
        internal_hit = bbox_hit & (leaf < 0)
        nxt = jnp.where(internal_hit, nid + 1, miss)
        node = jnp.where(live, nxt, node)
        done = done | (node < 0)
        if any_hit:
            done = done | (best_id >= 0)
        return node, t_best, best_id, done

    node0 = jnp.zeros((R,), jnp.int32)
    best0 = -jnp.ones((R,), jnp.int32)
    done0 = jnp.zeros((R,), bool)
    _, t_best, best_id, _ = jax.lax.while_loop(
        cond, body, (node0, t_max, best0, done0)
    )
    return t_best, best_id, best_id >= 0
