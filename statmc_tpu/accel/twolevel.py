"""Two-level fused traversal: worklist-driven MXU intersection at scale.

Extends the fused bilinear-form intersector (accel/fused.py) past its
VMEM cap (FUSED_MAX_TRIS) to 100k+ triangle scenes -- the TPU answer to
the reference's full BVH walk over large scenes
(/root/reference/src/accelerators/bvh.cpp:707+).

Shape of the algorithm (no pointer chasing anywhere):

1. BUILD: triangles are Morton-ordered and packed into TRI_TILE-sized
   tiles with conservative AABBs -- the same packing as FusedTris, but
   the edge/plane tables live in HBM, not VMEM.
2. WORKLIST (XLA pre-pass, per dispatch): every ray slab-tests every
   tile AABB ([Rt, ntt] VPU work, chunked per ray block); per 512-ray
   block the tiles any ray can hit are sorted front-to-back by the
   block's minimum entry distance.  This replaces the per-ray BVH
   descent with one data-parallel cull + sort.
3. KERNEL (Pallas): each ray block walks ONLY its worklist.  Tile
   tables are DMA'd HBM->VMEM on demand (double-buffered: tile k+1's
   copy overlaps tile k's matmuls); per tile the same two K=8 dots +
   VPU epilogue as the fused kernel.  The walk early-outs when every
   ray's best hit is nearer than the next tile's entry distance
   (front-to-back order makes this the BVH's t-pruning, hoisted to
   block granularity) -- for any-hit (shadow) rays it stops as soon as
   every live ray is occluded.

Results are bit-identical to the dense fused intersector: the worklist
is conservative (a tile is only skipped when NO ray in the block can
hit its AABB closer than t_max), and the epilogue math is shared.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused import (
    _K, _PRECISION, RAY_TILE, TRI_TILE, FusedTris, _epilogue,
    ray_features,
)


def _dot_t(a, b):
    """[K, T]^T @ [K, R] -> [T, R] (contraction over the sublane axis;
    the MXU form that pairs with lane-major triangle tables)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )

# Worklist SMEM budget: tile ids + tnear per block.  4096 tiles covers
# 1M triangles; larger scenes would chunk the tile axis.
MAX_TILES = 4096


class TwoLevelTris(NamedTuple):
    """FusedTris packing with HBM-resident tables + worklist dispatch.

    Tables are stored [ntt, c, K, TRI_TILE] -- the triangle axis on the
    128-lane minor dim -- because Mosaic DMA slices of HBM tensors must
    be lane-aligned in their minor dimension (a [.., TRI_TILE, K=8]
    layout cannot be sliced).  The kernel dots contract over the K
    sublane axis instead: w_c [Tt, Rt] = tab_c [K, Tt]^T @ ray [K, Rt].
    """
    edge_table: Any  # [ntt, 3, K, TRI_TILE]
    plane_table: Any  # [ntt, 2, K, TRI_TILE]
    tile_bounds: Any  # [ntt, 8] lo3 hi3 pad2
    perm: Any
    n_tris: int
    world_lo: Any  # [3] scene AABB (ray-sort quantization)
    world_ext: Any  # [3]

    @staticmethod
    def from_tris(p0, e1, e2) -> "TwoLevelTris":
        ft = FusedTris.from_tris(p0, e1, e2)
        assert ft.edge_table.shape[0] <= MAX_TILES, (
            f"{ft.edge_table.shape[0]} tiles > MAX_TILES; add tile-axis "
            "chunking for scenes beyond ~1M triangles")
        et = np.ascontiguousarray(
            np.asarray(ft.edge_table).transpose(0, 1, 3, 2))
        pt = np.ascontiguousarray(
            np.asarray(ft.plane_table).transpose(0, 1, 3, 2))
        tb = np.asarray(ft.tile_bounds)
        real = tb[:, 0] < 1e29
        lo = (tb[real, 0:3].min(axis=0) if real.any()
              else np.zeros(3, np.float32))
        hi = (tb[real, 3:6].max(axis=0) if real.any()
              else np.ones(3, np.float32))
        return TwoLevelTris(
            edge_table=jnp.asarray(et),
            plane_table=jnp.asarray(pt),
            tile_bounds=ft.tile_bounds,
            perm=ft.perm,
            n_tris=ft.n_tris,
            world_lo=jnp.asarray(lo.astype(np.float32)),
            world_ext=jnp.asarray(
                np.maximum(hi - lo, 1e-6).astype(np.float32)),
        )


def _block_worklists(tile_bounds: Any, o, d, t_max):
    """Per-512-ray-block candidate tile lists, front-to-back.

    Returns (order [G, ntt] int32, tnear [G, ntt] f32 (INF past count),
    count [G] int32).  A tile enters block g's list iff ANY ray of the
    block enters its AABB in front of the origin and closer than its
    t_max -- exactly the fused kernel's in-kernel cull (fused.py
    _tile_cull), hoisted out so the kernel can skip the tile's DMA too.
    """
    R = o.shape[0]
    G = R // RAY_TILE
    ntt = tile_bounds.shape[0]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                    jnp.where(d < 0, -1e12, 1e12))
    lo = tile_bounds[:, 0:3]
    hi = tile_bounds[:, 3:6]

    def per_block(args):
        ob, invb, tmb = args  # [Rt,3], [Rt,3], [Rt]
        t0 = (lo[None] - ob[:, None]) * invb[:, None]  # [Rt, ntt, 3]
        t1 = (hi[None] - ob[:, None]) * invb[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        vote = (tn <= tf * 1.0001) & (tf > 0) & (tn < tmb[:, None])
        tnear_blk = jnp.min(jnp.where(vote, tn, jnp.float32(1e30)), axis=0)
        active = jnp.any(vote, axis=0)
        key = jnp.where(active, tnear_blk, jnp.float32(1e30))
        order = jnp.argsort(key).astype(jnp.int32)
        return order, jnp.sort(key), jnp.sum(active).astype(jnp.int32)

    return jax.lax.map(
        per_block,
        (o.reshape(G, RAY_TILE, 3), inv.reshape(G, RAY_TILE, 3),
         t_max.reshape(G, RAY_TILE)),
    )


def _kernel(count_ref, order_ref, tnear_ref, raye_ref, rayp_ref, tmax_ref,
            edge_hbm, plane_hbm, t_out, id_out,
            ebuf, pbuf, best_t_s, best_id_s, sem_e, sem_p,
            *, any_hit: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    raye = raye_ref[0]  # [K, Rt]
    rayp = rayp_ref[0]
    n = count_ref[g]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)
    best_t_s[:] = tmax_ref[0]
    best_id_s[:] = jnp.full((1, RAY_TILE), -1, jnp.int32)

    def copies(k, slot):
        tid = order_ref[g, k]
        return (
            pltpu.make_async_copy(edge_hbm.at[tid], ebuf.at[slot],
                                  sem_e.at[slot]),
            pltpu.make_async_copy(plane_hbm.at[tid], pbuf.at[slot],
                                  sem_p.at[slot]),
        )

    def live():
        alive = best_t_s[:] > 0  # dead lanes carry t_max = 0
        if any_hit:
            return jnp.any(alive & (best_id_s[:] < 0))
        return jnp.any(alive)

    @pl.when((n > 0) & live())
    def _():
        ce0, cp0 = copies(0, 0)
        ce0.start()
        cp0.start()

        def cond(k):
            # Front-to-back early-out: once every ray's best hit is
            # nearer than the next tile's entry distance nothing can
            # improve (the block-level version of BVH t-pruning).
            improvable = jnp.any(best_t_s[:] * 1.0001 > tnear_ref[g, k])
            if any_hit:
                improvable = improvable & jnp.any(
                    (best_id_s[:] < 0) & (tmax_ref[0] > 0))
            return (k < n) & improvable

        def body(k):
            slot = jax.lax.rem(k, 2)
            ce, cp = copies(k, slot)
            # Prefetch k+1 into the other buffer while k computes --
            # only when the walk is certain to consume it (cond is
            # re-evaluated after the epilogue shrinks best_t, so gate
            # on the pre-update state: tnear is sorted, making the
            # k+1 gate implied by k's).
            @pl.when(k + 1 < n)
            def _():
                ne, np_ = copies(k + 1, 1 - slot)
                ne.start()
                np_.start()

            ce.wait()
            cp.wait()
            e = ebuf[slot]  # [3, K, Tt]
            p = pbuf[slot]  # [2, K, Tt]
            w = jnp.concatenate(
                [_dot_t(e[c], raye) for c in range(3)], axis=0)
            nd = jnp.concatenate(
                [_dot_t(p[c], rayp) for c in range(2)], axis=0)
            bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                                order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
            best_t_s[:] = bt
            best_id_s[:] = bid
            return k + 1

        last = jax.lax.while_loop(cond, body, 0)

        # Drain the in-flight prefetch for step `last` (started by step
        # last-1's body) so no DMA outlives the kernel.
        @pl.when(last < n)
        def _():
            ce, cp = copies(last, jax.lax.rem(last, 2))
            ce.wait()
            cp.wait()

    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret"))
def _intersect_pallas2(edge_table, plane_table, order, tnear, count,
                       raye, rayp, t_max, any_hit: bool = False,
                       interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = raye.shape[0]
    ntt = edge_table.shape[0]
    kern = functools.partial(_kernel, any_hit=any_hit)
    # index_maps receive (grid idx, *scalar-prefetch refs).
    ray_spec = pl.BlockSpec((1, _K, RAY_TILE),
                            lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_TILE),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # count/order/tnear ride the scalar-prefetch path: full SMEM arrays
    # indexed by program_id (the worklists ARE scalars -- tile ids and
    # entry distances driving data-dependent DMAs).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            ray_spec, ray_spec, flat_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),  # edge table (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # plane table (HBM)
        ],
        out_specs=[flat_spec, flat_spec],
        scratch_shapes=[
            pltpu.VMEM((2, 3, _K, TRI_TILE), jnp.float32),
            pltpu.VMEM((2, 2, _K, TRI_TILE), jnp.float32),
            pltpu.VMEM((1, RAY_TILE), jnp.float32),
            pltpu.VMEM((1, RAY_TILE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(count, order, tnear, raye, rayp, t_max[:, None, :],
      edge_table, plane_table)


def _intersect_ref2(tl: TwoLevelTris, order, tnear, count, raye, rayp,
                    t_max):
    """XLA reference of the worklist walk (CPU backend + tests): per
    block, gather worklist tiles and run the shared dot+epilogue.  No
    early-out (it is an optimization, not a semantic)."""
    G = raye.shape[0]
    ntt = tl.edge_table.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)

    def per_block(args):
        orderb, countb, rayeb, raypb, tmb = args

        def body(carry, k):
            best_t, best_id = carry
            tid = orderb[k]
            eblk = jnp.take(tl.edge_table, tid, axis=0)  # [3, K, Tt]
            pblk = jnp.take(tl.plane_table, tid, axis=0)
            w = jnp.concatenate(
                [_dot_t(eblk[c], rayeb) for c in range(3)], axis=0)
            nd = jnp.concatenate(
                [_dot_t(pblk[c], raypb) for c in range(2)], axis=0)
            bt, bid = _epilogue(w, nd, best_t, best_id, tid * TRI_TILE,
                                TRI_TILE, iota)
            skip = k >= countb
            return (jnp.where(skip, best_t, bt),
                    jnp.where(skip, best_id, bid)), None

        init = (tmb[None, :], jnp.full((1, RAY_TILE), -1, jnp.int32))
        (bt, bid), _ = jax.lax.scan(body, init, jnp.arange(ntt))
        return bt[0], bid[0]

    return jax.lax.map(per_block, (order, count, raye, rayp, t_max))


def _spread5(x):
    """Interleave 5-bit ints with 2-bit gaps (Morton, 15-bit total)."""
    x = x & 0x1F
    x = (x | (x << 8)) & 0x100F
    x = (x | (x << 4)) & 0x10C3
    x = (x | (x << 2)) & 0x1249
    return x


def _ray_sort_keys(tl: TwoLevelTris, o, d, t_max):
    """Coherence keys: direction octant (3 bits) then origin Morton cell
    (15 bits).  Dead lanes (t_max <= 0) sort to the back so whole ray
    tiles of them skip every DMA (the kernel's live() gate)."""
    q = jnp.clip(((o - tl.world_lo) / tl.world_ext * 32.0)
                 .astype(jnp.int32), 0, 31)
    morton = (_spread5(q[:, 0]) | (_spread5(q[:, 1]) << 1)
              | (_spread5(q[:, 2]) << 2))
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    key = (octant << 15) | morton
    return jnp.where(t_max > 0, key, jnp.int32(1 << 20))


def intersect_twolevel(tl: TwoLevelTris, o, d, t_max,
                       any_hit: bool = False):
    """Closest (or any) hit; same contract as fused.intersect_fused.

    Rays are sorted by (direction octant, origin Morton cell) before
    blocking: the worklist cull is per 512-ray BLOCK, so block
    coherence -- not per-ray coherence -- decides how many triangle
    tiles each block walks.  Secondary/bounce rays arrive shuffled from
    the wavefront integrator; sorting cuts their per-block tile unions
    by an order of magnitude.  Results are unsorted on return
    (gather by inverse permutation -- exact)."""
    R = o.shape[0]
    sort_key = _ray_sort_keys(tl, o, d, t_max)
    perm = jnp.argsort(sort_key)
    o, d, t_max = o[perm], d[perm], t_max[perm]

    raye, rayp, _ = ray_features(o, d)
    G = max(1, -(-R // RAY_TILE))
    Rp = G * RAY_TILE

    def pad(x, fill):
        return jnp.pad(x, [(0, Rp - R)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    o_p, d_p = pad(o, 0.0), pad(d, 1.0)
    tm_p = pad(t_max, 0.0)
    order, tnear, count = _block_worklists(tl.tile_bounds, o_p, d_p, tm_p)

    raye_t = pad(raye, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)
    rayp_t = pad(rayp, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)
    tm_t = tm_p.reshape(G, RAY_TILE)
    if jax.default_backend() == "tpu":
        t, idx = _intersect_pallas2(
            tl.edge_table, tl.plane_table, order, tnear, count,
            raye_t, rayp_t, tm_t, any_hit=any_hit,
        )
        t = t.reshape(-1)[:R]
        idx = idx.reshape(-1)[:R]
    else:
        t, idx = _intersect_ref2(tl, order, tnear, count, raye_t, rayp_t,
                                 tm_t)
        t = t.reshape(-1)[:R]
        idx = idx.reshape(-1)[:R]
    idx = jnp.where(idx >= 0, jnp.take(tl.perm, jnp.maximum(idx, 0)), -1)
    # Unsort back to caller lane order.
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(R, dtype=perm.dtype))
    t, idx = t[inv], idx[inv]
    return t, idx, idx >= 0
