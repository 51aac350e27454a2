"""Two-level fused traversal: worklist-driven MXU intersection at scale.

Extends the fused bilinear-form intersector (accel/fused.py) past its
VMEM cap (FUSED_MAX_TRIS) to 100k+ triangle scenes -- the TPU answer to
the reference's full BVH walk over large scenes
(/root/reference/src/accelerators/bvh.cpp:707+).

Shape of the algorithm (no pointer chasing anywhere):

1. BUILD: triangles are Morton-ordered and packed into TRI_TILE-sized
   tiles with conservative AABBs -- the same packing as FusedTris, but
   the edge/plane tables live in HBM, not VMEM, concatenated into ONE
   [ntt, 5, K, TRI_TILE] tensor so each tile is a single DMA.
2. CULL (Pallas, per dispatch): every ray slab-tests every tile AABB
   in a dedicated VPU kernel (_worklist_kernel: tiles ride the
   128-lane axis, rays sweep in 8-sublane chunks, zero HBM
   temporaries); the per-block keys (min entry distance of any voting
   ray) order the tiles front-to-back through one batched [G, ntt]
   sort_key_val.  This replaces the per-ray BVH descent with one
   data-parallel cull + sort.  (A CPU/XLA fallback of the same cull,
   _block_worklists, serves tests and non-TPU backends.)
3. WALK (Pallas): each ray block walks ONLY its worklist with an
   _NBUF-deep circular DMA pipeline (a tile step is ~1 us of compute
   against ~5 us of HBM latency; double buffering left the walk
   latency-bound), then per tile the same two K=8 dots + VPU epilogue
   as the fused kernel.  Loop control is scalar-only: the earlier
   per-step vector-reduce t-pruning serialized each iteration on a
   VPU-reduce -> SMEM readback and cost more than it saved.

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
# Ray blocks per worklist chunk: bounds the [C*Rt, ntt] slab-test
# temporaries (~8 MB at 514 tiles) while amortizing per-op overhead.
_WL_CHUNK = 8
# Max ray blocks per pallas launch: order is a [G, ntt] int32 SMEM
# scalar-prefetch array and SMEM is ~1 MB, so the cap shrinks with the
# tile count (514 tiles -> 128 blocks; ~2k tiles (500k tris) -> 64;
# ~4k tiles (1M tris) -> 32).
_G_SMEM = 128
_SMEM_BYTES = 512 * 1024  # conservative half of the ~1 MB scalar memory


def _g_smem(ntt: int) -> int:
    return max(8, min(_G_SMEM, _SMEM_BYTES // max(ntt * 4, 1)))


class TwoLevelTris(NamedTuple):
    """FusedTris packing with HBM-resident tables + worklist dispatch.

    The combined table is stored [ntt, 5, K, TRI_TILE] -- rows 0-2 the
    edge tables, rows 3-4 the plane tables, triangle axis on the
    128-lane minor dim -- because Mosaic DMA slices of HBM tensors must
    be lane-aligned in their minor dimension (a [.., TRI_TILE, K=8]
    layout cannot be sliced), and one tile = one async copy.  The
    kernel dots contract over the K sublane axis:
    w_c [Tt, Rt] = tab_c [K, Tt]^T @ ray [K, Rt].
    """
    table: Any  # [ntt, 5, K, TRI_TILE] (edge 0:3, plane 3:5)
    tile_bounds: Any  # [ntt, 8] lo3 hi3 pad2
    perm: Any
    n_tris: int
    world_lo: Any  # [3] scene AABB (ray-sort quantization)
    world_ext: Any  # [3]
    # [8, NTTp] planar bounds (rows lox loy loz hix hiy hiz, lanes =
    # tiles, padded with +inf lo so pad tiles never vote): the layout
    # the Pallas worklist kernel broadcasts against ray sublanes.
    bounds_planar: Any = None

    @staticmethod
    def from_tris(p0, e1, e2) -> "TwoLevelTris":
        ft = FusedTris.from_tris(p0, e1, e2)
        assert ft.edge_table.shape[0] <= MAX_TILES, (
            f"{ft.edge_table.shape[0]} tiles > MAX_TILES; add tile-axis "
            "chunking for scenes beyond ~1M triangles")
        et = np.asarray(ft.edge_table).transpose(0, 1, 3, 2)
        pt = np.asarray(ft.plane_table).transpose(0, 1, 3, 2)
        tab = np.ascontiguousarray(
            np.concatenate([et, pt], axis=1))  # [ntt, 5, K, Tt]
        tb = np.asarray(ft.tile_bounds)
        real = tb[:, 0] < 1e29
        lo = (tb[real, 0:3].min(axis=0) if real.any()
              else np.zeros(3, np.float32))
        hi = (tb[real, 3:6].max(axis=0) if real.any()
              else np.ones(3, np.float32))
        ntt = tb.shape[0]
        nttp = (ntt + 127) // 128 * 128
        bp = np.full((8, nttp), 1e30, np.float32)
        bp[0:3, :ntt] = tb[:, 0:3].T
        bp[3:6, :ntt] = tb[:, 3:6].T
        return TwoLevelTris(
            table=jnp.asarray(tab),
            tile_bounds=ft.tile_bounds,
            perm=ft.perm,
            n_tris=ft.n_tris,
            world_lo=jnp.asarray(lo.astype(np.float32)),
            world_ext=jnp.asarray(
                np.maximum(hi - lo, 1e-6).astype(np.float32)),
            bounds_planar=jnp.asarray(bp),
        )


def _block_worklists(tile_bounds: Any, o, d, t_max):
    """Per-512-ray-block candidate tile lists, front-to-back.

    Returns (order [G, ntt] int32, tnear [G, ntt] f32 (INF past count),
    count [G] int32).  A tile enters block g's list iff ANY ray of the
    block enters its AABB in front of the origin and closer than its
    t_max -- exactly the fused kernel's in-kernel cull (fused.py
    _tile_cull), hoisted out so the kernel can skip the tile's DMA too.

    Structure (profile-driven): per-axis slab accumulation keeps the
    live temporaries at 2x[C*Rt, ntt] instead of 6x[Rt, ntt, 3], the
    map runs over _WL_CHUNK-block chunks, and the front-to-back sort is
    ONE batched [G, ntt] sort_key_val instead of G serial 514-element
    sorts (64 tiny sorts cost ~0.85 ms/step on v5e; one batched sort is
    an order of magnitude cheaper).
    """
    R = o.shape[0]
    G = R // RAY_TILE
    ntt = tile_bounds.shape[0]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                    jnp.where(d < 0, -1e12, 1e12))
    lo = tile_bounds[:, 0:3]
    hi = tile_bounds[:, 3:6]

    def per_chunk(args):
        ob, invb, tmb = args  # [C, Rt, 3], [C, Rt, 3], [C, Rt]
        C = ob.shape[0]
        rb = C * RAY_TILE
        ob = ob.reshape(rb, 3)
        invb = invb.reshape(rb, 3)
        tn = jnp.full((rb, ntt), -jnp.float32(1e30))
        # Capping tf at t_max folds the (tn < t_max) test into tn <= tf.
        tf = jnp.broadcast_to(tmb.reshape(rb, 1), (rb, ntt))
        for a in range(3):
            t0 = (lo[None, :, a] - ob[:, a:a + 1]) * invb[:, a:a + 1]
            t1 = (hi[None, :, a] - ob[:, a:a + 1]) * invb[:, a:a + 1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        vote = (tn <= tf * 1.0001) & (tf > 0)
        tn = tn.reshape(C, RAY_TILE, ntt)
        vote = vote.reshape(C, RAY_TILE, ntt)
        tnear_blk = jnp.min(jnp.where(vote, tn, jnp.float32(1e30)), axis=1)
        active = jnp.any(vote, axis=1)
        key = jnp.where(active, tnear_blk, jnp.float32(1e30))
        return key, jnp.sum(active, axis=1).astype(jnp.int32)

    C = min(_WL_CHUNK, G)
    Gc = (G + C - 1) // C
    if Gc * C != G:  # pad block axis (t_max=0 blocks vote for nothing)
        pad = Gc * C - G
        o = jnp.concatenate([o.reshape(G, RAY_TILE, 3),
                             jnp.zeros((pad, RAY_TILE, 3))], 0)
        inv = jnp.concatenate([inv.reshape(G, RAY_TILE, 3),
                               jnp.ones((pad, RAY_TILE, 3))], 0)
        tm = jnp.concatenate([t_max.reshape(G, RAY_TILE),
                              jnp.zeros((pad, RAY_TILE))], 0)
    else:
        o = o.reshape(G, RAY_TILE, 3)
        inv = inv.reshape(G, RAY_TILE, 3)
        tm = t_max.reshape(G, RAY_TILE)

    key, count = jax.lax.map(
        per_chunk,
        (o.reshape(Gc, C, RAY_TILE, 3), inv.reshape(Gc, C, RAY_TILE, 3),
         tm.reshape(Gc, C, RAY_TILE)),
    )
    key = key.reshape(Gc * C, ntt)[:G]
    count = count.reshape(Gc * C)[:G]
    iota = jnp.broadcast_to(jnp.arange(ntt, dtype=jnp.int32)[None], key.shape)
    tnear, order = jax.lax.sort_key_val(key, iota, dimension=1)
    return order, tnear, count




def _worklist_kernel(bounds_ref, rays_ref, key_ref, *, NTTP):
    """Per-block tile cull on the VPU: tiles ride the 128-lane axis,
    rays sweep in 8-sublane chunks, every op is a native [8, NTTP]
    broadcast -- no HBM temporaries (the XLA slab test materialized
    [C*Rt, ntt] arrays per axis and was HBM-bound)."""
    from jax.experimental import pallas as pl

    rays = rays_ref[0]  # [RAY_TILE, 8]: ox oy oz ivx ivy ivz tmax pad
    lo_x = bounds_ref[0:1, :]
    lo_y = bounds_ref[1:2, :]
    lo_z = bounds_ref[2:3, :]
    hi_x = bounds_ref[3:4, :]
    hi_y = bounds_ref[4:5, :]
    hi_z = bounds_ref[5:6, :]

    acc = jnp.full((8, NTTP), 1e30, jnp.float32)
    for rc in range(RAY_TILE // 8):
        blk = rays[rc * 8:(rc + 1) * 8, :]  # [8, 8]
        ox, oy, oz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
        ivx, ivy, ivz = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        tm = blk[:, 6:7]
        t0 = (lo_x - ox) * ivx
        t1 = (hi_x - ox) * ivx
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (lo_y - oy) * ivy
        t1 = (hi_y - oy) * ivy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (lo_z - oz) * ivz
        t1 = (hi_z - oz) * ivz
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        tf = jnp.minimum(tf, tm)
        vote = (tn <= tf * 1.0001) & (tf > 0)
        acc = jnp.minimum(acc, jnp.where(vote, tn, 1e30))
    key_ref[0] = jnp.min(acc, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _block_worklists_pallas(bounds_planar, rays_t, interpret: bool = False):
    """(key [G, NTTP]) from rays_t [G, RAY_TILE, 8]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = rays_t.shape[0]
    NTTP = bounds_planar.shape[1]
    kern = functools.partial(_worklist_kernel, NTTP=NTTP)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, NTTP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # [G, 1, NTTP]: Mosaic rejects (1, N) blocks over [G, N]
        # (last-two-dims rule; CLAUDE.md pitfalls), so the block keeps a
        # unit sublane dim and XLA drops it after the call.
        out_specs=pl.BlockSpec((1, 1, NTTP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, NTTP), jnp.float32),
        interpret=interpret,
    )(bounds_planar, rays_t)[:, 0]


_NBUF = 8  # tile-table prefetch depth (DMA-latency hiding)


def _kernel(count_ref, order_ref, raye_ref, rayp_ref, tmax_ref,
            tab_hbm, t_out, id_out,
            buf, best_t_s, best_id_s, sem,
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

    def copy(k, slot):
        tid = order_ref[g, k]
        return pltpu.make_async_copy(tab_hbm.at[tid], buf.at[slot],
                                     sem.at[slot])

    def live():
        alive = best_t_s[:] > 0  # dead lanes carry t_max = 0
        if any_hit:
            return jnp.any(alive & (best_id_s[:] < 0))
        return jnp.any(alive)

    @pl.when((n > 0) & live())
    def _():
        # _NBUF-deep circular prefetch: a tile step is ~1 us of MXU/VPU
        # work against ~5 us of HBM DMA latency, so double buffering
        # left the walk latency-bound (measured 73 ms for 921k coherent
        # rays at 131k tris).  Keeping _NBUF copies in flight amortizes
        # the latency across the whole worklist; loop control stays
        # scalar-only (the old vector-reduce t-pruning cond serialized
        # each step on a VPU-reduce -> SMEM readback).
        def prime(k, _):
            copy(k, jax.lax.rem(k, _NBUF)).start()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(n, _NBUF), prime, 0)

        def body(k, _):
            slot = jax.lax.rem(k, _NBUF)
            copy(k, slot).wait()
            tab = buf[slot]  # [5, K, Tt]
            w = jnp.concatenate(
                [_dot_t(tab[c], raye) for c in range(3)], axis=0)
            nd = jnp.concatenate(
                [_dot_t(tab[3 + c], rayp) for c in range(2)], axis=0)
            bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                                order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
            best_t_s[:] = bt
            best_id_s[:] = bid
            # Refill the slot just consumed (reads of buf[slot] are
            # ordered before the overwrite through the ref dependency).
            @pl.when(k + _NBUF < n)
            def _():
                copy(k + _NBUF, slot).start()

            return 0

        jax.lax.fori_loop(0, n, body, 0)

    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "interpret"))
def _intersect_pallas2(table, order, tnear, count,
                       raye, rayp, t_max, any_hit: bool = False,
                       interpret: bool = False):
    """tnear is accepted for call-site compatibility but no longer fed
    to the kernel: the per-step t-pruning it powered cost more (vector
    reduce + SMEM readback per iteration, plus [G, ntt] of SMEM
    prefetch traffic per launch) than it saved on these worklists."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    del tnear

    G = raye.shape[0]
    kern = functools.partial(_kernel, any_hit=any_hit)
    # index_maps receive (grid idx, *scalar-prefetch refs).
    ray_spec = pl.BlockSpec((1, _K, RAY_TILE),
                            lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_TILE),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # count/order ride the scalar-prefetch path: full SMEM arrays
    # indexed by program_id (the worklists ARE scalars -- tile ids
    # driving data-dependent DMAs).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            ray_spec, ray_spec, flat_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),  # combined table (HBM)
        ],
        out_specs=[flat_spec, flat_spec],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, 5, _K, TRI_TILE), jnp.float32),
            pltpu.VMEM((1, RAY_TILE), jnp.float32),
            pltpu.VMEM((1, RAY_TILE), jnp.int32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
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
    )(count, order, raye, rayp, t_max[:, None, :], table)


def _intersect_ref2(tl: TwoLevelTris, order, tnear, count, raye, rayp,
                    t_max):
    """XLA reference of the worklist walk (CPU backend + tests): per
    block, gather worklist tiles and run the shared dot+epilogue.  No
    early-out (it is an optimization, not a semantic)."""
    G = raye.shape[0]
    ntt = tl.table.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)

    def per_block(args):
        orderb, countb, rayeb, raypb, tmb = args

        def body(carry, k):
            best_t, best_id = carry
            tid = orderb[k]
            tab = jnp.take(tl.table, tid, axis=0)  # [5, K, Tt]
            w = jnp.concatenate(
                [_dot_t(tab[c], rayeb) for c in range(3)], axis=0)
            nd = jnp.concatenate(
                [_dot_t(tab[3 + c], raypb) for c in range(2)], axis=0)
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
    # One packed gather for the permutation (TPU gathers cost per row):
    # [o(3), d(3), raye(8), rayp(8), tmax(1)] instead of 5 separate
    # gathers of the same rows.
    raye, rayp, _ = ray_features(o, d)
    packed = jnp.concatenate(
        [o, d, raye, rayp, t_max[:, None]], axis=-1)[perm]
    o, d = packed[:, 0:3], packed[:, 3:6]
    raye, rayp = packed[:, 6:14], packed[:, 14:22]
    t_max = packed[:, 22]

    G = max(1, -(-R // RAY_TILE))
    Rp = G * RAY_TILE

    def pad(x, fill):
        return jnp.pad(x, [(0, Rp - R)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    o_p, d_p = pad(o, 0.0), pad(d, 1.0)
    tm_p = pad(t_max, 0.0)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and tl.bounds_planar is not None:
        # Pallas tile cull: the XLA slab test materialized [C*Rt, ntt]
        # HBM temporaries per axis; the kernel keeps everything in VMEM
        # ([8, NTTP] broadcasts, _worklist_kernel).  Only the
        # front-to-back sort stays in XLA (one batched [G, ntt]
        # sort_key_val).
        inv_p = jnp.where(jnp.abs(d_p) > 1e-12,
                          1.0 / jnp.where(d_p == 0, 1.0, d_p),
                          jnp.where(d_p < 0, -1e12, 1e12))
        rays_t = jnp.concatenate(
            [o_p, inv_p, tm_p[:, None], jnp.zeros((Rp, 1))],
            axis=-1).reshape(G, RAY_TILE, 8)
        ntt = tl.tile_bounds.shape[0]
        key = _block_worklists_pallas(tl.bounds_planar, rays_t)[:, :ntt]
        iota = jnp.broadcast_to(
            jnp.arange(ntt, dtype=jnp.int32)[None], key.shape)
        tnear, order = jax.lax.sort_key_val(key, iota, dimension=1)
        count = jnp.sum(key < 1e29, axis=1).astype(jnp.int32)
    else:
        order, tnear, count = _block_worklists(tl.tile_bounds, o_p, d_p,
                                               tm_p)

    raye_t = pad(raye, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)
    rayp_t = pad(rayp, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)
    tm_t = tm_p.reshape(G, RAY_TILE)
    if on_tpu:
        # The order worklists ride scalar-prefetch SMEM ([G, ntt]);
        # SMEM is ~1 MB, so fat dispatches (G > _g_smem(ntt) blocks)
        # launch the walk in slices.  The sort/worklist build above
        # stays one fused pass -- only the kernel launch is sliced.
        gs = _g_smem(tl.table.shape[0])
        ts, ids = [], []
        for g0 in range(0, G, gs):
            g1 = min(g0 + gs, G)
            tt, ii = _intersect_pallas2(
                tl.table, order[g0:g1], tnear[g0:g1], count[g0:g1],
                raye_t[g0:g1], rayp_t[g0:g1], tm_t[g0:g1],
                any_hit=any_hit,
            )
            ts.append(tt)
            ids.append(ii)
        t = jnp.concatenate(ts, axis=0) if len(ts) > 1 else ts[0]
        idx = jnp.concatenate(ids, axis=0) if len(ids) > 1 else ids[0]
        t = t.reshape(-1)[:R]
        idx = idx.reshape(-1)[:R]
    else:
        t, idx = _intersect_ref2(tl, order, tnear, count, raye_t, rayp_t,
                                 tm_t)
        t = t.reshape(-1)[:R]
        idx = idx.reshape(-1)[:R]
    if tl.perm is not None:
        idx = jnp.where(idx >= 0, jnp.take(tl.perm, jnp.maximum(idx, 0)),
                        -1)
    else:
        idx = jnp.where(idx >= tl.n_tris, -1, idx)
    # Unsort back to caller lane order: one packed gather.  t rides as
    # bitcast int32 lanes next to idx -- int transport preserves bit
    # patterns exactly, whereas the reverse (idx as f32) is corrupted on
    # TPU: idx = -1 is 0xFFFFFFFF, a quiet-NaN pattern that hardware
    # float paths CANONICALIZE to 0x7FC00000, silently turning misses
    # into bogus hits (observed: black films on the twolevel path only).
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(R, dtype=perm.dtype))
    out = jnp.stack(
        [jax.lax.bitcast_convert_type(t, jnp.int32), idx], axis=-1)[inv]
    t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
    idx = out[:, 1]
    return t, idx, idx >= 0
