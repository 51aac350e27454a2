"""Two-level fused traversal: worklist-driven MXU intersection at scale.

Extends the fused bilinear-form intersector (accel/fused.py) past its
VMEM cap (FUSED_MAX_TRIS) to 100k-1M+ triangle scenes -- the TPU answer
to the reference's full BVH walk over large scenes
(/root/reference/src/accelerators/bvh.cpp:707+).

Shape of the algorithm (no pointer chasing anywhere):

1. BUILD: triangles are Morton-ordered and packed into ST=128-triangle
   subtiles.  Each subtile's edge+plane rows live in ONE [16, 5*ST] HBM
   block (one DMA per subtile) in a combined-K layout: the 16 feature
   rows carry [d, o x d, o, 1, pad] so the three edge forms AND the two
   plane forms of all 128 triangles come out of a SINGLE MXU matmul per
   walk step.  AABBs are additionally kept at FINE granularity (FSUB=4
   32-triangle subgroups per subtile for scenes <= FINE_MAX_TRIS).
2. SORT (XLA): rays partition into direction octants by a stable
   8-bucket counting sort (cumsum ranks + one scatter).  Lanes arrive
   in pixel order, so within-octant origins are already coherent; the
   full 18-bit octant+Morton argsort of rounds 3-4 measured ~35 ms per
   921k-ray dispatch and this replaces it at ~1 ms.  Dead lanes
   (t_max <= 0) partition to the back so whole blocks of them skip
   every stage.
3. CULL (Pallas, per dispatch): every ray slab-tests every FINE
   subgroup AABB on the VPU (_worklist_kernel: subgroups ride the
   128-lane axis, rays sweep in 8-sublane chunks, zero HBM
   temporaries).  Blocks whose rays are all dead skip the sweep via a
   prefetched live flag -- late-bounce dispatches are mostly dead lanes
   and the cull runs once per intersect dispatch (~64x per frame).
4. COMPACT (XLA, sort-free): fine votes OR-reduce to subtile
   granularity; the per-block vote rows become dense worklists via a
   cumsum + rank-compare.  The fine votes are ALSO bit-packed into
   per-block submask words ([G, nst_fine/32] i32, elementwise) that
   ride to the walk kernel as scalar prefetch.  Blocks voting for more
   than MAXS subtiles fall back to a dense walk -- conservative, never
   drops a candidate.
5. WALK (Pallas): each ray block walks ONLY its worklist with an
   NBUF-deep circular DMA pipeline; per subtile one K16 dot, then the
   sign-test/plane-t/argmin epilogue runs per 32-row SUBGROUP, gated by
   the submask bits: a subgroup no ray in the block can hit skips its
   entire VPU tail.  The round-4 verdict diagnosed the walk as
   WORK-VOLUME bound (~1.2k candidate tris/ray vs ~50 for a per-ray
   BVH); fine-granularity gating cuts the epilogue pair volume ~2-3x
   without changing the step count, the DMA shape, or the dot -- the
   round-5 first attempt (fine-granularity worklists + packed dots)
   moved that per-dispatch cost into XLA glue and LOST throughput
   (2.48 -> 2.12 Mrays/s), because fixed per-dispatch costs multiply
   by the ~64 intersect dispatches per frame.

Results are bit-identical to the dense fused intersector: the worklist
and submask are conservative (a subgroup is only skipped when NO ray in
the block can hit its AABB closer than t_max), and the epilogue math
matches accel/fused.py's _epilogue expression order (ties resolve to
the smallest packed triangle id in both).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused import _PRECISION, _morton

ST = 128        # triangles per subtile (walk/DMA granularity)
STF = 32        # triangles per fine subgroup (cull/gating granularity)
RT_WALK = 512   # rays per block (cull/worklist granularity)
MAXS = 384      # worklist slots per block before the dense fallback
NBUF = 8        # subtile-table prefetch depth (DMA-latency hiding)
FINE_MAX_TRIS = 300_000  # beyond: cull cost is rays*n_fine, gate off
_SORT_MODE = "morton"  # "morton" (argsort, max coherence) | "octant"
# Walk launches are sliced so the [G, MAXS] scalar-prefetch worklists
# + submask words stay well under the ~1 MB SMEM budget.
_G_SMEM = 128


class TwoLevelTris(NamedTuple):
    """Packed K16 subtile tables + bounds for the two-level traversal.

    table: [nst, 16, 5*ST] f32.  Feature rows (the contraction axis)
      are [d(0:3), o x d(3:6), o(6:9), 1(9), 0(10:16)]; lanes hold the
      five forms per triangle column-blocked as [w0|w1|w2|num|den]*ST:
        edge k   (w0..w2): rows 0:3 = cross(a_k, b_k), rows 3:6 = b_k-a_k
        plane num:          rows 6:9 = -n, row 9 = n.v0
        plane den:          rows 0:3 = n
      so  out = table[s]^T . feat  yields all five [ST, Rt] forms of
      one subtile from one matmul.  5*ST = 640 = 5x128 keeps the lane
      axis tile-aligned (Mosaic DMA slices must be 128-aligned).
    bounds: [nf, 8] FINE subgroup AABBs (lo3, hi3, pad2); nf = nst *
      fsub.  fsub = ST // STF for scenes <= FINE_MAX_TRIS, else 1
      (fine AABBs exist to gate epilogue subgroups; for megascale
      scenes the cull cost rays*nf dominates, so gating turns off).
    bounds_planar: [8, nfp] the same, transposed + lane-padded with
      +inf los for the Pallas cull kernel.
    perm: packed-id -> original-triangle-id map, or None when the scene
      tables were pre-Morton-ordered (driver._morton_order_scene).
    """
    table: Any
    bounds: Any
    bounds_planar: Any
    perm: Any
    n_tris: int
    n_sub: int
    fsub: int
    world_lo: Any  # [3] scene AABB (ray-sort quantization)
    world_ext: Any  # [3]

    @staticmethod
    def from_tris(p0, e1, e2, fsub: int | None = None) -> "TwoLevelTris":
        p0 = np.asarray(p0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        T = p0.shape[0]
        if fsub is None:
            fsub = ST // STF if T <= FINE_MAX_TRIS else 1
        stf = ST // fsub
        if T > 0:
            v0, v1, v2 = p0, p0 + e1, p0 + e2
            tlo = np.minimum(np.minimum(v0, v1), v2)
            thi = np.maximum(np.maximum(v0, v1), v2)
            order = np.argsort(_morton(0.5 * (tlo + thi)), kind="stable")
            p0, e1, e2 = p0[order], e1[order], e2[order]
            tlo, thi = tlo[order], thi[order]
        else:
            order = np.zeros((0,), np.int64)
            tlo = thi = np.zeros((0, 3), np.float32)
        nst = max(1, -(-T // ST))
        nf = nst * fsub
        Tp = nst * ST
        v0, v1, v2 = p0, p0 + e1, p0 + e2
        n = np.cross(e1, e2)

        tab = np.zeros((nst, 16, 5 * ST), np.float32)
        sub = np.arange(T) // ST
        col = np.arange(T) % ST
        for k, (a, b) in enumerate(((v0, v1), (v1, v2), (v2, v0))):
            tab[sub, 0:3, k * ST + col] = np.cross(a, b)
            tab[sub, 3:6, k * ST + col] = b - a
        tab[sub, 6:9, 3 * ST + col] = -n
        tab[sub, 9, 3 * ST + col] = np.sum(n * v0, axis=-1)
        tab[sub, 0:3, 4 * ST + col] = n
        # Padded triangle columns are all-zero: every w = 0 ("inside")
        # but den = 0 -> t = inf, so they can never win.

        bounds = np.zeros((nf, 8), np.float32)
        for j in range(nf):
            a, b = j * stf, min((j + 1) * stf, T)
            if a >= T:
                bounds[j, 0:3] = 1e30
                bounds[j, 3:6] = 1e30
                continue
            lo = tlo[a:b].min(axis=0)
            hi = thi[a:b].max(axis=0)
            eps = 1e-4 * max(1.0, float(np.abs(np.stack([lo, hi])).max()))
            bounds[j, 0:3] = lo - eps
            bounds[j, 3:6] = hi + eps

        real = bounds[:, 0] < 1e29
        wlo = (bounds[real, 0:3].min(axis=0) if real.any()
               else np.zeros(3, np.float32))
        whi = (bounds[real, 3:6].max(axis=0) if real.any()
               else np.ones(3, np.float32))
        nfp = (nf + 127) // 128 * 128
        bp = np.full((8, nfp), 1e30, np.float32)
        bp[0:3, :nf] = bounds[:, 0:3].T
        bp[3:6, :nf] = bounds[:, 3:6].T

        if np.array_equal(order, np.arange(T)):
            perm = None
        else:
            perm_np = np.full((Tp,), -1, np.int32)
            perm_np[:T] = order.astype(np.int32)
            perm = jnp.asarray(perm_np)
        return TwoLevelTris(
            table=jnp.asarray(tab),
            bounds=jnp.asarray(bounds),
            bounds_planar=jnp.asarray(bp),
            perm=perm,
            n_tris=T,
            n_sub=nst,
            fsub=fsub,
            world_lo=jnp.asarray(wlo.astype(np.float32)),
            world_ext=jnp.asarray(
                np.maximum(whi - wlo, 1e-6).astype(np.float32)),
        )


def ray_features16(o, d):
    """[R, 16] combined-K features [d, o x d, o, 1, 0...] pairing with
    the K16 table rows (one dot yields edge AND plane forms)."""
    m = jnp.cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    pad = jnp.zeros(o.shape[:-1] + (6,), o.dtype)
    return jnp.concatenate([d, m, o, one, pad], axis=-1)


def _group_tc(out, jj, stf):
    """tc ([stf, Rt]) for fine subgroup jj of the K16
    dot output ([5*ST, Rt]).  Expression order matches
    accel/fused.py:_epilogue so results stay bit-identical."""
    inf = jnp.float32(1e30)
    off = jj * stf
    w0 = out[off:off + stf]
    w1 = out[ST + off:ST + off + stf]
    w2 = out[2 * ST + off:2 * ST + off + stf]
    num = out[3 * ST + off:3 * ST + off + stf]
    den = out[4 * ST + off:4 * ST + off + stf]
    wmin = jnp.minimum(jnp.minimum(w0, w1), w2)
    wmax = jnp.maximum(jnp.maximum(w0, w1), w2)
    inside = (wmin >= 0) | (wmax <= 0)
    safe = jnp.abs(den) > 1e-12
    t = jnp.where(safe, num / jnp.where(safe, den, 1.0), inf)
    return jnp.where(inside & (t > 1e-4), t, inf)


def _reduce_best(tc, idp, best_t, best_id):
    """Fold a [rows, Rt] candidate set into the running (t, id) best.
    Ties keep the smallest packed id, matching a sequential
    ascending-id walk with a strict < update."""
    tmin = jnp.min(tc, axis=0, keepdims=True)
    amin = jnp.min(
        jnp.where(tc <= tmin, idp, jnp.int32(2**30)), axis=0, keepdims=True
    )
    better = tmin < best_t
    return (
        jnp.where(better, tmin, best_t),
        jnp.where(better, amin, best_id),
    )


def _dot16(tab, feat):
    """[16, L]^T . [16, Rt] -> [L, Rt] (contraction over the 16-row
    feature axis; Precision.HIGHEST -- single-pass bf16 is too lossy
    for the sign tests and measured no faster on v5e)."""
    return jax.lax.dot_general(
        tab, feat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


# ---------------------------------------------------------------------------
# Cull: per-block fine-subgroup votes on the VPU.


def _worklist_kernel(live_ref, bounds_ref, rays_ref, key_ref, *, NSTP, RT):
    """Per-block subgroup cull: subgroups ride the 128-lane axis, rays
    sweep in 8-sublane chunks, every op is a native [8, NSTP]
    broadcast -- no HBM temporaries.  All-dead blocks (live flag 0,
    prefetched) skip the sweep entirely: the cull runs once per
    intersect dispatch and late-bounce dispatches are mostly dead."""
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    key_ref[0] = jnp.zeros_like(key_ref[0])

    @pl.when(live_ref[g] > 0)
    def _():
        rays = rays_ref[0]  # [RT, 8]: ox oy oz ivx ivy ivz tmax pad
        lo_x = bounds_ref[0:1, :]
        lo_y = bounds_ref[1:2, :]
        lo_z = bounds_ref[2:3, :]
        hi_x = bounds_ref[3:4, :]
        hi_y = bounds_ref[4:5, :]
        hi_z = bounds_ref[5:6, :]

        acc = jnp.zeros((8, NSTP), jnp.float32)
        for rc in range(RT // 8):
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
            acc = jnp.maximum(acc, vote.astype(jnp.float32))
        key_ref[0] = jnp.max(acc, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _votes_pallas(bounds_planar, rays_t, live, interpret: bool = False):
    """(vote [G, NSTP] f32 0/1) from rays_t [G, RT, 8]; live [G] i32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, RT = rays_t.shape[0], rays_t.shape[1]
    NSTP = bounds_planar.shape[1]
    kern = functools.partial(_worklist_kernel, NSTP=NSTP, RT=RT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, NSTP), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # [G, 1, NSTP]: Mosaic rejects (1, N) blocks over [G, N]
        # (last-two-dims rule), so the block keeps a unit sublane dim.
        out_specs=pl.BlockSpec((1, 1, NSTP), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 1, NSTP), jnp.float32),
        interpret=interpret,
    )(live, bounds_planar, rays_t)[:, 0]


def _votes_xla(bounds, o, d, t_max):
    """XLA fallback of the cull (CPU backend + tests): [G, nf] bool."""
    R = o.shape[0]
    G = R // RT_WALK
    nf = bounds.shape[0]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                    jnp.where(d < 0, -1e12, 1e12))
    lo = bounds[:, 0:3]
    hi = bounds[:, 3:6]

    def per_block(args):
        ob, invb, tmb = args  # [RT, 3], [RT, 3], [RT]
        tn = jnp.full((RT_WALK, nf), -jnp.float32(1e30))
        tf = jnp.broadcast_to(tmb[:, None], (RT_WALK, nf))
        for a in range(3):
            t0 = (lo[None, :, a] - ob[:, a:a + 1]) * invb[:, a:a + 1]
            t1 = (hi[None, :, a] - ob[:, a:a + 1]) * invb[:, a:a + 1]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        vote = (tn <= tf * 1.0001) & (tf > 0)
        return jnp.any(vote, axis=0)

    return jax.lax.map(
        per_block,
        (o.reshape(G, RT_WALK, 3), inv.reshape(G, RT_WALK, 3),
         t_max.reshape(G, RT_WALK)),
    )


def _compact(vote, maxs: int = MAXS):
    """Sort-free worklist compaction: vote [G, nst] bool ->
    (order [G, maxs] int32, n_eff [G] int32).

    order[g, j] = id of the (j+1)-th voting subtile, found by ranking
    the vote cumsum (elementwise compares; no [G, nst] sort).  Blocks
    with more than maxs votes fall back to the dense walk: order
    becomes iota and n_eff = nst, which the kernel detects by
    n_eff > maxs -- conservative, never drops a candidate.
    """
    G, nst = vote.shape
    cs = jnp.cumsum(vote.astype(jnp.int32), axis=1)
    count = cs[:, -1]
    over = count > maxs
    tgt = jnp.arange(1, maxs + 1, dtype=jnp.int32)

    def chunk(csb):
        return jnp.sum(csb[:, :, None] < tgt[None, None, :], axis=1
                       ).astype(jnp.int32)

    CH = 8
    Gc = -(-G // CH)
    if Gc * CH != G:
        cs = jnp.pad(cs, ((0, Gc * CH - G), (0, 0)))
    order = jax.lax.map(chunk, cs.reshape(Gc, CH, nst)
                        ).reshape(Gc * CH, maxs)[:G]
    order = jnp.where(over[:, None],
                      jnp.arange(maxs, dtype=jnp.int32)[None], order)
    n_eff = jnp.where(over, nst, count)
    return order, n_eff


def _pack_submask(vote_f, fsub: int):
    """Fine votes [G, nf] bool -> per-block bit words [G, nw] i32
    (bit i of word w = vote for fine subgroup w*32+i).  Elementwise;
    rides to the walk kernel as scalar prefetch (SMEM)."""
    G, nf = vote_f.shape
    nw = max(1, -(-nf // 32))
    v = vote_f
    if nw * 32 != nf:
        v = jnp.pad(vote_f, ((0, 0), (0, nw * 32 - nf)))
    bits = jnp.left_shift(
        jnp.ones((), jnp.int32), jnp.arange(32, dtype=jnp.int32))
    return jnp.sum(
        v.reshape(G, nw, 32).astype(jnp.int32) * bits[None, None, :],
        axis=-1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Walk: one K16 dot per worklist subtile + submask-gated epilogue.


def _kernel(count_ref, order_ref, mask_ref, feat_ref, tmax_ref, tab_hbm,
            t_out, id_out, buf, best_t_s, best_id_s, sem,
            *, any_hit: bool, nst: int, fsub: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    feat = feat_ref[0]  # [16, RT]
    n = count_ref[g]
    dense = n > jnp.int32(MAXS)
    stf = ST // fsub
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (stf, RT_WALK), 0)
    best_t_s[:] = tmax_ref[0]
    best_id_s[:] = jnp.full((1, RT_WALK), -1, jnp.int32)

    def tid_at(k):
        # Overflow blocks (n > MAXS) walk densely: subtile id == k.
        return jnp.where(dense, k, order_ref[g, jnp.minimum(k, MAXS - 1)])

    def copy(k, slot):
        return pltpu.make_async_copy(tab_hbm.at[tid_at(k)], buf.at[slot],
                                     sem.at[slot])

    @pl.when(n > 0)
    def _():
        # NBUF-deep circular prefetch hides the HBM DMA latency behind
        # the dot+epilogue of earlier subtiles; loop control stays
        # scalar-only (per-step vector-reduce pruning measured slower
        # than the work it saved, round-4 finding that still holds).
        def prime(k, _):
            copy(k, jax.lax.rem(k, NBUF)).start()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(n, NBUF), prime, 0)

        def body(k, _):
            slot = jax.lax.rem(k, NBUF)
            copy(k, slot).wait()
            out = _dot16(buf[slot], feat)  # [5*ST, RT]
            tid = tid_at(k)
            for jj in range(fsub):

                def do_group(jj=jj):
                    tc = _group_tc(out, jj, stf)
                    idp = iota_f + (tid * ST + jj * stf)
                    bt, bid = _reduce_best(tc, idp, best_t_s[:],
                                           best_id_s[:])
                    best_t_s[:] = bt
                    best_id_s[:] = bid

                if fsub > 1:
                    fid = tid * fsub + jj
                    word = mask_ref[g, jax.lax.shift_right_logical(fid, 5)]
                    bit = jax.lax.shift_right_logical(
                        word, jax.lax.rem(fid, 32)) & 1
                    pl.when(dense | (bit > 0))(do_group)
                else:
                    do_group()

            @pl.when(k + NBUF < n)
            def _():
                copy(k + NBUF, slot).start()

            return 0

        jax.lax.fori_loop(0, n, body, 0)

    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]


@functools.partial(jax.jit, static_argnames=(
    "any_hit", "nst", "fsub", "interpret"))
def _walk_pallas(table, order, count, mask, feat_t, t_max, nst: int,
                 fsub: int, any_hit: bool = False,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = feat_t.shape[0]
    kern = functools.partial(_kernel, any_hit=any_hit, nst=nst, fsub=fsub)
    feat_spec = pl.BlockSpec((1, 16, RT_WALK), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RT_WALK), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            feat_spec, flat_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),  # subtile table (HBM)
        ],
        out_specs=[flat_spec, flat_spec],
        scratch_shapes=[
            pltpu.VMEM((NBUF, 16, 5 * ST), jnp.float32),
            pltpu.VMEM((1, RT_WALK), jnp.float32),
            pltpu.VMEM((1, RT_WALK), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RT_WALK), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RT_WALK), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(count, order, mask, feat_t, t_max[:, None, :], table)


def _walk_xla(tl: "TwoLevelTris", order, n_eff, mask, feat, t_max):
    """XLA reference of the worklist walk (CPU backend + tests): per
    block, gather worklist subtiles and run the shared dot + gated
    epilogue.  Overflow blocks scan every subtile densely and ignore
    the submask (same semantics as the kernel)."""
    G = feat.shape[0]
    nst = tl.table.shape[0]
    fsub = tl.fsub
    stf = ST // fsub
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (stf, RT_WALK), 0)
    inf = jnp.float32(1e30)

    def per_block(args):
        orderb, nb, maskb, featb, tmb = args
        dense = nb > MAXS

        def body(carry, k):
            best_t, best_id = carry
            tid = jnp.where(dense, k, orderb[jnp.minimum(k, MAXS - 1)])
            tab = jnp.take(tl.table, tid, axis=0)  # [16, 5*ST]
            out = _dot16(tab, featb)
            bt, bid = best_t, best_id
            for jj in range(fsub):
                if fsub > 1:
                    fid = tid * fsub + jj
                    word = maskb[jax.lax.shift_right_logical(fid, 5)]
                    bit = jax.lax.shift_right_logical(
                        word, jax.lax.rem(fid, 32)) & 1
                    go = dense | (bit > 0)
                else:
                    go = jnp.bool_(True)
                tc = _group_tc(out, jj, stf)
                tc = jnp.where(go, tc, inf)  # gated-out: contributes 0
                idp = iota_f + (tid * ST + jj * stf)
                bt, bid = _reduce_best(tc, idp, bt, bid)
            skip = k >= nb
            return (jnp.where(skip, best_t, bt),
                    jnp.where(skip, best_id, bid)), None

        init = (tmb[None, :], jnp.full((1, RT_WALK), -1, jnp.int32))
        (bt, bid), _ = jax.lax.scan(body, init, jnp.arange(nst))
        return bt[0], bid[0]

    return jax.lax.map(per_block, (order, n_eff, mask, feat, t_max))


def _spread5(x):
    """Interleave 5-bit ints with 2-bit gaps (Morton, 15-bit total)."""
    x = x & 0x1F
    x = (x | (x << 8)) & 0x100F
    x = (x | (x << 4)) & 0x10C3
    x = (x | (x << 2)) & 0x1249
    return x


def _morton_partition(tl, o, d, t_max):
    """Full-coherence ordering: argsort by (octant, origin Morton cell)
    -- the rounds-3/4 key.  ~35 ms per 921k-ray dispatch on v5e, and the
    1.8M-lane argsort broke the remote compiler outright on the 1M-tri
    scenes; kept for A/B measurement against _octant_partition."""
    R = o.shape[0]
    q = jnp.clip(((o - tl.world_lo) / tl.world_ext * 32.0)
                 .astype(jnp.int32), 0, 31)
    morton = (_spread5(q[:, 0]) | (_spread5(q[:, 1]) << 1)
              | (_spread5(q[:, 2]) << 2))
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    key = (octant << 15) | morton
    key = jnp.where(t_max > 0, key, jnp.int32(1 << 20))
    perm = jnp.argsort(key)
    pos = jnp.zeros_like(perm).at[perm].set(jnp.arange(R, dtype=perm.dtype))
    return perm, pos


def _octant_partition(o, d, t_max):
    """Stable 9-bucket counting partition by direction octant (dead
    lanes, t_max <= 0, go last): (perm, pos) with pos the destination
    lane of each input lane and perm its inverse.

    Replaces the full 18-bit octant+Morton argsort (~35 ms per 921k-ray
    dispatch on v5e; this is cumsums + one scatter).  Lanes arrive in
    pixel order, so within-octant origins stay spatially coherent --
    block coherence, which is all the per-block cull needs."""
    R = o.shape[0]
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    key = jnp.where(t_max > 0, octant, jnp.int32(8))
    pos = jnp.zeros((R,), jnp.int32)
    base = jnp.int32(0)
    for b in range(9):
        m = key == b
        mi = m.astype(jnp.int32)
        ranks = jnp.cumsum(mi) - 1
        pos = jnp.where(m, base + ranks, pos)
        base = base + jnp.sum(mi)
    perm = jnp.zeros((R,), jnp.int32).at[pos].set(
        jnp.arange(R, dtype=jnp.int32))
    return perm, pos


def intersect_twolevel(tl: TwoLevelTris, o, d, t_max,
                       any_hit: bool = False, sort: bool = True):
    """Closest (or any) hit; same contract as fused.intersect_fused.

    sort=True partitions rays by direction octant before blocking: the
    worklist cull is per RT_WALK-ray BLOCK, so block coherence decides
    how many subtiles each block walks.  Secondary/bounce rays arrive
    direction-shuffled from the wavefront integrator and need it;
    already-coherent batches (camera/shadow rays in pixel order) can
    pass sort=False to skip the partition + packed gathers.  Results
    are identical either way (the worklist is conservative and the
    epilogue math is shared)."""
    R = o.shape[0]
    if sort:
        # Morton argsort only for fine-gated scene sizes: at 131k tris
        # it buys block coherence worth ~10% end-to-end over the octant
        # partition (2.55 vs 2.33 Mrays/s, v5e), but at 1M tris it
        # HALVES throughput (0.64 vs 1.29 Mrays/s) and the 1.8M-lane
        # argsort broke the remote compiler on megascale programs --
        # the cheap counting partition wins everywhere big.
        if (tl.n_tris <= FINE_MAX_TRIS and R <= 1_100_000
                and _SORT_MODE == "morton"):
            perm, pos = _morton_partition(tl, o, d, t_max)
        else:
            perm, pos = _octant_partition(o, d, t_max)
        # One packed gather for the permutation (TPU gathers cost per
        # row): [o(3), d(3), tmax(1)] instead of 3 separate gathers.
        packed = jnp.concatenate([o, d, t_max[:, None]], axis=-1)[perm]
        o, d = packed[:, 0:3], packed[:, 3:6]
        t_max = packed[:, 6]

    G = max(1, -(-R // RT_WALK))
    Rp = G * RT_WALK

    def pad(x, fill):
        return jnp.pad(x, [(0, Rp - R)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    o_p, d_p = pad(o, 0.0), pad(d, 1.0)
    tm_p = pad(t_max, 0.0)
    on_tpu = jax.default_backend() == "tpu"
    nst = tl.table.shape[0]
    nf = nst * tl.fsub
    if on_tpu:
        inv_p = jnp.where(jnp.abs(d_p) > 1e-12,
                          1.0 / jnp.where(d_p == 0, 1.0, d_p),
                          jnp.where(d_p < 0, -1e12, 1e12))
        rays_t = jnp.concatenate(
            [o_p, inv_p, tm_p[:, None], jnp.zeros((Rp, 1))],
            axis=-1).reshape(G, RT_WALK, 8)
        live = (jnp.max(tm_p.reshape(G, RT_WALK), axis=1) > 0
                ).astype(jnp.int32)
        vote_f = _votes_pallas(tl.bounds_planar, rays_t, live)[:, :nf] > 0.5
    else:
        vote_f = _votes_xla(tl.bounds, o_p, d_p, tm_p)
    if tl.fsub > 1:
        vote = vote_f.reshape(G, nst, tl.fsub).any(-1)
        mask = _pack_submask(vote_f, tl.fsub)
    else:
        vote = vote_f
        mask = jnp.zeros((G, 1), jnp.int32)
    order, n_eff = _compact(vote)

    feat_t = ray_features16(o_p, d_p).reshape(
        G, RT_WALK, 16).transpose(0, 2, 1)
    tm_t = tm_p.reshape(G, RT_WALK)
    if on_tpu:
        ts, ids = [], []
        for g0 in range(0, G, _G_SMEM):
            g1 = min(g0 + _G_SMEM, G)
            tt, ii = _walk_pallas(
                tl.table, order[g0:g1], n_eff[g0:g1], mask[g0:g1],
                feat_t[g0:g1], tm_t[g0:g1], nst=nst, fsub=tl.fsub,
                any_hit=any_hit,
            )
            ts.append(tt)
            ids.append(ii)
        t = jnp.concatenate(ts, axis=0) if len(ts) > 1 else ts[0]
        idx = jnp.concatenate(ids, axis=0) if len(ids) > 1 else ids[0]
    else:
        t, idx = _walk_xla(tl, order, n_eff, mask, feat_t, tm_t)
        t, idx = t[:, None], idx[:, None]
    t = t.reshape(-1)[:R]
    idx = idx.reshape(-1)[:R]
    if tl.perm is not None:
        idx = jnp.where(idx >= 0, jnp.take(tl.perm, jnp.maximum(idx, 0)),
                        -1)
    else:
        idx = jnp.where(idx >= tl.n_tris, -1, idx)
    if not sort:
        return t, idx, idx >= 0
    # Unsort back to caller lane order: one packed gather by pos.  t
    # rides as bitcast int32 lanes next to idx -- int transport
    # preserves bit patterns exactly, whereas the reverse (idx as f32)
    # is corrupted on TPU: idx = -1 is 0xFFFFFFFF, a quiet-NaN pattern
    # that hardware float paths CANONICALIZE to 0x7FC00000, silently
    # turning misses into bogus hits (observed: black films on the
    # twolevel path only).
    out = jnp.stack(
        [jax.lax.bitcast_convert_type(t, jnp.int32), idx], axis=-1)[pos]
    t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
    idx = out[:, 1]
    return t, idx, idx >= 0
