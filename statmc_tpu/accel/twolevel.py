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
   plane forms of all 128 triangles come out of a SINGLE MXU matmul
   per walk step (round-5 profile: per-step fixed costs dominated the
   5-dot form; one [16, 640] x [16, Rt] dot is the cheapest step shape
   measured on v5e).
2. CULL (Pallas, per dispatch): every ray slab-tests every subtile AABB
   on the VPU (_worklist_kernel: subtiles ride the 128-lane axis, rays
   sweep in 8-sublane chunks, zero HBM temporaries).  Block granularity
   is RT_WALK=1024 rays.
3. COMPACT (XLA, sort-free): the per-block vote rows become dense
   worklists via a cumsum + rank-compare -- O(nst * MAXS) elementwise
   work instead of a [G, nst] sort (the front-to-back tnear sort of the
   round-4 design bought nothing: the walk has no per-step t-pruning,
   so list ORDER is irrelevant; only compaction matters).  Blocks whose
   worklist overflows MAXS fall back to walking every subtile densely
   -- conservative, never wrong, and unobserved on real scenes (camera
   rays average ~6 subtiles/block; MAXS=128).
4. WALK (Pallas): each ray block walks ONLY its worklist with an
   NBUF-deep circular DMA pipeline; per subtile one K16 dot + the
   shared sign-test/plane-t/argmin epilogue.

Results are bit-identical to the dense fused intersector: the worklist
is conservative (a subtile is only skipped when NO ray in the block can
hit its AABB closer than t_max), and the epilogue math matches
accel/fused.py's _epilogue expression order.

Measured v5e (131k tris, 921k coherent camera rays): cull+compact
~14 ms + walk ~37 ms = ~51 ms vs ~74 ms for the round-4
256-tile/tnear-sorted design.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused import _PRECISION, _morton

ST = 128        # triangles per subtile (walk granularity)
RT_WALK = 512   # rays per block (cull/worklist granularity)
MAXS = 384      # worklist slots per block before the dense fallback
NBUF = 8        # subtile-table prefetch depth (DMA-latency hiding)
# Walk launches are sliced so the [G, MAXS] scalar-prefetch worklists
# stay well under the ~1 MB SMEM budget.
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
    bounds: [nst, 8] subtile AABBs (lo3, hi3, pad2) -- XLA fallback.
    bounds_planar: [8, nstp] the same, transposed + lane-padded with
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
    world_lo: Any  # [3] scene AABB (ray-sort quantization)
    world_ext: Any  # [3]

    @staticmethod
    def from_tris(p0, e1, e2) -> "TwoLevelTris":
        p0 = np.asarray(p0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        T = p0.shape[0]
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

        bounds = np.zeros((nst, 8), np.float32)
        for j in range(nst):
            a, b = j * ST, min((j + 1) * ST, T)
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
        nstp = (nst + 127) // 128 * 128
        bp = np.full((8, nstp), 1e30, np.float32)
        bp[0:3, :nst] = bounds[:, 0:3].T
        bp[3:6, :nst] = bounds[:, 3:6].T

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


def _epilogue16(out, best_t, best_id, base, iota):
    """Shared VPU tail on the one-dot output: sign tests, plane t,
    running (min, argmin).  out: [5*ST, Rt]; expression order matches
    accel/fused.py:_epilogue so results stay bit-identical."""
    inf = jnp.float32(1e30)
    w0 = out[0:ST]
    w1 = out[ST:2 * ST]
    w2 = out[2 * ST:3 * ST]
    num = out[3 * ST:4 * ST]
    den = out[4 * ST:5 * ST]
    wmin = jnp.minimum(jnp.minimum(w0, w1), w2)
    wmax = jnp.maximum(jnp.maximum(w0, w1), w2)
    inside = (wmin >= 0) | (wmax <= 0)
    safe = jnp.abs(den) > 1e-12
    t = jnp.where(safe, num / jnp.where(safe, den, 1.0), inf)
    tc = jnp.where(inside & (t > 1e-4), t, inf)
    tmin = jnp.min(tc, axis=0, keepdims=True)
    amin = jnp.min(
        jnp.where(tc <= tmin, iota, jnp.int32(2**30)), axis=0, keepdims=True
    )
    better = tmin < best_t
    return (
        jnp.where(better, tmin, best_t),
        jnp.where(better, amin + base, best_id),
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
# Cull: per-block subtile votes on the VPU.


def _worklist_kernel(bounds_ref, rays_ref, key_ref, *, NSTP, RT):
    """Per-block subtile cull: subtiles ride the 128-lane axis, rays
    sweep in 8-sublane chunks, every op is a native [8, NSTP]
    broadcast -- no HBM temporaries."""
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
def _votes_pallas(bounds_planar, rays_t, interpret: bool = False):
    """(vote [G, NSTP] f32 0/1) from rays_t [G, RT, 8]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, RT = rays_t.shape[0], rays_t.shape[1]
    NSTP = bounds_planar.shape[1]
    kern = functools.partial(_worklist_kernel, NSTP=NSTP, RT=RT)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, NSTP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # [G, 1, NSTP]: Mosaic rejects (1, N) blocks over [G, N]
        # (last-two-dims rule), so the block keeps a unit sublane dim.
        out_specs=pl.BlockSpec((1, 1, NSTP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, NSTP), jnp.float32),
        interpret=interpret,
    )(bounds_planar, rays_t)[:, 0]


def _votes_xla(bounds, o, d, t_max):
    """XLA fallback of the cull (CPU backend + tests): [G, nst] bool."""
    R = o.shape[0]
    G = R // RT_WALK
    nst = bounds.shape[0]
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                    jnp.where(d < 0, -1e12, 1e12))
    lo = bounds[:, 0:3]
    hi = bounds[:, 3:6]

    def per_block(args):
        ob, invb, tmb = args  # [RT, 3], [RT, 3], [RT]
        tn = jnp.full((RT_WALK, nst), -jnp.float32(1e30))
        tf = jnp.broadcast_to(tmb[:, None], (RT_WALK, nst))
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


def _compact(vote):
    """Sort-free worklist compaction: vote [G, nst] bool ->
    (order [G, MAXS] int32, n_eff [G] int32).

    order[g, j] = id of the (j+1)-th voting subtile, found by ranking
    the vote cumsum (elementwise compares; no [G, nst] sort).  Blocks
    with more than MAXS votes fall back to the dense walk: order
    becomes iota and n_eff = nst, which the kernel detects by
    n_eff > MAXS -- conservative, never drops a candidate.
    """
    G, nst = vote.shape
    cs = jnp.cumsum(vote.astype(jnp.int32), axis=1)
    count = cs[:, -1]
    over = count > MAXS
    tgt = jnp.arange(1, MAXS + 1, dtype=jnp.int32)

    def chunk(csb):
        return jnp.sum(csb[:, :, None] < tgt[None, None, :], axis=1
                       ).astype(jnp.int32)

    CH = 8
    Gc = -(-G // CH)
    if Gc * CH != G:
        cs = jnp.pad(cs, ((0, Gc * CH - G), (0, 0)))
    order = jax.lax.map(chunk, cs.reshape(Gc, CH, nst)
                        ).reshape(Gc * CH, MAXS)[:G]
    order = jnp.where(over[:, None],
                      jnp.arange(MAXS, dtype=jnp.int32)[None], order)
    n_eff = jnp.where(over, nst, count)
    return order, n_eff


# ---------------------------------------------------------------------------
# Walk: one K16 dot + epilogue per worklist subtile.


def _kernel(count_ref, order_ref, feat_ref, tmax_ref, tab_hbm,
            t_out, id_out, buf, best_t_s, best_id_s, sem,
            *, any_hit: bool, nst: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    feat = feat_ref[0]  # [16, RT]
    n = count_ref[g]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ST, RT_WALK), 0)
    best_t_s[:] = tmax_ref[0]
    best_id_s[:] = jnp.full((1, RT_WALK), -1, jnp.int32)

    def tid_at(k):
        # Overflow blocks (n > MAXS) walk densely: subtile id == k.
        return jnp.where(n > jnp.int32(MAXS), k,
                         order_ref[g, jnp.minimum(k, MAXS - 1)])

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
            bt, bid = _epilogue16(out, best_t_s[:], best_id_s[:],
                                  tid_at(k) * ST, iota)
            best_t_s[:] = bt
            best_id_s[:] = bid

            @pl.when(k + NBUF < n)
            def _():
                copy(k + NBUF, slot).start()

            return 0

        jax.lax.fori_loop(0, n, body, 0)

    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]


@functools.partial(jax.jit, static_argnames=("any_hit", "nst", "interpret"))
def _walk_pallas(table, order, count, feat_t, t_max, nst: int,
                 any_hit: bool = False, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = feat_t.shape[0]
    kern = functools.partial(_kernel, any_hit=any_hit, nst=nst)
    feat_spec = pl.BlockSpec((1, 16, RT_WALK), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RT_WALK), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
    )(count, order, feat_t, t_max[:, None, :], table)


def _walk_xla(tl: "TwoLevelTris", order, n_eff, feat, t_max):
    """XLA reference of the worklist walk (CPU backend + tests): per
    block, gather worklist subtiles and run the shared dot+epilogue.
    Overflow blocks scan every subtile (same dense-fallback semantics
    as the kernel)."""
    G = feat.shape[0]
    nst = tl.table.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (ST, RT_WALK), 0)

    def per_block(args):
        orderb, nb, featb, tmb = args
        dense = nb > MAXS

        def body(carry, k):
            best_t, best_id = carry
            tid = jnp.where(dense, k, orderb[jnp.minimum(k, MAXS - 1)])
            tab = jnp.take(tl.table, tid, axis=0)  # [16, 5*ST]
            out = _dot16(tab, featb)
            bt, bid = _epilogue16(out, best_t, best_id, tid * ST, iota)
            skip = k >= nb
            return (jnp.where(skip, best_t, bt),
                    jnp.where(skip, best_id, bid)), None

        init = (tmb[None, :], jnp.full((1, RT_WALK), -1, jnp.int32))
        (bt, bid), _ = jax.lax.scan(body, init, jnp.arange(nst))
        return bt[0], bid[0]

    return jax.lax.map(per_block, (order, n_eff, feat, t_max))


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
    blocks of them skip every DMA."""
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
                       any_hit: bool = False, sort: bool = True):
    """Closest (or any) hit; same contract as fused.intersect_fused.

    sort=True reorders rays by (direction octant, origin Morton cell)
    before blocking: the worklist cull is per RT_WALK-ray BLOCK, so
    block coherence decides how many subtiles each block walks.
    Secondary/bounce rays arrive shuffled from the wavefront integrator
    and need it; already-coherent batches (camera/shadow rays in pixel
    order) can pass sort=False to skip the argsort + two packed
    gathers.  Results are identical either way (the worklist is
    conservative and the epilogue math is shared)."""
    R = o.shape[0]
    if sort:
        sort_key = _ray_sort_keys(tl, o, d, t_max)
        perm = jnp.argsort(sort_key)
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
    if on_tpu:
        inv_p = jnp.where(jnp.abs(d_p) > 1e-12,
                          1.0 / jnp.where(d_p == 0, 1.0, d_p),
                          jnp.where(d_p < 0, -1e12, 1e12))
        rays_t = jnp.concatenate(
            [o_p, inv_p, tm_p[:, None], jnp.zeros((Rp, 1))],
            axis=-1).reshape(G, RT_WALK, 8)
        vote = _votes_pallas(tl.bounds_planar, rays_t)[:, :nst] > 0.5
    else:
        vote = _votes_xla(tl.bounds, o_p, d_p, tm_p)
    order, n_eff = _compact(vote)

    feat_t = ray_features16(o_p, d_p).reshape(
        G, RT_WALK, 16).transpose(0, 2, 1)
    tm_t = tm_p.reshape(G, RT_WALK)
    if on_tpu:
        ts, ids = [], []
        for g0 in range(0, G, _G_SMEM):
            g1 = min(g0 + _G_SMEM, G)
            tt, ii = _walk_pallas(
                tl.table, order[g0:g1], n_eff[g0:g1],
                feat_t[g0:g1], tm_t[g0:g1], nst=nst, any_hit=any_hit,
            )
            ts.append(tt)
            ids.append(ii)
        t = jnp.concatenate(ts, axis=0) if len(ts) > 1 else ts[0]
        idx = jnp.concatenate(ids, axis=0) if len(ids) > 1 else ids[0]
    else:
        t, idx = _walk_xla(tl, order, n_eff, feat_t, tm_t)
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
