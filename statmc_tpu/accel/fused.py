"""Fused dense intersection: ray x triangle testing as MXU matmuls.

Replaces the reference's per-ray BVH walk (src/accelerators/bvh.cpp:707+,
pointer-chasing over LinearBVHNodes) for small/medium scenes with a
TPU-shaped formulation: a ray-triangle test is a *bilinear form* in
Plucker coordinates, so testing a ray tile against a triangle tile is
two small-K matmuls on the systolic array

    w   [3*Tt, Rt] = edge_rows [3*Tt, 8] @ [d; oxd]    (edge side products)
    n/d [2*Tt, Rt] = plane_rows[2*Tt, 8] @ [d; o; 1]   (plane numer/denom)

followed by a cheap VPU epilogue (sign tests + plane-t + running min).
Per (ray, tri) pair the three edge "side" products decide inside/outside
and one plane equation yields t:

    w_k  = d . (a_k x b_k) + (b_k - a_k) . (o x d)   (edge k: a_k -> b_k)
    hit  = all w_k same sign
    t    = (n.v0 - n.o) / (n.d),   n = e1 x e2

The Pallas kernel keeps the whole packed triangle table in VMEM and
streams ray tiles through it, so (unlike the XLA dense path in
render/intersect.py) no [R, T] temporary ever touches HBM and there is
no serial lockstep walk at all -- the ~150-step while_loop of
accel/onehot.py collapses into ceil(T/Tt) independent matmuls.

Tile culling (the BVH's job, re-shaped): triangles are Morton-ordered
so each TRI_TILE is spatially tight; per tile a conservative AABB is
kept in SMEM and each kernel step first slab-tests the whole ray tile
against it on the VPU ([1, Rt] vectors, ~20 ops).  The expensive
dot+epilogue runs under @pl.when only if ANY ray can still hit the box
closer than its current best -- conservative, so results are identical
to the unculled form.  Ray batches arrive in pixel order (primary and
shadow rays are coherent), which is what makes the any() predicate
selective.

Precision: dots run at Precision.HIGHEST (6-pass bf16 decomposition,
~f32-exact; Mosaic lowers only DEFAULT/HIGHEST, and single-pass bf16
is far too lossy for the sign tests).  The sign test accepts both
orientations and treats w == 0 as inside on either side, so shared-edge
hits resolve to whichever triangle is nearer (cf. reference watertight
test, src/shapes/triangle.cpp:160+, which matters at CPU f64 only).

Measured v5e crossover: this path wins up to FUSED_MAX_TRIS; larger
scenes fall back to the packed-table walk (accel/onehot.py) until the
two-level cluster scheme lands.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cm

RAY_TILE = 512  # lanes per kernel step
TRI_TILE = 256  # triangles per inner step
FUSED_MAX_TRIS = 16384  # 5*8*4 B/tri -> 2.6 MB VMEM table cap
_K = 8  # ray feature rows per dot (padded to a sublane multiple)
_PRECISION = jax.lax.Precision.HIGHEST  # 6-pass bf16 decomposition
# (Mosaic supports only DEFAULT/HIGHEST; DEFAULT is single-pass bf16 and
# far too lossy for the sign tests)


def _morton(cent: np.ndarray) -> np.ndarray:
    """30-bit Morton codes from [T,3] centroids (10 bits/axis)."""
    lo = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.minimum(((cent - lo) / ext * 1024.0).astype(np.uint64), 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))


class FusedTris(NamedTuple):
    """Packed per-triangle row tables for the bilinear-form test.

    Triangles are Morton-reordered (perm maps packed idx -> original);
    tile_bounds [Ntt, 8] holds each tile's conservative AABB
    (lo3, hi3, pad2) for the in-kernel cull.

    edge_table:  [Ntt, 3, TRI_TILE, 8] f32, rows [cross(a,b), b-a, 0, 0]
                 pairing with ray rows [d, o x d, 0, 0].
    plane_table: [Ntt, 2, TRI_TILE, 8] f32, row 0 (numerator)
                 [0,0,0, -n, n.v0, 0] and row 1 (denominator) [n, 0...],
                 pairing with ray rows [d, o, 1, 0].
    Padded triangle rows are all-zero -> w=0 (inside) but den=0 -> t=inf.
    """

    edge_table: Any
    plane_table: Any
    tile_bounds: Any
    perm: Any
    n_tris: int

    @staticmethod
    def from_tris(p0, e1, e2) -> "FusedTris":
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
        ntt = max(1, -(-T // TRI_TILE))
        Tp = ntt * TRI_TILE
        v0, v1, v2 = p0, p0 + e1, p0 + e2
        n = np.cross(e1, e2)
        er = np.zeros((3, Tp, _K), np.float32)
        for k, (a, b) in enumerate(((v0, v1), (v1, v2), (v2, v0))):
            er[k, :T, 0:3] = np.cross(a, b)
            er[k, :T, 3:6] = b - a
        pr = np.zeros((2, Tp, _K), np.float32)
        pr[0, :T, 3:6] = -n
        pr[0, :T, 6] = np.sum(n * v0, axis=-1)
        pr[1, :T, 0:3] = n
        bounds = np.zeros((ntt, 8), np.float32)
        for j in range(ntt):
            a, b = j * TRI_TILE, min((j + 1) * TRI_TILE, T)
            if a >= T:  # all-padding tile: point box no ray can enter
                bounds[j, 0:3] = 1e30
                bounds[j, 3:6] = 1e30
                continue
            lo = tlo[a:b].min(axis=0)
            hi = thi[a:b].max(axis=0)
            eps = 1e-4 * max(1.0, float(np.abs(np.stack([lo, hi])).max()))
            bounds[j, 0:3] = lo - eps
            bounds[j, 3:6] = hi + eps
        # Identity permutation (input already Morton-ordered, see
        # driver._morton_order_scene): store None so intersect paths
        # skip the per-call [T] remap gather entirely.
        if np.array_equal(order, np.arange(T)):
            perm = None
        else:
            perm_np = np.full((Tp,), -1, np.int32)
            perm_np[:T] = order.astype(np.int32)
            perm = jnp.asarray(perm_np)
        return FusedTris(
            edge_table=jnp.asarray(np.ascontiguousarray(
                er.reshape(3, ntt, TRI_TILE, _K).transpose(1, 0, 2, 3))),
            plane_table=jnp.asarray(np.ascontiguousarray(
                pr.reshape(2, ntt, TRI_TILE, _K).transpose(1, 0, 2, 3))),
            tile_bounds=jnp.asarray(bounds),
            perm=perm,
            n_tris=T,
        )


def ray_features(o, d):
    """[R,3] origins/directions -> ([R,8] edge rows, [R,8] plane rows,
    [R,8] bbox rows [inv_d, o, 0, 0])."""
    m = jnp.cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    zero2 = jnp.zeros(o.shape[:-1] + (2,), o.dtype)
    zero1 = jnp.zeros(o.shape[:-1] + (1,), o.dtype)
    # Degenerate-component fallback keeps the SIGN of d (a tiny negative
    # component must yield a large NEGATIVE inverse, or the slab test
    # collapses to tn=tf=0 and the cull stops being conservative).
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                    jnp.where(d < 0, -1e12, 1e12))
    ray_e = jnp.concatenate([d, m, zero2], axis=-1)
    ray_p = jnp.concatenate([d, o, one, zero1], axis=-1)
    ray_b = jnp.concatenate([inv, o, zero2], axis=-1)
    return ray_e, ray_p, ray_b


def _dot(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


def _epilogue(w, nd, best_t, best_id, base, Tt, iota):
    """Shared VPU tail: sign tests, plane t, running (min, argmin).

    w: [3*Tt, Rt] edge products; nd: [2*Tt, Rt]; best_t/best_id: [1, Rt];
    iota: hoisted [Tt, Rt] row indices (base added post-reduction)."""
    inf = jnp.float32(1e30)  # Python-literal INF: Pallas kernels cannot
    # capture module-level device constants (cm.INF) as closures.
    w0 = w[0:Tt]
    w1 = w[Tt : 2 * Tt]
    w2 = w[2 * Tt : 3 * Tt]
    num = nd[0:Tt]
    den = nd[Tt : 2 * Tt]
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


def _tile_cull(bounds_ref, j, inv, og, best_t):
    """Slab-test all rays in the tile against tile j's AABB; True when
    any ray enters the box in front of the origin and closer than its
    current best hit."""
    tn = jnp.full_like(best_t, -jnp.float32(1e30))
    tf = best_t  # entering beyond the current best cannot improve it
    for a in range(3):
        lo = bounds_ref[j, a]
        hi = bounds_ref[j, 3 + a]
        t0 = (lo - og[a : a + 1]) * inv[a : a + 1]
        t1 = (hi - og[a : a + 1]) * inv[a : a + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return jnp.any((tn <= tf * 1.0001) & (tf > 0))


def _kernel(raye_ref, rayp_ref, rayb_ref, tmax_ref, edge_ref, plane_ref,
            bounds_ref, t_out, id_out, best_t_s, best_id_s, *, n_tiles):
    from jax.experimental import pallas as pl

    raye = raye_ref[0]  # [8, Rt]
    rayp = rayp_ref[0]  # [8, Rt]
    inv = rayb_ref[0][0:3]  # [3, Rt]
    og = rayb_ref[0][3:6]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)
    best_t_s[:] = tmax_ref[0]
    best_id_s[:] = jnp.full((1, RAY_TILE), -1, jnp.int32)

    # Cull only when there are enough tiles for skips to outweigh the
    # @pl.when pipeline break (measured: at <=8 tiles every ray crosses
    # most tile boxes and the cond costs ~20% for nothing).
    use_cull = n_tiles >= 16

    def tile_work(j):
        w = _dot(edge_ref[j].reshape(3 * TRI_TILE, _K), raye)
        nd = _dot(plane_ref[j].reshape(2 * TRI_TILE, _K), rayp)
        bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                            j * TRI_TILE, TRI_TILE, iota)
        best_t_s[:] = bt
        best_id_s[:] = bid

    def body(j, _):
        if use_cull:
            @pl.when(_tile_cull(bounds_ref, j, inv, og, best_t_s[:]))
            def _():
                tile_work(j)
        else:
            tile_work(j)
        return 0

    # Whole-ray-tile liveness skip: lanes of terminated paths carry
    # t_max = 0 (integrator passes where(active, INF, 0)), so a ray tile
    # whose 512 lanes are all dead skips every triangle tile outright.
    @pl.when(jnp.any(tmax_ref[0] > 0))
    def _():
        jax.lax.fori_loop(0, n_tiles, body, 0)

    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _intersect_pallas(edge_table, plane_table, tile_bounds, raye, rayp,
                      rayb, t_max, n_tiles: int, interpret: bool = False):
    """ray*: [G, 8, Rt], t_max: [G, Rt] -> (t, id) each [G, 1, Rt].
    Returned ids index the Morton-ordered tables (remap via perm)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = raye.shape[0]
    kern = functools.partial(_kernel, n_tiles=n_tiles)
    ray_spec = pl.BlockSpec((1, _K, RAY_TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_TILE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            ray_spec, ray_spec, ray_spec, flat_spec,
            pl.BlockSpec(edge_table.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane_table.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tile_bounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[flat_spec, flat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_TILE), jnp.float32),
            pltpu.VMEM((1, RAY_TILE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Default scoped-vmem cap (16M) rejects the kernel beyond
            # ~20 tri tiles; physical VMEM is far larger on v5e.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(raye, rayp, rayb, t_max[:, None, :], edge_table, plane_table,
      tile_bounds)


def _intersect_ref(ft: "FusedTris", raye, rayp, t_max):
    """Pure-jnp reference of the kernel math, unculled (CPU backend +
    tests; the cull is conservative so results are identical).

    raye/rayp: [R, 8]; returns (t [R], id [R]) in Morton order."""
    ntt = ft.edge_table.shape[0]
    raye_t = raye.T
    rayp_t = rayp.T
    R = raye.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, R), 0)

    def body(carry, blk):
        eblk, pblk, base = blk
        w = _dot(eblk.reshape(3 * TRI_TILE, _K), raye_t)
        nd = _dot(pblk.reshape(2 * TRI_TILE, _K), rayp_t)
        best_t, best_id = _epilogue(w, nd, carry[0], carry[1], base,
                                    TRI_TILE, iota)
        return (best_t, best_id), None

    init = (t_max[None, :], jnp.full((1, R), -1, jnp.int32))
    bases = (jnp.arange(ntt) * TRI_TILE).astype(jnp.int32)
    (best_t, best_id), _ = jax.lax.scan(
        body, init, (ft.edge_table, ft.plane_table, bases)
    )
    return best_t[0], best_id[0]


def intersect_fused(ft: FusedTris, o, d, t_max, any_hit: bool = False,
                    compact: bool | None = None):
    """Closest hit against all triangles.  Returns (t, tri_id, hit); t
    keeps the incoming t_max value on miss (callers compare t < t_max).

    any_hit is accepted for interface parity with the traversal paths;
    the dense form computes every pair either way.

    compact=True partitions live lanes (t_max > 0) to the front with a
    stable 2-bucket counting sort before tiling, so the kernel's
    all-dead ray-tile skip actually fires: the integrator's RR kills
    lanes scattered through pixel order, and without the partition a
    512-lane tile is almost never ALL dead even when ~55% of lanes are
    (the round-4 dead-lane diagnosis, ARCHITECTURE.md roadmap #3).
    Results are identical (per-lane independent; exact unsort).
    Default: on for TPU batches of several tiles AND scenes of >=16
    triangle tiles.  Below that the skip has nothing to save (veach-mis
    is ONE tile) while the [R] cumsum/scatter/gather glue repeats every
    dispatch -- measured 8.27 -> 6.96 Mrays/s on the full veach bench
    when unconditionally on (BENCH r5 first run)."""
    R = o.shape[0]
    if compact is None:
        compact = (jax.default_backend() == "tpu" and R >= 4 * RAY_TILE
                   and ft.edge_table.shape[0] >= 16)
    if compact:
        live = t_max > 0
        cs = jnp.cumsum(live.astype(jnp.int32))
        n_live = cs[-1]
        iot = jnp.arange(R, dtype=jnp.int32)
        pos = jnp.where(live, cs - 1, n_live + iot - cs)
        perm = jnp.zeros((R,), jnp.int32).at[pos].set(iot)
        packed = jnp.concatenate([o, d, t_max[:, None]], axis=-1)[perm]
        o, d = packed[:, 0:3], packed[:, 3:6]
        t_max = packed[:, 6]
    raye, rayp, rayb = ray_features(o, d)
    if jax.default_backend() != "tpu":
        t, idx = _intersect_ref(ft, raye, rayp, t_max)
    else:
        G = max(1, -(-R // RAY_TILE))
        Rp = G * RAY_TILE

        def pad(x, fill):
            return jnp.pad(x, [(0, Rp - R)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        def tiles(x):
            return pad(x, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)

        t, idx = _intersect_pallas(
            ft.edge_table, ft.plane_table, ft.tile_bounds,
            tiles(raye), tiles(rayp), tiles(rayb),
            pad(t_max, 0.0).reshape(G, RAY_TILE),
            n_tiles=ft.edge_table.shape[0],
        )
        t = t.reshape(-1)[:R]
        idx = idx.reshape(-1)[:R]
    # Map Morton-packed ids back to original triangle ids (identity
    # when the scene tables were pre-Morton-ordered: perm is None, and
    # padded-row ids cannot win -- their den=0 makes t=inf).
    if ft.perm is not None:
        idx = jnp.where(idx >= 0, jnp.take(ft.perm, jnp.maximum(idx, 0)),
                        -1)
    else:
        idx = jnp.where(idx >= ft.n_tris, -1, idx)
    if compact:
        # Unsort exactly; t rides as bitcast int32 next to idx (int
        # transport preserves bit patterns; f32 transport canonicalizes
        # the -1 quiet-NaN pattern on TPU -- see twolevel.py).
        out = jnp.stack(
            [jax.lax.bitcast_convert_type(t, jnp.int32), idx], axis=-1
        )[pos]
        t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
        idx = out[:, 1]
    return t, idx, idx >= 0
