"""Fused dense intersection: ray x triangle testing as one MXU matmul.

Replaces the reference's per-ray BVH walk (src/accelerators/bvh.cpp:707+,
pointer-chasing over LinearBVHNodes) for small/medium scenes with a
TPU-shaped formulation: a ray-triangle test is a *bilinear form* in
Plucker coordinates, so testing a ray tile against a triangle tile is

    out[5*Tt, Rt] = tri_rows[5*Tt, 16] @ ray_feats[16, Rt]

on the systolic array, followed by a cheap VPU epilogue (sign tests +
plane-t + running min).  Per (ray, tri) pair the three edge "side"
products decide inside/outside and one plane equation yields t:

    w_k  = d . (a_k x b_k) + (b_k - a_k) . (o x d)   (edge k: a_k -> b_k)
    hit  = all w_k same sign
    t    = (n.v0 - n.o) / (n.d),   n = e1 x e2

The Pallas kernel keeps the whole packed triangle table in VMEM and
streams ray tiles through it, so (unlike the XLA dense path in
render/intersect.py) no [R, T] temporary ever touches HBM and there is
no serial lockstep walk at all -- the 150-step while_loop of
accel/onehot.py collapses into ceil(T/Tt) independent matmuls.

Precision: dots run at Precision.HIGHEST (6-pass bf16 decomposition,
~f32-exact).  The sign test accepts both orientations and treats w == 0
as inside on either side, so shared-edge hits resolve to whichever
triangle is nearer -- the same robustness class as the f32
Moller-Trumbore used elsewhere (cf. reference watertight test,
src/shapes/triangle.cpp:160+, which matters at CPU f64 only).

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

RAY_TILE = 256  # lanes per kernel step (2 VREG lane groups)
TRI_TILE = 256  # triangles per inner step
FUSED_MAX_TRIS = 16384  # 5*16*4 B/tri -> 5.2 MB VMEM table cap
_K = 16  # ray feature rows (10 used, padded to a sublane multiple)


class FusedTris(NamedTuple):
    """Packed per-triangle row table for the bilinear-form test.

    tri_table: [Ntt, 5, TRI_TILE, 16] f32 -- row groups per tile:
       0..2: edge Plucker columns [cross(a,b), b-a, 0...]
       3:    plane numerator      [0,0,0, 0,0,0, -n, n.v0, 0...]
       4:    plane denominator    [n, 0...]
    Padded triangle rows are all-zero -> w=0 (inside) but den=0 -> t=inf.
    """

    tri_table: Any
    n_tris: int

    @staticmethod
    def from_tris(p0, e1, e2) -> "FusedTris":
        p0 = np.asarray(p0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        T = p0.shape[0]
        ntt = max(1, -(-T // TRI_TILE))
        Tp = ntt * TRI_TILE
        v0, v1, v2 = p0, p0 + e1, p0 + e2
        n = np.cross(e1, e2)
        rows = np.zeros((5, Tp, _K), np.float32)
        for k, (a, b) in enumerate(((v0, v1), (v1, v2), (v2, v0))):
            rows[k, :T, 0:3] = np.cross(a, b)
            rows[k, :T, 3:6] = b - a
        rows[3, :T, 6:9] = -n
        rows[3, :T, 9] = np.sum(n * v0, axis=-1)
        rows[4, :T, 0:3] = n
        table = np.ascontiguousarray(
            rows.reshape(5, ntt, TRI_TILE, _K).transpose(1, 0, 2, 3)
        )
        return FusedTris(tri_table=jnp.asarray(table), n_tris=T)


def ray_features(o, d):
    """[R,3] origins/directions -> [R,16] bilinear-form ray rows."""
    m = jnp.cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    zero = jnp.zeros(o.shape[:-1] + (6,), o.dtype)
    return jnp.concatenate([d, m, o, one, zero], axis=-1)


def _epilogue(out, best_t, best_id, base, Tt):
    """Shared VPU tail: sign tests, plane t, running (min, argmin).

    out: [5*Tt, Rt] bilinear products; best_t/best_id: [1, Rt]."""
    w0 = out[0:Tt]
    w1 = out[Tt : 2 * Tt]
    w2 = out[2 * Tt : 3 * Tt]
    num = out[3 * Tt : 4 * Tt]
    den = out[4 * Tt : 5 * Tt]
    inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | (
        (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
    )
    inf = jnp.float32(1e30)  # Python-literal INF: Pallas kernels cannot
    # capture module-level device constants (cm.INF) as closures.
    safe = jnp.abs(den) > 1e-12
    t = jnp.where(safe, num / jnp.where(safe, den, 1.0), inf)
    tc = jnp.where(inside & (t > 1e-4), t, inf)
    tmin = jnp.min(tc, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, tc.shape, 0) + base
    amin = jnp.min(
        jnp.where(tc <= tmin, iota, jnp.int32(2**30)), axis=0, keepdims=True
    )
    better = tmin < best_t
    return (
        jnp.where(better, tmin, best_t),
        jnp.where(better, amin, best_id),
    )


def _kernel(rayf_ref, tmax_ref, tri_ref, t_out, id_out, *, n_tiles):
    rayf = rayf_ref[0]  # [16, Rt]

    def body(j, carry):
        blk = tri_ref[j].reshape(5 * TRI_TILE, _K)
        out = jax.lax.dot_general(
            blk, rayf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return _epilogue(out, *carry, j * TRI_TILE, TRI_TILE)

    init = (tmax_ref[0], jnp.full((1, RAY_TILE), -1, jnp.int32))
    best_t, best_id = jax.lax.fori_loop(0, n_tiles, body, init)
    t_out[0] = best_t
    id_out[0] = best_id


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _intersect_pallas(tri_table, rayf, t_max, n_tiles: int,
                      interpret: bool = False):
    """rayf: [G, 16, Rt], t_max: [G, Rt] -> (t, id) each [G, Rt]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = rayf.shape[0]
    kern = functools.partial(_kernel, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, _K, RAY_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_table.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(rayf, t_max[:, None, :], tri_table)


def _intersect_ref(tri_table, rayf, t_max):
    """Pure-jnp reference of the kernel math (CPU backend + tests).

    rayf: [R, 16]; returns (t [R], id [R])."""
    ntt = tri_table.shape[0]
    rayf_t = rayf.T  # [16, R]
    R = rayf.shape[0]

    def body(carry, blk_base):
        blk, base = blk_base
        out = jax.lax.dot_general(
            blk.reshape(5 * TRI_TILE, _K), rayf_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        best_t, best_id = _epilogue(out, carry[0], carry[1], base, TRI_TILE)
        return (best_t, best_id), None

    init = (t_max[None, :], jnp.full((1, R), -1, jnp.int32))
    bases = (jnp.arange(ntt) * TRI_TILE).astype(jnp.int32)
    (best_t, best_id), _ = jax.lax.scan(body, init, (tri_table, bases))
    return best_t[0], best_id[0]


def intersect_fused(ft: FusedTris, o, d, t_max, any_hit: bool = False):
    """Closest hit against all triangles.  Returns (t, tri_id, hit); t
    keeps the incoming t_max value on miss (callers compare t < t_max).

    any_hit is accepted for interface parity with the traversal paths;
    the dense form computes every pair either way."""
    R = o.shape[0]
    rayf = ray_features(o, d)
    if jax.default_backend() != "tpu":
        t, idx = _intersect_ref(ft.tri_table, rayf, t_max)
        return t, idx, idx >= 0

    G = max(1, -(-R // RAY_TILE))
    Rp = G * RAY_TILE

    def pad(x, fill):
        return jnp.pad(x, [(0, Rp - R)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    rayf_g = pad(rayf, 0.0).reshape(G, RAY_TILE, _K).transpose(0, 2, 1)
    tmax_g = pad(t_max, 0.0).reshape(G, RAY_TILE)
    t, idx = _intersect_pallas(
        ft.tri_table, rayf_g, tmax_g, n_tiles=ft.tri_table.shape[0]
    )
    t = t.reshape(-1)[:R]
    idx = idx.reshape(-1)[:R]
    return t, idx, idx >= 0
