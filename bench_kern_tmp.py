"""Tile-step cost breakdown for the twolevel pallas walk (temp, v5e).

Variants of the kernel with pieces removed, same worklists:
  full      : dots + epilogue (production)
  dots_only : dots, epilogue replaced by cheap min over w
  dma_only  : DMA + loop, no dots/epilogue
  onedot    : combined K=16 single dot + epilogue (candidate opt)
"""
import functools, time, sys, tempfile
import jax, jax.numpy as jnp, numpy as np
from statmc_tpu.testscenes import terrain_scene_text
from statmc_tpu.driver import load
from statmc_tpu.accel import twolevel as TL
from statmc_tpu.accel.fused import ray_features, RAY_TILE, TRI_TILE, _K, _epilogue, _PRECISION

text = terrain_scene_text(width=1280, height=720, spp=4, iterations=1, maxdepth=8)
tmp = tempfile.mkdtemp(); path = tmp + "/terrain-proxy.pbrt"
open(path, "w").write(text)
r = load(path)
tl = r.s.bvh
R = 32768
rng = np.random.default_rng(0)
ob = jnp.asarray(rng.random((R,3), np.float32)*14-7)
db_ = rng.standard_normal((R,3)).astype(np.float32)
db = jnp.asarray(db_/np.linalg.norm(db_,axis=1,keepdims=True))
t_max = jnp.full((R,), 1e30, jnp.float32)

def prep(o,d,tm):
    key = TL._ray_sort_keys(tl,o,d,tm); perm = jnp.argsort(key)
    o2,d2,tm2 = o[perm], d[perm], tm[perm]
    raye, rayp, _ = ray_features(o2,d2)
    G = R//RAY_TILE
    order, tnear, count = TL._block_worklists(tl.tile_bounds, o2, d2, tm2)
    raye_t = raye.reshape(G,RAY_TILE,_K).transpose(0,2,1)
    rayp_t = rayp.reshape(G,RAY_TILE,_K).transpose(0,2,1)
    return order, tnear, count, raye_t, rayp_t, tm2.reshape(G,RAY_TILE)
args = [jax.block_until_ready(x) for x in jax.jit(prep)(ob,db,t_max)]
order, tnear, count, raye_t, rayp_t, tm_t = args
G = raye_t.shape[0]
print("G:", G, "mean tiles/block:", float(count.mean()), file=sys.stderr)

def timeit(fn, *a, n=30, **kw):
    out = fn(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _dot_t(a, b):
    return jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32, precision=_PRECISION)

def make_kernel(mode):
    def _kernel(count_ref, order_ref, tnear_ref, raye_ref, rayp_ref, tmax_ref,
                tab_hbm, t_out, id_out, buf, best_t_s, best_id_s, sem):
        g = pl.program_id(0)
        raye = raye_ref[0]; rayp = rayp_ref[0]
        n = count_ref[g]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)
        best_t_s[:] = tmax_ref[0]
        best_id_s[:] = jnp.full((1, RAY_TILE), -1, jnp.int32)
        def copy(k, slot):
            tid = order_ref[g, k]
            return pltpu.make_async_copy(tab_hbm.at[tid], buf.at[slot], sem.at[slot])
        @pl.when((n > 0) & jnp.any(best_t_s[:] > 0))
        def _():
            copy(0, 0).start()
            def cond(k):
                return (k < n) & jnp.any(best_t_s[:] * 1.0001 > tnear_ref[g, k])
            def body(k):
                slot = jax.lax.rem(k, 2)
                @pl.when(k + 1 < n)
                def _():
                    copy(k + 1, 1 - slot).start()
                copy(k, slot).wait()
                tab = buf[slot]
                if mode == "dma_only":
                    # touch the buffer so the DMA isn't dead-code'd
                    best_t_s[:] = jnp.minimum(
                        best_t_s[:], jnp.abs(jnp.min(tab)) + 1e20)
                elif mode == "vpu":
                    # K=8 contraction as 8 explicit broadcast FMAs per
                    # plane: exact f32 on the VPU, no MXU passes.
                    def contract(tabp, ray):
                        acc = tabp[0].reshape(TRI_TILE, 1) * ray[0].reshape(1, RAY_TILE)
                        for j in range(1, _K):
                            acc = acc + tabp[j].reshape(TRI_TILE, 1) * ray[j].reshape(1, RAY_TILE)
                        return acc
                    w = jnp.concatenate([contract(tab[c], raye) for c in range(3)], axis=0)
                    nd = jnp.concatenate([contract(tab[3 + c], rayp) for c in range(2)], axis=0)
                    bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                                        order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
                    best_t_s[:] = bt
                    best_id_s[:] = bid
                elif mode == "algx3":
                    def dot3(a, b):
                        return jax.lax.dot_general(
                            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3)
                    w = jnp.concatenate([dot3(tab[c], raye) for c in range(3)], axis=0)
                    nd = jnp.concatenate([dot3(tab[3 + c], rayp) for c in range(2)], axis=0)
                    bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                                        order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
                    best_t_s[:] = bt
                    best_id_s[:] = bid
                elif mode == "dots_only":
                    w = jnp.concatenate([_dot_t(tab[c], raye) for c in range(3)], axis=0)
                    nd = jnp.concatenate([_dot_t(tab[3 + c], rayp) for c in range(2)], axis=0)
                    s = jnp.min(w, axis=0, keepdims=True) + jnp.min(nd, axis=0, keepdims=True)
                    best_t_s[:] = jnp.minimum(best_t_s[:], jnp.abs(s) + 1e20)
                else:  # full
                    w = jnp.concatenate([_dot_t(tab[c], raye) for c in range(3)], axis=0)
                    nd = jnp.concatenate([_dot_t(tab[3 + c], rayp) for c in range(2)], axis=0)
                    bt, bid = _epilogue(w, nd, best_t_s[:], best_id_s[:],
                                        order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
                    best_t_s[:] = bt
                    best_id_s[:] = bid
                return k + 1
            last = jax.lax.while_loop(cond, body, 0)
            @pl.when(last < n)
            def _():
                copy(last, jax.lax.rem(last, 2)).wait()
        t_out[0] = best_t_s[:]
        id_out[0] = best_id_s[:]
    return _kernel

@functools.partial(jax.jit, static_argnames=("mode",))
def run_variant(table, order, tnear, count, raye, rayp, t_max, mode="full"):
    G = raye.shape[0]
    kern = make_kernel(mode)
    ray_spec = pl.BlockSpec((1, _K, RAY_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(G,),
        in_specs=[ray_spec, ray_spec, flat_spec, pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[flat_spec, flat_spec],
        scratch_shapes=[pltpu.VMEM((2, 5, _K, TRI_TILE), jnp.float32),
                        pltpu.VMEM((1, RAY_TILE), jnp.float32),
                        pltpu.VMEM((1, RAY_TILE), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.float32),
                   jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(count, order, tnear, raye, rayp, t_max[:, None, :], table)

# ---- X6-combined: one K=64 bf16 dot per tile-step, f32-class ----
def _split3(x):
    """f32 -> (hi, mid, lo) bf16 triple summing to ~24 mantissa bits."""
    import jax.numpy as j
    x = j.asarray(x, j.float32)
    a1 = x.astype(j.bfloat16)
    r1 = x - a1.astype(j.float32)
    a2 = r1.astype(j.bfloat16)
    a3 = (r1 - a2.astype(j.float32)).astype(j.bfloat16)
    return a1, a2, a3

def build_x6_table(tab_f32):
    """[ntt,5,8,256] f32 -> [ntt,64,1280] bf16 rows [A1,A1,A2,A2,A1,A3]."""
    tab = np.asarray(tab_f32)
    ntt = tab.shape[0]
    t10 = np.zeros((ntt, 10, 5 * TRI_TILE), np.float32)
    for c in range(3):
        t10[:, 0:6, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 0:6, :]
    for c in (3, 4):
        t10[:, 0:3, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 0:3, :]
        t10[:, 6:9, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 3:6, :]
        t10[:, 9, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 6, :]
    a1, a2, a3 = [np.asarray(x) for x in _split3(jnp.asarray(t10))]
    out = np.zeros((ntt, 64, 5 * TRI_TILE), dtype=a1.dtype)
    out[:, 0:10] = a1; out[:, 10:20] = a1
    out[:, 20:30] = a2; out[:, 30:40] = a2
    out[:, 40:50] = a1; out[:, 50:60] = a3
    return jnp.asarray(out)

def rays_x6(raye_t, rayp_t):
    """[G,8,Rt] f32 x2 -> [G,64,Rt] bf16 [B1,B2,B1,B2,B3,B1]."""
    r10 = jnp.concatenate([raye_t[:, 0:6], rayp_t[:, 3:7]], axis=1)
    b1, b2, b3 = _split3(r10)
    z = jnp.zeros_like(b1[:, 0:4])
    return jnp.concatenate([b1, b2, b1, b2, b3, b1, z], axis=1)

# ---- X3-combined variant: one K=32 bf16 dot per tile-step ----
def build_x3_table(tab_f32):
    """[ntt,5,8,256] f32 -> [ntt,32,1280] bf16 (hi,hi,lo blocks)."""
    tab = np.asarray(tab_f32)
    ntt = tab.shape[0]
    t10 = np.zeros((ntt, 10, 5 * TRI_TILE), np.float32)
    for c in range(3):  # edge rows: dims 0:6 <- orig 0:6
        t10[:, 0:6, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 0:6, :]
    for c in (3, 4):    # plane rows: 0:3<-0:3, 6:9<-3:6, 9<-6
        sl = np.s_[:, :, c*TRI_TILE:(c+1)*TRI_TILE]
        t10[:, 0:3, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 0:3, :]
        t10[:, 6:9, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 3:6, :]
        t10[:, 9, c*TRI_TILE:(c+1)*TRI_TILE] = tab[:, c, 6, :]
    hi = t10.astype(np.float16)  # placeholder; real bf16 below
    import jax.numpy as jnp2
    hi = np.asarray(jnp.asarray(t10).astype(jnp.bfloat16))
    lo = np.asarray((jnp.asarray(t10) - jnp.asarray(hi).astype(jnp.float32)).astype(jnp.bfloat16))
    out = np.zeros((ntt, 32, 5 * TRI_TILE), dtype=hi.dtype)
    out[:, 0:10] = hi
    out[:, 10:20] = hi
    out[:, 20:30] = lo
    return jnp.asarray(out)

def rays_x3(raye_t, rayp_t):
    """[G,8,Rt] f32 x2 -> [G,32,Rt] bf16 [r_hi, r_lo, r_hi, 0]."""
    r10 = jnp.concatenate([raye_t[:, 0:6], rayp_t[:, 3:7]], axis=1)
    r_hi = r10.astype(jnp.bfloat16)
    r_lo = (r10 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    z = jnp.zeros_like(r10[:, 0:2]).astype(jnp.bfloat16)
    return jnp.concatenate([r_hi, r_lo, r_hi, z], axis=1)

def _kernel_x3(count_ref, order_ref, tnear_ref, ray32_ref, tmax_ref,
               tab_hbm, t_out, id_out, buf, best_t_s, best_id_s, sem):
    g = pl.program_id(0)
    ray32 = ray32_ref[0]  # [32, Rt] bf16
    n = count_ref[g]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, RAY_TILE), 0)
    best_t_s[:] = tmax_ref[0]
    best_id_s[:] = jnp.full((1, RAY_TILE), -1, jnp.int32)
    def copy(k, slot):
        tid = order_ref[g, k]
        return pltpu.make_async_copy(tab_hbm.at[tid], buf.at[slot], sem.at[slot])
    @pl.when((n > 0) & jnp.any(best_t_s[:] > 0))
    def _():
        copy(0, 0).start()
        def cond(k):
            return (k < n) & jnp.any(best_t_s[:] * 1.0001 > tnear_ref[g, k])
        def body(k):
            slot = jax.lax.rem(k, 2)
            @pl.when(k + 1 < n)
            def _():
                copy(k + 1, 1 - slot).start()
            copy(k, slot).wait()
            out = jax.lax.dot_general(
                buf[slot], ray32,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1280, 512]
            bt, bid = _epilogue(out[0:3*TRI_TILE], out[3*TRI_TILE:5*TRI_TILE],
                                best_t_s[:], best_id_s[:],
                                order_ref[g, k] * TRI_TILE, TRI_TILE, iota)
            best_t_s[:] = bt
            best_id_s[:] = bid
            return k + 1
        last = jax.lax.while_loop(cond, body, 0)
        @pl.when(last < n)
        def _():
            copy(last, jax.lax.rem(last, 2)).wait()
    t_out[0] = best_t_s[:]
    id_out[0] = best_id_s[:]

@jax.jit
def run_x3(table32, order, tnear, count, ray32, t_max):
    G = ray32.shape[0]
    KK = ray32.shape[1]
    ray_spec = pl.BlockSpec((1, KK, RAY_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(G,),
        in_specs=[ray_spec, flat_spec, pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[flat_spec, flat_spec],
        scratch_shapes=[pltpu.VMEM((2, KK, 5 * TRI_TILE), jnp.bfloat16),
                        pltpu.VMEM((1, RAY_TILE), jnp.float32),
                        pltpu.VMEM((1, RAY_TILE), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(_kernel_x3, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.float32),
                   jax.ShapeDtypeStruct((G, 1, RAY_TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(count, order, tnear, ray32, t_max[:, None, :], table32)

ref = None
import sys
for mode in ["full", "x3"]:
    print(f"starting {mode}", file=sys.stderr, flush=True)
    if mode == "x6":
        table64 = build_x6_table(tl.table)
        ray64 = jax.block_until_ready(jax.jit(rays_x6)(raye_t, rayp_t))
        print("x6 built, compiling...", file=sys.stderr, flush=True)
        fn = lambda *a: run_x3(table64, order, tnear, count, ray64, tm_t)
        out = [np.asarray(x) for x in jax.block_until_ready(fn())]
        tdiff = np.abs(out[0] - ref[0]).max()
        iddiff = (out[1] != ref[1]).mean()
        miss = ((out[1] < 0) != (ref[1] < 0)).mean()
        print(f"  x6 vs full: max|t diff|={tdiff:.3e} id mismatch={iddiff:.6f} hit/miss mismatch={miss:.6f}")
        ms = timeit(fn)
        print(f"x6: {ms:.3f} ms")
        continue
    if mode == "x3":
        table32 = build_x3_table(tl.table)
        print("x3 table built", file=sys.stderr, flush=True)
        ray32 = jax.block_until_ready(jax.jit(rays_x3)(raye_t, rayp_t))
        print("rays built, compiling x3 kernel...", file=sys.stderr, flush=True)
        fn = lambda *a: run_x3(table32, order, tnear, count, ray32, tm_t)
        out = [np.asarray(x) for x in jax.block_until_ready(fn())]
        tdiff = np.abs(out[0] - ref[0]).max()
        rel = (np.abs(out[0] - ref[0]) / np.maximum(np.abs(ref[0]), 1e-6)).max()
        iddiff = (out[1] != ref[1]).mean()
        print(f"  x3 vs full: max|t diff|={tdiff:.3e} maxrel={rel:.3e} id mismatch frac={iddiff:.6f}")
        ms = timeit(fn)
        print(f"x3: {ms:.3f} ms")
        break
    out = run_variant(tl.table, order, tnear, count, raye_t, rayp_t, tm_t, mode=mode)
    ref = [np.asarray(x) for x in jax.block_until_ready(out)]
    ms = timeit(run_variant, tl.table, order, tnear, count, raye_t, rayp_t, tm_t, mode=mode)
    print(f"{mode}: {ms:.3f} ms")

import sys; sys.exit(0)
for mode in ["full", "vpu", "algx3"]:
    try:
        out = run_variant(tl.table, order, tnear, count, raye_t, rayp_t, tm_t, mode=mode)
        out = [np.asarray(x) for x in jax.block_until_ready(out)]
        if ref is None:
            ref = out
        else:
            tdiff = np.abs(out[0] - ref[0]).max()
            iddiff = (out[1] != ref[1]).mean()
            print(f"  {mode} vs full: max|t diff|={tdiff:.3e} id mismatch frac={iddiff:.5f}")
        ms = timeit(run_variant, tl.table, order, tnear, count, raye_t, rayp_t, tm_t, mode=mode)
        print(f"{mode}: {ms:.3f} ms")
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}")
