"""Micro-bench: _run_filter at bench shapes (720p, r=20). Temp file."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from statmc_tpu.denoise.filter_pallas import _run_filter

H, W, r = 720, 1280, 20
C, CF, G = 3, 6, 8
rng = np.random.default_rng(0)
mc = jnp.asarray(rng.random((H, W, C), np.float32))
d2 = jnp.asarray(rng.random((H, W, C), np.float32) * 0.1)
fm = jnp.asarray(rng.random((H, W, CF), np.float32))
gb = jnp.asarray(rng.random((H, W, G), np.float32))
v = jnp.ones((H, W), jnp.float32)

@jax.jit
def chain(fm, n):
    def body(i, f):
        out, w = _run_filter(mc, d2, f, gb, v, radius=r, ds_factor=-0.005,
                             gb_factors=(-1.0,)*G)
        return out
    return jax.lax.fori_loop(0, n, body, fm)

out = chain(fm, 1); jax.block_until_ready(out)
t0 = time.perf_counter(); out1 = chain(fm, 1); jax.block_until_ready(out1)
t1 = time.perf_counter(); out11 = chain(fm, 11); jax.block_until_ready(out11)
t2 = time.perf_counter()
per = ((t2-t1) - (t1-t0)) / 10
print(f"filter {H}x{W} r={r} C={C} CF={CF} G={G}: {per*1e3:.2f} ms/launch (chained)")
print("checksum", float(out11.sum()))
