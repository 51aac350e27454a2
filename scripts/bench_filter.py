"""Micro-bench: the Pallas statistical filter at the production bench
shape (1280x720, r=20), sweeping channel counts to expose the cost
split of the (2r+1)^2 VPU sweep.

Run ALONE on the TPU (one grant; see CLAUDE.md).  Usage:
    python scripts/bench_filter.py [th ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from statmc_tpu.denoise.filter_pallas import _run_filter

H, W, R = 720, 1280, 20
DS = -0.5 / (10.0 * 10.0)


def force(out):
    # 4-byte host read forces remote completion without the multi-MB
    # output transfer (the relay's block_until_ready returns before
    # remote completion, and np.asarray of the full output is
    # transfer-dominated: ~30 MB/s through the relay).
    return float(out[0][0, 0, 0])


def timeit(fn, n=5):
    force(fn())  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import os

    ths = [int(a) for a in sys.argv[1:]] or [48]
    rng = np.random.default_rng(0)

    def mk(c):
        return jnp.asarray(rng.random((H, W, c), np.float32))

    valid = jnp.ones((H, W))
    results = {}
    base_variants = [
        ("base6", 3, 6, 6, ths[0], {}),
        ("base", 3, 6, 3, ths[0], {}),
        ("C1", 1, 6, 3, ths[0], {}),
        ("G1", 3, 1, 3, ths[0], {}),
        ("CF1", 3, 6, 1, ths[0], {}),
        ("bf16", 3, 6, 3, ths[0], {"range_bf16": True}),
        ("bf16_acc", 3, 6, 3, ths[0],
         {"range_bf16": True, "accept_bf16": True}),
    ]
    if os.environ.get("BF_ONLY"):  # skip the channel-split variants
        base_variants = []
    for name, C, G, CF, th, kw in base_variants \
      + [(f"bf16_th{t}", 3, 6, 3, t, {"range_bf16": True})
         for t in ths[1:]] \
      + [(f"bf16_acc_th{t}", 3, 6, 3, t,
          {"range_bf16": True, "accept_bf16": True})
         for t in ths[1:]]:
        mc, d2, fm, gb = mk(C), mk(C), mk(CF), mk(G)
        gf = tuple([-0.5 / 0.01] * G)

        def fn():
            return _run_filter(mc, d2, fm, gb, valid, R, DS, gf, th=th,
                               **kw)

        try:
            ms = timeit(fn)
        except Exception as e:
            ms = f"FAIL {type(e).__name__}: {e}"[:120]
        results[name] = ms
        print(name, ms, flush=True)
    print("RESULTS", results)


if __name__ == "__main__":
    main()
