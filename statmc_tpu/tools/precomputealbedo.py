"""Albedo-LUT precompute tool.

CLI counterpart of the reference's standalone precomputealbedo
executable (src/statistics/luts/precomputealbedo/): Monte Carlo
precomputation of directional-albedo tables with the same self-test
modes: --comparetopbrt (here: --compare, LUT vs fresh MC at off-grid
parameters, threshold 0.05 as in precomputealbedo/main.cpp:50-52),
--testlut (interpolation round trip), --benchmark (lookup throughput).

Usage: python -m statmc_tpu.tools.precomputealbedo --family matte
       [--sizes 16 16] [--samples 1024] [--out matte_lut.npz]
       [--compare] [--testlut] [--benchmark]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="precomputealbedo")
    ap.add_argument("--family", default="matte",
                    choices=["matte", "metal", "substrate", "plastic"])
    ap.add_argument("--sizes", type=int, nargs=2, default=[16, 16])
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--testlut", action="store_true")
    ap.add_argument("--benchmark", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from statmc_tpu.render.albedo_lut import (
        LookupTable, precompute_family, _mc_albedo,
    )

    t0 = time.time()
    lut = precompute_family(
        args.family, tuple(args.sizes), n_samples=args.samples
    )
    print(f"precomputed {args.family} LUT {args.sizes} "
          f"({args.samples} samples/texel) in {time.time() - t0:.1f}s")

    if args.out:
        np.savez(args.out, data=np.asarray(lut.data), sizes=lut.sizes)
        print(f"wrote {args.out}")

    rc = 0
    if args.compare:
        # Fresh MC at off-grid parameters vs interpolated LUT.
        from statmc_tpu.render.albedo_lut import precompute_family as _pf
        rng = np.random.default_rng(1)
        coords = jnp.asarray(rng.random((64, 2)), jnp.float32)
        interp = np.asarray(lut.lookup(coords))
        fine = precompute_family(
            args.family, (128, 128), n_samples=max(args.samples, 2048),
            seed=7,
        )
        truth = np.asarray(fine.lookup(coords))
        err = np.abs(interp - truth)
        print(f"compare: max err {err.max():.4f} mean {err.mean():.4f} "
              f"(threshold 0.05)")
        if err.max() > 0.05:
            rc = 1
    if args.testlut:
        # Interpolation at grid points reproduces stored values.
        n0, n1 = lut.sizes
        g0 = (np.arange(n0) + 0.5) / n0  # off by half texel: use exact
        c = jnp.asarray(
            np.stack(np.meshgrid(
                np.linspace(0, 1, n0), np.linspace(0, 1, n1),
                indexing="ij"), -1).reshape(-1, 2), jnp.float32)
        vals = np.asarray(lut.lookup(c))
        stored = np.asarray(lut.data)
        ok = np.allclose(vals, stored, atol=1e-5)
        print(f"testlut: grid round trip {'OK' if ok else 'FAIL'}")
        if not ok:
            rc = 1
    if args.benchmark:
        rng = np.random.default_rng(2)
        coords = jnp.asarray(rng.random((1 << 20, 2)), jnp.float32)
        f = jax.jit(lut.lookup)
        jax.block_until_ready(f(coords))
        t0 = time.time()
        for _ in range(10):
            out = f(coords)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"benchmark: {coords.shape[0] / dt / 1e6:.1f} M lookups/s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
