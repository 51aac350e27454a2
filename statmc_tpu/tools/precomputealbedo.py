"""Albedo-LUT precompute tool.

CLI counterpart of the reference's standalone precomputealbedo
executable (src/statistics/luts/precomputealbedo/): Monte Carlo
precomputation of directional-albedo tables over the reference's full
family/axis grids (main.cpp:78-128; 9 precomputed families — the
reference excludes disney/fourier/kdsubsurface/subsurface as unbounded,
main.cpp:339-344) with the same self-test modes:

  --compare    LUT interpolation vs fresh MC at random OFF-GRID
               parameters, threshold 0.05 (main.cpp:50 LutCheckThreshold)
  --testlut    interpolation round trip at grid points
  --benchmark  lookup throughput vs direct MC rho() cost

Usage: python -m statmc_tpu.tools.precomputealbedo --family metal
       [--sizes 8 8 8 8 8] [--samples 1024] [--out metal_lut.npz]
       [--compare] [--testlut] [--benchmark]

Legacy 2-D curves (--family with --sizes N M) remain available through
render/albedo_lut.precompute_family; the N-D path is the default.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    from statmc_tpu.render.albedo_lut import FAMILY_AXES

    ap = argparse.ArgumentParser(prog="precomputealbedo")
    ap.add_argument("--family", default="matte",
                    choices=sorted(FAMILY_AXES.keys()))
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="per-dimension table sizes (default 8/dim, "
                         "uber 4/dim)")
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0,
                    help="RNG seed offset (main.cpp --seedoffset)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--testlut", action="store_true")
    ap.add_argument("--benchmark", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from statmc_tpu.render.albedo_lut import (
        mc_albedo_at, precompute_family_nd,
    )

    n_dims = len(FAMILY_AXES[args.family])
    sizes = tuple(args.sizes) if args.sizes else None
    t0 = time.time()
    lut = precompute_family_nd(
        args.family, sizes, n_samples=args.samples, seed=args.seed)
    print(f"precomputed {args.family} LUT {lut.sizes} ({n_dims}-D, "
          f"{args.samples} samples/texel) in {time.time() - t0:.1f}s")

    if args.out:
        np.savez(args.out, data=np.asarray(lut.data), sizes=lut.sizes,
                 family=args.family)
        print(f"wrote {args.out}")

    rc = 0
    if args.compare:
        # Fresh MC at random off-grid parameters vs interpolated LUT
        # (main.cpp --testlut semantics: randomized parameters, warn
        # past LutCheckThreshold=0.05).
        rng = np.random.default_rng(1 + args.seed)
        coords = jnp.asarray(rng.random((64, n_dims)), jnp.float32)
        interp = np.asarray(lut.lookup(coords))
        truth = np.asarray(mc_albedo_at(
            args.family, coords, n_samples=max(args.samples, 4096),
            seed=args.seed + 7))
        err = np.abs(interp - truth)
        print(f"compare: max err {err.max():.4f} mean {err.mean():.4f} "
              f"(threshold 0.05)")
        if err.max() > 0.05:
            rc = 1
    if args.testlut:
        # Interpolation at grid points reproduces stored values.
        grids = [np.linspace(0, 1, s) if s > 1 else np.array([0.0])
                 for s in lut.sizes]
        mesh = np.meshgrid(*grids, indexing="ij")
        c = jnp.asarray(np.stack([m.reshape(-1) for m in mesh], -1),
                        jnp.float32)
        vals = np.asarray(lut.lookup(c))
        stored = np.asarray(lut.data)
        ok = np.allclose(vals, stored, atol=1e-5)
        print(f"testlut: grid round trip {'OK' if ok else 'FAIL'}")
        if not ok:
            rc = 1
    if args.benchmark:
        rng = np.random.default_rng(2)
        coords = jnp.asarray(rng.random((1 << 20, n_dims)), jnp.float32)
        f = jax.jit(lut.lookup)
        jax.block_until_ready(f(coords))
        t0 = time.time()
        for _ in range(10):
            out = f(coords)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"benchmark: {coords.shape[0] / dt / 1e6:.1f} M lookups/s")
        # Direct-MC comparison point (the reference reports ~100x;
        # precomputealbedo/README "about two magnitudes").
        small = coords[: 1 << 12]
        g = jax.jit(lambda c: mc_albedo_at(args.family, c, n_samples=64))
        jax.block_until_ready(g(small))
        t0 = time.time()
        jax.block_until_ready(g(small))
        dt_mc = time.time() - t0
        print(f"benchmark: direct MC {small.shape[0] / dt_mc / 1e6:.3f} "
              f"M rho()/s (64 spp)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
