"""Lockstep sampler: replay the reference's exact PCG32 draw streams.

The reference's RandomSampler is one serial PCG32 per 16x16 tile, seeded
SetSequence((baseSeed+1)*(tileIndex+1)) at Clone time
(src/samplers/random.cpp:52,68,86-87; tile grid + Clone(tileIndex) at
src/statistics/statpath.cpp:132-184), with draws consumed in strict
order as the tile loop walks pixels row-major and each pixel runs its
samples back-to-back (statpath.cpp:269-375).

Draw order per sample (verified against the reference sources):
  camera   GetCameraSample: 2D film jitter, 1D time, 2D lens
           (src/core/sampler.cpp:56-62)  -> 5 values
  bounce b (statpath.cpp:761-958):
           1D light select   (statpath.cpp:744/747)
           2D uLight         (statpath.cpp:751)
           2D uScattering    (statpath.cpp:752)
           2D BSDF sample    (statpath.cpp:869)
           1D Russian roulette (statpath.cpp:948)  -> 8 values

This module precomputes table[pixel, sample, dim] on the host with a
bit-exact PCG32 (same constants/output function as src/core/rng.h:61-63,
130-145) under a FIXED per-sample consumption layout of
D = 5 + 8*n_steps values.  The wavefront integrator consumes the table
positionally (core/rng.py MODE_LOCKSTEP), so every draw site receives
the exact value pbrt's sampler would produce at that stream position.

Known, documented divergence: pbrt consumes draws *conditionally* (a
path that terminates at bounce 2 stops drawing; BSDF component choice
reuses uScattering.x internally), so the serial stream position of
sample k+1 depends on sample k's path length.  Bit-exact diffing
against the stock reference therefore holds up to the first early
termination in a tile; full-stream parity requires running the
reference with padded consumption (a two-line patch to its sample loop,
noted here so the diffing protocol is reproducible).  Seeding, tile
decomposition, draw order, and the PCG32 stream itself are exact.
"""
from __future__ import annotations

import numpy as np

TILE = 16
_MULT = np.uint64(0x5851F42D4C957F2D)
_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)
_ONE_MINUS_EPS = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))

# Per-sample table layout.
D_CAMERA = 5           # film.x film.y time lens.x lens.y
D_BOUNCE = 8           # select uL.x uL.y uS.x uS.y bsdf.x bsdf.y rr
OFF_SELECT = 0
OFF_LIGHT = 1
OFF_SCATTER = 3
OFF_BSDF = 5
OFF_RR = 7


def dims_per_sample(n_steps: int) -> int:
    return D_CAMERA + D_BOUNCE * n_steps


def _advance(state: np.ndarray, inc: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return state * _MULT + inc


def _output(state: np.ndarray) -> np.ndarray:
    xorshifted = (((state >> np.uint64(18)) ^ state) >> np.uint64(27)).astype(
        np.uint32)
    rot = (state >> np.uint64(59)).astype(np.uint32)
    return (xorshifted >> rot) | (
        xorshifted << ((np.uint32(32) - rot) & np.uint32(31)))


def _set_sequence(initseq: np.ndarray):
    """rng.h:130-136: state=0, inc=(seq<<1)|1, advance, +=DEFAULT, advance."""
    inc = ((initseq.astype(np.uint64) << np.uint64(1)) | np.uint64(1))
    state = np.zeros_like(inc)
    state = _advance(state, inc)
    with np.errstate(over="ignore"):
        state = state + _DEFAULT_STATE
    state = _advance(state, inc)
    return state, inc


def _uniform_float(state: np.ndarray, inc: np.ndarray):
    """rng.h UniformFloat: min(1-eps, u32 * 0x1p-32f); advance-then-output
    order matches UniformUInt32 (oldstate used for output)."""
    old = state
    state = _advance(state, inc)
    u = _output(old).astype(np.float64) * 2.3283064365386963e-10
    return np.minimum(u.astype(np.float32), _ONE_MINUS_EPS), state


def make_table(width: int, height: int, spp: int, n_steps: int,
               base_seed: int = 0) -> np.ndarray:
    """table[P, spp, D] of f32 draws, P = width*height row-major.

    Reproduces the per-tile serial order: within tile (tx, ty), pixels
    row-major over the cropped tile bounds, each pixel's spp samples
    consecutive, each sample consuming exactly dims_per_sample(n_steps)
    values (the padded layout documented above).
    """
    D = dims_per_sample(n_steps)
    n_tx = (width + TILE - 1) // TILE
    n_ty = (height + TILE - 1) // TILE
    T = n_tx * n_ty
    tile_index = np.arange(T, dtype=np.uint64)
    with np.errstate(over="ignore"):
        seq = np.uint64(base_seed + 1) * (tile_index + np.uint64(1))
    state, inc = _set_sequence(seq)

    # Serial index of each pixel within its tile (row-major over the
    # tile's cropped bounds), and each pixel's tile id.
    ys, xs = np.divmod(np.arange(width * height), width)
    tx, ty = xs // TILE, ys // TILE
    tid = ty * n_tx + tx
    tw = np.minimum((tx + 1) * TILE, width) - tx * TILE  # cropped tile width
    idx_in_tile = (ys - ty * TILE) * tw + (xs - tx * TILE)

    max_px = int(idx_in_tile.max()) + 1
    draws_per_tile = max_px * spp * D
    stream = np.empty((T, draws_per_tile), dtype=np.float32)
    for k in range(draws_per_tile):
        stream[:, k], state = _uniform_float(state, inc)

    base = (idx_in_tile * spp)[:, None, None] * D \
        + np.arange(spp)[None, :, None] * D \
        + np.arange(D)[None, None, :]
    return stream[tid[:, None, None], base]
