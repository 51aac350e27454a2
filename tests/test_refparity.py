"""Parity against REFERENCE-PRODUCED artifacts (the BASELINE.md north
star: "allclose at matched sample sequences vs the reference build").

The PFMs under tests/fixtures/refparity/ were rendered by the actual
reference renderer (shadow CPU build, scripts/shadow_ref/ — see the
fixture README for provenance).  These tests re-render the same scenes
with the same base seeds through the exact-lockstep replay
(render/lockstep_exact.py, which reproduces the reference's serial
per-tile PCG32 consumption, src/samplers/random.cpp:52-87 +
statpath.cpp:255-375) and assert the film AND the Box-Cox-transformed
moment statistics match at f32 accumulation tolerance.

mirrorbox.pbrt is the conditional-consumption stress case: paths
survive past bounce 3 so the Russian-roulette draw
(statpath.cpp:941-948) fires, and each termination shifts every later
draw's serial stream position in that tile.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from statmc_tpu.driver import load
from statmc_tpu.io.pfm import read_pfm
from statmc_tpu.render.lockstep_exact import moments_from_samples

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refparity")


def _run(scene, seed, spp=4):
    r = load(os.path.join(FIX, scene), base_seed=seed)
    return r.render_lockstep_exact(spp=spp)


def _check(rep, stem, film_tol, mom_tol):
    W = H = 16
    film = rep.film.reshape(H, W, 3)
    ref_film = read_pfm(os.path.join(FIX, f"{stem}-4-film.pfm"))
    np.testing.assert_allclose(film, ref_film, atol=film_tol, rtol=0)

    n, mean, m2, m3 = moments_from_samples(rep.radiance)
    ref_n = read_pfm(os.path.join(FIX, f"{stem}-4-t0-b0-n.pfm"))
    ref_mean = read_pfm(os.path.join(FIX, f"{stem}-4-t0-b0-mean.pfm"))
    ref_m2 = read_pfm(os.path.join(FIX, f"{stem}-4-t0-b0-m2.pfm"))
    ref_m3 = read_pfm(os.path.join(FIX, f"{stem}-4-t0-b0-m3.pfm"))
    np.testing.assert_array_equal(n.reshape(H, W), ref_n)
    np.testing.assert_allclose(mean.reshape(H, W, 3), ref_mean,
                               atol=mom_tol, rtol=0)
    np.testing.assert_allclose(m2.reshape(H, W, 3), ref_m2,
                               atol=mom_tol, rtol=0)
    np.testing.assert_allclose(m3.reshape(H, W, 3), ref_m3,
                               atol=mom_tol, rtol=0)

    # Untransformed film-side moments (estimator.h:212-226).
    _, fmean, fm2, _ = moments_from_samples(rep.radiance, bc_lambda=None)
    ref_fmean = read_pfm(os.path.join(FIX, f"{stem}-4-t0-b0-film-mean.pfm"))
    np.testing.assert_allclose(fmean.reshape(H, W, 3), ref_fmean,
                               atol=mom_tol, rtol=0)


def test_refparity_tiny_matte():
    """Mixed consumption classes (camera-only / NEE / escape)."""
    rep = _run("tiny.pbrt", seed=0)
    _check(rep, "tiny", film_tol=2e-6, mom_tol=2e-5)


def test_refparity_mirrorbox_rr():
    """Deep specular chains + conditional RR draws at bounces > 3."""
    rep = _run("mirrorbox.pbrt", seed=7)
    _check(rep, "mirrorbox", film_tol=2e-5, mom_tol=5e-5)
    # Sanity: RR must actually have fired — consumption totals differ
    # across samples of equal path class only when RR mixes outcomes.
    consumed = rep.cursor_end - rep.cursor_start
    assert consumed.max() > consumed.min()
