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


def _check(rep, stem, film_tol, mom_tol, WH=16):
    W = H = WH
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


def test_refparity_fourtile_multitile():
    """32x32 = four 16x16 tiles: per-tile PCG32 seeding
    (baseSeed+1)*(tileSeed+1) (src/samplers/random.cpp:52-68) and the
    reference's tile traversal order, plus matte+mirror mixed
    consumption across tiles."""
    rep = _run("fourtile.pbrt", seed=11)
    _check(rep, "fourtile", film_tol=5e-5, mom_tol=2e-4, WH=32)


def test_refparity_arealight_mis():
    """Area lights (a quad exploded into two one-triangle lights, as the
    reference's MakeLight-per-triangle does): NEE light-sample draw
    consumption, the exact UniformSampleTriangle vertex association
    (triangle.cpp:Sample -- a pure distribution test cannot see it; the
    draw-for-draw replay can), and the BSDF-MIS probe Le path
    (core/integrator.cpp:95-236).  lightsamplestrategy is pinned to
    "power" in the scene: the reference's default "spatial" builds its
    pmf by per-voxel Monte Carlo (lightdistrib.cpp:235+), which is a
    distribution-level (not draw-level) match for our table.

    Tolerances are looser than tiny/mirrorbox: the Box-Cox transform's
     d/dx ~ 1/sqrt(x) amplifies f32 accumulation noise at near-black
    pixels."""
    rep = _run("arealight.pbrt", seed=3)
    _check(rep, "arealight", film_tol=1e-5, mom_tol=3e-4)


def test_refparity_tracked_bounces():
    """trackedbounces=3 (with acrr on, which the reference requires for
    bounceEnd > 1, statpath.cpp:1032; at iteration 1 ACRR changes no
    draws, statpath.cpp:937): the per-bounce Ls streams t0-b1/t0-b2
    must match the reference's buffers, not just bounce 0
    (src/statistics/estimator.cpp:101-237)."""
    rep = _run("tracked.pbrt", seed=5)
    _check(rep, "tracked", film_tol=2e-4, mom_tol=5e-4)
    W = H = 16
    assert rep.radiance_b.shape[2] == 3
    for b in (1, 2):
        n, mean, m2, m3 = moments_from_samples(rep.radiance_b[:, :, b])
        for name, arr in (("mean", mean), ("m2", m2), ("m3", m3)):
            ref = read_pfm(os.path.join(FIX, f"tracked-4-t0-b{b}-{name}.pfm"))
            np.testing.assert_allclose(arr.reshape(H, W, 3), ref,
                                       atol=1e-3, rtol=0)


def test_refparity_production_estimator():
    """The PRODUCTION estimator (stats/moments.py update_transform, the
    device path every render uses) fed the exact replay's per-sample
    radiance must reproduce the reference's buffers — closing the loop
    the host-side moments_from_samples helper only checks transitively
    (round-4 verdict weak #4)."""
    import jax.numpy as jnp

    from statmc_tpu.stats import moments

    rep = _run("tiny.pbrt", seed=0)
    P, S, _ = rep.radiance.shape
    state = moments.make_state((P,), 3, transform=True, max_moment=3)
    samples = jnp.asarray(rep.radiance)
    for s in range(S):
        state = moments.update_transform(state, samples[:, s])
    ref_n = read_pfm(os.path.join(FIX, "tiny-4-t0-b0-n.pfm"))
    ref_mean = read_pfm(os.path.join(FIX, "tiny-4-t0-b0-mean.pfm"))
    ref_m2 = read_pfm(os.path.join(FIX, "tiny-4-t0-b0-m2.pfm"))
    ref_m3 = read_pfm(os.path.join(FIX, "tiny-4-t0-b0-m3.pfm"))
    ref_fm = read_pfm(os.path.join(FIX, "tiny-4-t0-b0-film-mean.pfm"))
    np.testing.assert_array_equal(
        np.asarray(state["n"][..., 0]).reshape(16, 16), ref_n)
    for key, ref in (("mean", ref_mean), ("m2", ref_m2), ("m3", ref_m3),
                     ("film_mean", ref_fm)):
        np.testing.assert_allclose(
            np.asarray(state[key]).reshape(16, 16, 3), ref,
            atol=5e-5, rtol=0, err_msg=key)
