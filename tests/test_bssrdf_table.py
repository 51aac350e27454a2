"""Beam-diffusion BSSRDF tables (bssrdf.cpp:43-207 groundwork)."""
import numpy as np
import pytest

from statmc_tpu.render import bssrdf as BS


def test_fresnel_moments_match_reference_samples():
    """Spot values of the polynomial fits (bssrdf.cpp:43-66)."""
    # eta=1.33 (water/skin): the reference polynomials evaluate to
    # ~0.2365 / ~0.1086 there.
    f1 = BS.fresnel_moment1(1.33)
    f2 = BS.fresnel_moment2(1.33)
    assert abs(f1 - 0.2365) < 0.01, f1
    assert abs(f2 - 0.1086) < 0.01, f2
    # Continuity-ish across eta branches.
    assert abs(BS.fresnel_moment1(0.999) - BS.fresnel_moment1(1.001)) < 0.02


@pytest.fixture(scope="module")
def table():
    return BS.compute_beam_diffusion_bssrdf(g=0.0, eta=1.33,
                                            n_rho=40, n_radius=48)


def test_profile_positive_and_rho_eff_monotone(table):
    assert (table.profile >= -1e-9).all()
    # Effective albedo grows monotonically with single-scattering
    # albedo and stays inside (0, 1).
    d = np.diff(table.rho_eff)
    assert (d >= -1e-9).all()
    assert table.rho_eff[0] <= 1e-6
    assert 0.0 < table.rho_eff[-1] <= 1.0 + 1e-3
    # cdf rows are monotone with total == rho_eff.
    assert (np.diff(table.profile_cdf, axis=1) >= -1e-9).all()
    np.testing.assert_allclose(table.profile_cdf[:, -1], table.rho_eff,
                               rtol=1e-12)


def test_high_albedo_scatters_far(table):
    """Mean optical radius of the profile grows with albedo (more
    multiple scattering -> wider diffusion)."""
    def mean_radius(i):
        w = table.profile[i]
        if w.sum() <= 0:
            return 0.0
        return float((table.radius * w).sum() / w.sum())

    assert mean_radius(35) > mean_radius(10)


def test_subsurface_from_diffuse_roundtrip(table):
    """Invert rhoEff then recompute: the recovered (sigma_a, sigma_s)
    must reproduce the requested diffuse reflectance."""
    want = np.array([0.2, 0.5, 0.8])
    sigma_a, sigma_s = BS.subsurface_from_diffuse(table, want,
                                                  [1.0, 1.0, 1.0])
    assert (sigma_a > 0).all() and (sigma_s > 0).all()
    for c in range(3):
        rho = sigma_s[c] / (sigma_a[c] + sigma_s[c])
        # Forward map at the recovered rho.
        prof = 2 * np.pi * table.radius * (
            BS.beam_diffusion_ss(rho, 1 - rho, 0.0, 1.33, table.radius)
            + BS.beam_diffusion_ms(rho, 1 - rho, 0.0, 1.33, table.radius))
        got, _ = BS._integrate_catmull_rom(table.radius, prof)
        assert abs(float(got) - want[c]) < 0.02, (c, got, want[c])
    # Mean free path scales sigma linearly.
    sa2, ss2 = BS.subsurface_from_diffuse(table, want, [2.0, 2.0, 2.0])
    np.testing.assert_allclose(ss2 * 2, sigma_s, rtol=1e-6)
