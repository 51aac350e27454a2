"""BSSRDF Sample_Sp transport (render/sss.py).

Pins the device subsurface sampling scheme against its own analytic
invariants (the reference offers no unit tests for bssrdf.cpp; these
mirror the math directly):

* Sample_Sr / Pdf_Sr consistency: the sampled radius distribution must
  match the tabulated area density (bssrdf.cpp:354-393).
* The plane integral: on an infinite plane of the same material,
  E[Sp/pdf] over Sample_Sp equals the profile's effective albedo
  integral (Sp integrates to rho_eff by construction of the table,
  bssrdf.cpp:176-182) -- the analytic end-to-end check of axis and
  channel mixing, the probe chain, Pdf_Sp and Sp together.
* A full render smoke through the integrator's in-bounce block
  (statpath.cpp:892-926).
"""
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from statmc_tpu.render import sss as S


@pytest.fixture(scope="module")
def tab():
    # subsurface defaults scaled so radii are small vs the test plane.
    sc = 50.0
    return S.build_sss_tables([dict(
        sigma_a=np.array([0.0011, 0.0024, 0.014]) * sc,
        sigma_s=np.array([2.55, 3.21, 3.77]) * sc,
        g=0.0, eta=1.33)])


def test_sample_pdf_consistency(tab):
    """CDF of sampled radii == integral of Pdf_Sr over area measure."""
    n = 4096
    u = jnp.asarray((np.arange(n) + 0.5) / n, jnp.float32)
    tid = jnp.zeros((n,), jnp.int32)
    ch = jnp.zeros((n,), jnp.int32)
    r = np.asarray(S.sample_sr(tab, tid, ch, u))
    assert (r > 0).all()
    # Numeric integral of pdf_sr * 2 pi r dr on a fine grid.
    rmax = float(tab.rmax[0, 0])
    grid = np.linspace(1e-5, rmax * 1.001, 2048).astype(np.float32)
    pdf = np.asarray(S.pdf_sr(tab, jnp.zeros_like(jnp.asarray(grid),
                                                  dtype=jnp.int32),
                              0, jnp.asarray(grid)))
    dens = pdf * 2.0 * np.pi * grid
    cdf = np.cumsum(0.5 * (dens[1:] + dens[:-1]) * np.diff(grid))
    cdf = np.concatenate([[0.0], cdf])
    # Total mass within rmax ~ 0.999 by construction.
    assert abs(cdf[-1] - 0.999) < 0.01
    for q in (0.1, 0.3, 0.5, 0.7, 0.9):
        r_q = np.quantile(r, q)
        mass = np.interp(r_q, grid, cdf)
        assert abs(mass - q) < 0.02, (q, mass)


def _plane_scene():
    """A big quad at z=0 (normal +z) of the default subsurface
    material, scaled so the profile radius is << the quad."""
    from statmc_tpu.scene.api import parse_scene
    from statmc_tpu.scene.build import build_scene

    text = (
        'Integrator "statpath" "integer iterations" [1]\n'
        'Film "image" "integer xresolution" [4] "integer yresolution" [4]\n'
        'Camera "perspective" "float fov" [60]\nWorldBegin\n'
        'Material "subsurface" "float scale" [50]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-50 -50 0  50 -50 0  50 50 0  -50 50 0]\n'
        'AttributeBegin\n'
        'AreaLightSource "diffuse" "rgb L" [5 5 5]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1 -1 4  1 -1 4  1 1 4  -1 1 4]\n'
        'AttributeEnd\nWorldEnd\n'
    )
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(text)
    return build_scene(parse_scene(p)).to_device()


def test_sample_sp_plane_integrates_to_rhoeff():
    """E[Sp/pdf] on an infinite plane = 0.999 * rho_eff per channel
    (the truncated profile integral) -- the analytic transport check."""
    from statmc_tpu.render import bsdf as B

    sc = _plane_scene()
    assert sc.sss is not None
    tabd = sc.sss
    n = 8192
    rng = np.random.default_rng(7)
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    po = jnp.zeros((n, 3), jnp.float32)
    ns = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    frame = B.ShadingFrame.from_normal(ns)
    sss_mat = int(np.flatnonzero(np.asarray(sc.mat_sss_id) >= 0)[0])
    sid = jnp.zeros((n,), jnp.int32)
    res = S.sample_sp(sc, None, tabd, sid, po, frame,
                      jnp.full((n,), sss_mat, jnp.int32), u1, u2,
                      jnp.ones((n,), bool))
    est = np.asarray(res.s_over_pdf).mean(axis=0)
    want = 0.999 * np.asarray(tabd.rhoeff[0])
    # One-sample-MIS estimator: generous MC tolerance, but all three
    # channels must land near their own rho_eff (they differ by >10%).
    np.testing.assert_allclose(est, want, rtol=0.08)
    # Exit points lie on the plane.
    pz = np.asarray(res.p[np.asarray(res.ok)])[:, 2]
    assert np.abs(pz).max() < 1e-2


def test_subsurface_scene_renders_finite():
    """End-to-end: a subsurface sphere renders through the in-bounce
    BSSRDF block (statpath.cpp:892-926) with finite, nonzero film."""
    from statmc_tpu.driver import load

    text = (
        'Integrator "statpath" "integer maxdepth" [4] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [8]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 0 -4  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [50]\n'
        "WorldBegin\n"
        'Material "kdsubsurface" "rgb Kd" [0.5 0.3 0.2] '
        '"float mfp" [0.2]\n'
        'Shape "sphere" "float radius" [1]\n'
        'Material "matte" "rgb Kd" [0.6 0.6 0.6]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-6 -1.5 -6  6 -1.5 -6  6 -1.5 6  -6 -1.5 6]\n'
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [12 12 12]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1.5 3 -1.5  1.5 3 -1.5  1.5 3 1.5  -1.5 3 1.5]\n'
        "AttributeEnd\n"
        "WorldEnd\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".pbrt",
                                     delete=False) as f:
        f.write(text)
        path = f.name
    r = load(path)
    assert r.s.scene.sss is not None
    assert r.s.icfg.enable_sss
    r.render(iterations=1, verbose=False)
    img = np.asarray(r.film_mean)
    assert np.isfinite(img).all()
    # The sphere fills the image center; subsurface transport must
    # carry energy (not black) and stay bounded.
    assert img.mean() > 1e-3
    assert img.max() < 50.0