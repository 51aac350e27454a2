"""AO integrator: analytic open-plane / closed-sphere visibility.

Reference: /root/reference/src/integrators/ao.cpp:57-102 (cosine- or
uniform-sampled hemisphere visibility around the geometric normal)."""
import numpy as np
import pytest

from statmc_tpu.driver import load


def _scene(extra="", world=""):
    return (
        f'Integrator "ao" "integer nsamples" [32] {extra}\n'
        'Sampler "random" "integer pixelsamples" [4]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8] '
        '"string filename" ["a.pfm"]\n'
        "LookAt 0 2 0  0 0 0  0 0 1\n"
        'Camera "perspective" "float fov" [40]\n'
        "WorldBegin\n" + world + "WorldEnd\n"
    )


PLANE = (
    'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
    'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" '
    "[-5 0 -5  5 0 -5  5 0 5  -5 0 5]\n"
)

SPHERE = (
    'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
    "ReverseOrientation\n"
    'Shape "sphere" "float radius" [5]\n'
)


def test_ao_open_plane_is_one(tmp_path):
    """Unoccluded plane under an open sky: the reference's estimator
    L += dot/(pdf*n) (ao.cpp:97) is UNNORMALIZED -- it estimates
    integral(V cos dw) = pi for a fully open hemisphere."""
    p = tmp_path / "a.pbrt"
    p.write_text(_scene(world=PLANE))
    r = load(str(p))
    r.render(iterations=1, verbose=False)
    f = np.asarray(r.film_mean)
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f, np.pi, atol=1e-3)


def test_ao_closed_sphere_is_zero(tmp_path):
    """Inside a closed sphere every probe is occluded -> AO = 0."""
    p = tmp_path / "a.pbrt"
    p.write_text(_scene(world=SPHERE))
    r = load(str(p))
    r.render(iterations=1, verbose=False)
    f = np.asarray(r.film_mean)
    np.testing.assert_allclose(f, 0.0, atol=1e-6)


def test_ao_uniform_mode_matches_cosine_mean(tmp_path):
    """Half-occluded geometry: uniform- and cosine-sampled AO estimate
    the same integrand; with a vertical half-wall next to the plane the
    two modes agree within MC noise."""
    world = PLANE + (
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" '
        "[0 0 -5  0 1.5 -5  0 1.5 5  0 0 5]\n"
    )
    pc = tmp_path / "c.pbrt"
    pc.write_text(_scene(world=world))
    rc = load(str(pc))
    rc.render(iterations=1, verbose=False)
    pu = tmp_path / "u.pbrt"
    pu.write_text(_scene(extra='"bool cossample" ["false"]', world=world))
    ru = load(str(pu))
    ru.render(iterations=1, verbose=False)
    fc = np.asarray(rc.film_mean).mean()
    fu = np.asarray(ru.film_mean).mean()
    assert abs(fc - fu) < 0.05 * np.pi, (fc, fu)
    assert 0.3 * np.pi < fc < 0.98 * np.pi
