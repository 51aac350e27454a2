"""Vanilla integrator names map onto the statpath machinery
(SURVEY.md §2.3 'Vanilla integrators'; statpath with stats off IS the
plain path tracer)."""
import os
import tempfile

import numpy as np

from statmc_tpu.driver import load


def _scene(integrator):
    return (
        f'Integrator "{integrator}" "integer maxdepth" [4]\n'
        'Sampler "random" "integer pixelsamples" [8]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'Material "matte" "rgb Kd" [0.7 0.7 0.7]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 3.9  4 -1 3.9  4 5 4  -4 5 4]\n'
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [10 10 10]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1 4 -1  1 4 -1  1 4 1  -1 4 1]\n'
        "AttributeEnd\nWorldEnd\n"
    )


def _render(integ, seed=1):
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "s.pbrt")
    open(p, "w").write(_scene(integ))
    r = load(p, base_seed=seed)
    r.render(iterations=1, verbose=False)
    return np.asarray(r.film_mean)


def test_path_name_renders():
    img = _render("path")
    assert np.isfinite(img).all() and img.mean() > 0


def test_directlighting_darker_than_path():
    img_p = _render("path")
    img_d = _render("directlighting")
    assert np.isfinite(img_d).all() and img_d.mean() > 0
    # No indirect bounce light -> strictly less energy.
    assert img_d.mean() < img_p.mean()


def test_whitted_and_volpath_accepted():
    # volpath on a medium-free scene is exactly the path estimator
    # (volpath.cpp degenerates to path.cpp when no media exist).
    for name in ("whitted", "volpath"):
        img = _render(name)
        assert np.isfinite(img).all() and img.mean() > 0


def test_whitted_darker_than_path():
    # whitted recurses only through specular lobes (whitted.cpp):
    # on an all-diffuse scene it must lose the indirect energy.
    img_p = _render("path")
    img_w = _render("whitted")
    assert img_w.mean() < img_p.mean()

