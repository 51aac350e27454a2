"""Path-regeneration driver vs per-sample scan driver equality.

The regeneration loop (render/integrator.py:trace_wavefront) must be a
pure performance transform: per-pixel sample order is preserved and
masked no-op moment updates add exact zeros, so film sums and every
streaming moment state are bit-identical to the per-sample driver
(driver.py:make_chunk_fn).  These tests pin that equivalence on a scene
exercising multi-bounce paths, RR kills, specular lobes, and early
escapes (rays that miss everything).
"""
import os
import tempfile

import numpy as np
import pytest

from statmc_tpu.driver import Renderer, load, prepare
from statmc_tpu.scene.api import parse_scene

SCENE = """
Integrator "statpath" "integer maxdepth" [{maxdepth}] "integer iterations" [1]
  "bool denoiseimage" ["false"] "bool calcstats" ["true"]
  {extra}
Sampler "{sampler}" "integer pixelsamples" [{spp}]
Film "image" "integer xresolution" [8] "integer yresolution" [6]
  "string filename" ["mini.pfm"]
LookAt 0 0.6 -3  0 0.5 0  0 1 0
Camera "perspective" "float fov" [55]
WorldBegin
  Material "matte" "rgb Kd" [0.6 0.5 0.4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-4 0 -4  4 0 -4  4 0 4  -4 0 4]
  Material "mirror" "rgb Kr" [0.8 0.8 0.8]
  AttributeBegin
    Translate 0.8 0.5 0.2
    Shape "sphere" "float radius" [0.45]
  AttributeEnd
  Material "matte" "rgb Kd" [0.3 0.6 0.3]
  AttributeBegin
    Translate -0.8 0.4 0
    Shape "sphere" "float radius" [0.4]
  AttributeEnd
  AttributeBegin
    AreaLightSource "diffuse" "rgb L" [6 5 4]
    Material "matte" "rgb Kd" [0 0 0]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-1 2.5 -1  1 2.5 -1  1 2.5 1  -1 2.5 1]
  AttributeEnd
WorldEnd
"""


def _setup(sampler="random", maxdepth=5, spp=4, extra=""):
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "s.pbrt")
    with open(p, "w") as f:
        f.write(SCENE.format(sampler=sampler, maxdepth=maxdepth, spp=spp,
                             extra=extra))
    return prepare(parse_scene(p), base_seed=3)


def _run(setup, regen, iterations=1):
    r = Renderer(setup, regen=regen)
    r.render(iterations=iterations, verbose=False)
    return r


def _assert_equal(ra, rb):
    # Sample counts and ray totals are integer-valued f32 sums: exact.
    np.testing.assert_array_equal(
        np.asarray(ra.film_w), np.asarray(rb.film_w))
    assert float(ra.ray_total) == float(rb.ray_total)
    # Float accumulators: the two drivers trace identical samples in
    # identical per-pixel order, but XLA fuses the while-loop and scan
    # programs differently (fma contraction), so values agree only to
    # ~1 ulp per operation.
    np.testing.assert_allclose(
        np.asarray(ra.film_sum), np.asarray(rb.film_sum),
        rtol=3e-5, atol=1e-6)
    sa, sb = ra.states, rb.states
    assert set(sa.keys()) == set(sb.keys())
    for t in sa:
        np.testing.assert_array_equal(
            np.asarray(sa[t]["n"]), np.asarray(sb[t]["n"]),
            err_msg=f"state {t} field n")
        for f in sa[t]:
            if f == "n":
                continue
            np.testing.assert_allclose(
                np.asarray(sa[t][f]), np.asarray(sb[t][f]),
                rtol=3e-5, atol=1e-5, err_msg=f"state {t} field {f}")


def test_regen_matches_per_sample_random():
    setup = _setup()
    _assert_equal(_run(setup, True), _run(setup, False))


def test_regen_matches_per_sample_ld():
    setup = _setup(sampler="02sequence")
    _assert_equal(_run(setup, True), _run(setup, False))


def test_regen_matches_with_acrr_smis():
    # ACRR + SMIS: per-bounce Ls buffers, win-rate tallies, RR feedback.
    setup = _setup(maxdepth=6, extra='"bool acrr" ["true"] "bool smis" ["true"] '
                   '"bool denoiseimage" ["true"] "integer filterradius" [2] '
                   '"float filtersd" [1.5]')
    ra = _run(setup, True, iterations=2)
    rb = _run(setup, False, iterations=2)
    _assert_equal(ra, rb)


def test_regen_matches_pixelbounds_crop():
    setup = _setup(extra='"integer pixelbounds" [2 6 1 5]')
    _assert_equal(_run(setup, True), _run(setup, False))
