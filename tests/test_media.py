"""Participating media + volpath validation (VERDICT r1 missing #3).

Mirrors the reference's analytic-scene strategy: fog configurations with
closed-form expectations (Beer-Lambert attenuation) plus cross-estimator
agreement (grid-constant == homogeneous; NEE == phase-only brute force).
Reference semantics: src/integrators/volpath.cpp:54-188,
src/media/homogeneous.cpp:44-77, src/media/grid.cpp:47-115.
"""
import tempfile

import numpy as np

from statmc_tpu.driver import load


def _render(scene_text, iterations=1, spp_scale=1):
    tmp = tempfile.mkdtemp()
    p = tmp + "/scene.pbrt"
    with open(p, "w") as f:
        f.write(scene_text)
    r = load(p)
    r.render(iterations=iterations, verbose=False)
    return r


HEAD = (
    'Integrator "volpath" "integer maxdepth" [{depth}] '
    '"integer iterations" [1] "bool calcstats" ["true"] '
    '"float rrthreshold" [{rr}]\n'
    'Sampler "random" "integer pixelsamples" [{spp}]\n'
    'Film "image" "integer xresolution" [8] "integer yresolution" [8] '
    '"string filename" ["t.pfm"]\n'
    'Camera "perspective" "float fov" [40]\n'
)

# Emissive quad at z=2 facing the camera (winding puts the geometric
# normal toward -z so the one-sided area light shines at the camera).
QUAD = (
    'AttributeBegin\n'
    'AreaLightSource "diffuse" "rgb L" [2 2 2]\n'
    'Material "matte" "rgb Kd" [0 0 0]\n'
    'Shape "trianglemesh" "integer indices" [0 2 1 0 3 2] '
    '"point P" [-5 -5 2  5 -5 2  5 5 2  -5 5 2]\n'
    'AttributeEnd\n'
)


def test_absorption_only_camera_fog_beer_lambert():
    """Camera immersed in a purely absorbing homogeneous medium staring
    at an emissive quad at depth ~2: film = L * exp(-sigma_a * dist).
    With sigma_s = 0 the estimator is exact Beer-Lambert in expectation
    (homogeneous.cpp:44-47 / :50-77)."""
    sigma = 0.25
    scene = (
        HEAD.format(depth=4, spp=256, rr=1)
        + f'MakeNamedMedium "fog" "string type" ["homogeneous" ] '
          f'"rgb sigma_a" [{sigma} {sigma} {sigma}] '
          f'"rgb sigma_s" [0 0 0]\n'
        + 'MediumInterface "" "fog"\n'
        + 'WorldBegin\n' + QUAD + 'WorldEnd\n'
    )
    r = _render(scene)
    film = np.asarray(r.film_mean).reshape(8, 8, 3)
    # Each pixel's ray length to z=2 is 2/cos(angle); compare per-pixel
    # against the analytic attenuation at the pixel-center ray.
    xs = (np.arange(8) + 0.5) / 8 * 2 - 1
    t = np.tan(np.radians(20.0))
    gx, gy = np.meshgrid(xs * t, xs * t, indexing="xy")
    dirs = np.stack([gx, gy, np.ones((8, 8))], axis=-1)
    dist = 2.0 * np.linalg.norm(dirs, axis=-1) / dirs[..., 2]
    expect = 2.0 * np.exp(-sigma * dist)
    # Per sample the estimator is Bernoulli(Tr)*2/Tr', so per-pixel noise
    # at 256 spp is ~5%; the image aggregate averages it away.
    np.testing.assert_allclose(film.mean(-1), expect, rtol=0.2)
    np.testing.assert_allclose(film.mean(), expect.mean(), rtol=0.02)


def test_scattering_fog_nee_matches_phase_only():
    """Scattering fog lit by the quad: the NEE+MIS volumetric estimator
    must agree with the independent phase-only brute force (Le collected
    at every escape) -- validates attenuated NEE + HG MIS end to end."""
    import dataclasses

    from statmc_tpu.driver import Renderer, prepare
    from statmc_tpu.scene.api import parse_scene

    scene = (
        HEAD.format(depth=6, spp=160, rr=0)
        + 'MakeNamedMedium "fog" "string type" ["homogeneous"] '
          '"rgb sigma_a" [0.02 0.02 0.02] "rgb sigma_s" [0.25 0.25 0.25] '
          '"float g" [0.0]\n'
        + 'MediumInterface "" "fog"\n'
        + 'WorldBegin\n' + QUAD + 'WorldEnd\n'
    )
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(scene)
    setup = prepare(parse_scene(p))
    assert setup.icfg.volumetric
    r1 = Renderer(setup)
    r1.render(iterations=1, verbose=False)
    nee = float(np.asarray(r1.film_mean).mean())

    r2 = Renderer(dataclasses.replace(
        setup, icfg=setup.icfg._replace(enable_nee=False)))
    r2.render(iterations=1, verbose=False)
    bf = float(np.asarray(r2.film_mean).mean())
    assert abs(nee - bf) < 0.10 * max(bf, 1e-3) + 0.01, (
        f"NEE {nee:.4f} vs phase-only {bf:.4f}")
    # The fog must actually scatter (image differs from the vacuum one).
    vac = _render(
        HEAD.format(depth=6, spp=32, rr=0) + 'WorldBegin\n' + QUAD
        + 'WorldEnd\n')
    assert abs(nee - float(np.asarray(vac.film_mean).mean())) > 0.02


def test_grid_constant_density_matches_homogeneous():
    """A constant-density grid medium equals the homogeneous medium with
    the same coefficients (delta tracking with density == maxDensity
    accepts the first candidate; grid.cpp:63-72)."""
    common = (
        '"rgb sigma_a" [0.1 0.1 0.1] "rgb sigma_s" [0.2 0.2 0.2] '
        '"float g" [0.0]\n'
    )
    body = (
        'MediumInterface "" "fog"\nWorldBegin\n' + QUAD + 'WorldEnd\n'
    )
    homog = (
        HEAD.format(depth=5, spp=192, rr=0)
        + 'MakeNamedMedium "fog" "string type" ["homogeneous"] ' + common
        + body
    )
    # Grid spanning the visible frustum in density space.
    grid = (
        HEAD.format(depth=5, spp=192, rr=0)
        + 'MakeNamedMedium "fog" "string type" ["heterogeneous"] '
          '"integer nx" [2] "integer ny" [2] "integer nz" [2] '
          '"float density" [1 1 1 1 1 1 1 1] '
          '"point p0" [-8 -8 -1] "point p1" [8 8 3] ' + common
        + body
    )
    rh = _render(homog)
    rg = _render(grid)
    mh = float(np.asarray(rh.film_mean).mean())
    mg = float(np.asarray(rg.film_mean).mean())
    np.testing.assert_allclose(mg, mh, rtol=0.08,
                               err_msg=f"grid {mg:.4f} vs homog {mh:.4f}")


def test_null_boundary_fog_region():
    """Fog confined inside a null-material sphere between camera and an
    emissive quad; absorption only: film ~ L * exp(-sigma_a * chord).
    Validates MediumInterface transitions + transmittance through null
    boundaries (statpath null semantics + scene.cpp IntersectTr)."""
    sigma = 0.4
    scene = (
        HEAD.format(depth=6, spp=256, rr=1)
        + f'MakeNamedMedium "fog" "string type" ["homogeneous"] '
          f'"rgb sigma_a" [{sigma} {sigma} {sigma}] "rgb sigma_s" [0 0 0]\n'
        + 'WorldBegin\n'
        + 'AttributeBegin\n'
        + 'MediumInterface "fog" ""\n'
        + 'Material "none"\n'
        + 'TransformBegin\nTranslate 0 0 1\n'
        + 'Shape "sphere" "float radius" [0.5]\nTransformEnd\n'
        + 'AttributeEnd\n'
        + QUAD + 'WorldEnd\n'
    )
    r = _render(scene)
    film = np.asarray(r.film_mean).reshape(8, 8, 3)
    # Central pixels pass through ~the full 1.0 chord; corner pixels at
    # 8x8 / fov 40 still intersect the r=0.5 sphere off-center.  Check
    # the center 2x2 against the axial chord and that edges attenuate
    # less than the center.
    center = film[3:5, 3:5].mean()
    expect_c = 2.0 * np.exp(-sigma * 1.0)
    np.testing.assert_allclose(center, expect_c, rtol=0.08)
    assert film[0, 0].mean() > center


def test_volpath_without_media_matches_path():
    """volpath on a media-free scene dispatches the standard surface
    scan and matches statpath (volpath.cpp degenerates to path.cpp)."""
    body = (
        'Sampler "random" "integer pixelsamples" [8]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8] '
        '"string filename" ["t.pfm"]\n'
        'Camera "perspective" "float fov" [60]\n'
        'WorldBegin\n'
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        'Shape "sphere" "float radius" [1.0]\n'
        'LightSource "point" "rgb I" [3.14159265 3.14159265 3.14159265]\n'
        'WorldEnd\n'
    )
    rv = _render('Integrator "volpath" "integer maxdepth" [3] '
                 '"integer iterations" [1]\n' + body)
    rp = _render('Integrator "path" "integer maxdepth" [3] '
                 '"integer iterations" [1]\n' + body)
    np.testing.assert_allclose(
        np.asarray(rv.film_mean), np.asarray(rp.film_mean),
        rtol=1e-5, atol=1e-6,
    )
