"""BDPT correctness: equal mean vs path tracing + caustic advantage.

Pattern follows the reference's analytic-scene methodology
(src/tests/analytic_scenes.cpp: render, compare aggregate radiance within
a tolerance) and the bdpt-vs-path comparison its integrator suite implies
(src/integrators/bdpt.cpp).
"""
import numpy as np
import pytest

from statmc_tpu.driver import load
from statmc_tpu.testscenes import _box_tris, _mesh_stmt


def _box_scene(integrator: str, spp: int, maxdepth: int = 4,
               size: int = 12) -> str:
    """Closed diffuse box with one ceiling area light."""
    out = ['Material "matte" "rgb Kd" [0.6 0.55 0.5]\n']
    walls = [
        ((-2, -0.2, -2), (2, 0.0, 2)),      # floor
        ((-2, 2.0, -2), (2, 2.2, 2)),       # ceiling
        ((-2.2, 0, -2), (-2.0, 2, 2)),      # left
        ((2.0, 0, -2), (2.2, 2, 2)),        # right
        ((-2, 0, 1.8), (2, 2, 2.0)),        # back
    ]
    for lo, hi in walls:
        v, f = _box_tris(lo, hi)
        out.append(_mesh_stmt(v, f))
    out.append(
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [12 12 12]\n'
        'Material "matte" "rgb Kd" [0 0 0]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-0.6 1.95 -0.6  0.6 1.95 -0.6  0.6 1.95 0.6  '
        "-0.6 1.95 0.6]\n"
        "AttributeEnd\n"
    )
    body = "".join(out)
    return (
        f'Integrator "{integrator}" "integer maxdepth" [{maxdepth}] '
        '"integer iterations" [1] "bool expiterations" ["false"] '
        '"bool calcstats" ["false"] "bool denoiseimage" ["false"]\n'
        f'Sampler "random" "integer pixelsamples" [{spp}]\n'
        f'Film "image" "integer xresolution" [{size}] '
        f'"integer yresolution" [{size}]\n'
        "LookAt 0 1 -1.9  0 0.9 0  0 1 0\n"
        'Camera "perspective" "float fov" [70]\n'
        "WorldBegin\n" + body + "WorldEnd\n"
    )


def _glass_caustic_scene(integrator: str, spp: int, size: int = 12) -> str:
    """Glass sphere between a small bright light and a diffuse floor:
    the classic caustics-through-specular case where unidirectional path
    tracing (NEE blocked by the glass) converges far slower than light
    tracing / BDPT (bdpt.cpp's motivating configuration)."""
    out = ['Material "matte" "rgb Kd" [0.7 0.7 0.7]\n']
    v, f = _box_tris((-3, -0.2, -3), (3, 0.0, 3))  # floor
    out.append(_mesh_stmt(v, f))
    out.append(
        "AttributeBegin\n"
        'Material "glass" "float index" [1.5]\n'
        "Translate 0 1.0 0\n"
        'Shape "sphere" "float radius" [0.45]\n'
        "AttributeEnd\n"
    )
    out.append(
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [400 400 400]\n'
        'Material "matte" "rgb Kd" [0 0 0]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-0.1 2.2 -0.1  0.1 2.2 -0.1  0.1 2.2 0.1  '
        "-0.1 2.2 0.1]\n"
        "AttributeEnd\n"
    )
    body = "".join(out)
    return (
        f'Integrator "{integrator}" "integer maxdepth" [5] '
        '"integer iterations" [1] "bool expiterations" ["false"] '
        '"bool calcstats" ["false"] "bool denoiseimage" ["false"]\n'
        f'Sampler "random" "integer pixelsamples" [{spp}]\n'
        f'Film "image" "integer xresolution" [{size}] '
        f'"integer yresolution" [{size}]\n'
        "LookAt 0 2.4 -2.6  0 0.2 0  0 1 0\n"
        'Camera "perspective" "float fov" [50]\n'
        "WorldBegin\n" + body + "WorldEnd\n"
    )


_RENDER_CACHE = {}


def _render(text, tmp_path, name, seed=0):
    # Keyed by (scene text, seed): the 256-spp caustic references are
    # shared between test_bdpt and test_sppm_mlt -- re-rendering them
    # per test dominated the slow tier.
    key = (text, seed)
    if key not in _RENDER_CACHE:
        p = tmp_path / name
        p.write_text(text)
        r = load(str(p), base_seed=seed)
        r.render(iterations=1, verbose=False)
        _RENDER_CACHE[key] = np.asarray(r.film_mean)
    return _RENDER_CACHE[key]


def test_bdpt_dispatches(tmp_path):
    p = tmp_path / "b.pbrt"
    p.write_text(_box_scene("bdpt", 2, maxdepth=3, size=6))
    r = load(str(p))
    from statmc_tpu.render.bdpt import BDPTRenderer

    assert isinstance(r, BDPTRenderer)


def test_bdpt_matches_path_mean(tmp_path):
    """Diffuse box: BDPT and path tracing estimate the same integral."""
    f_path = _render(_box_scene("path", 96, maxdepth=4), tmp_path,
                     "p.pbrt")
    f_bdpt = _render(_box_scene("bdpt", 96, maxdepth=4), tmp_path,
                     "b.pbrt")
    assert np.isfinite(f_bdpt).all()
    assert f_bdpt.mean() > 0
    # Image means agree within MC noise (analytic_scenes.cpp delta
    # spirit; 96 spp on a 12x12 film averages ~14k samples).
    assert abs(f_bdpt.mean() - f_path.mean()) / f_path.mean() < 0.08, (
        f"bdpt mean {f_bdpt.mean():.4f} vs path mean {f_path.mean():.4f}"
    )


def test_bdpt_beats_path_on_caustics(tmp_path):
    """Caustic through glass: at equal samples, bdpt's error against a
    high-sample reference is visibly lower than path's (the strategy
    s>=2 connections find light paths NEE cannot)."""
    ref = _render(_glass_caustic_scene("bdpt", 256), tmp_path, "ref.pbrt",
                  seed=11)
    f_path = _render(_glass_caustic_scene("path", 24), tmp_path,
                     "p.pbrt")
    f_bdpt = _render(_glass_caustic_scene("bdpt", 24), tmp_path,
                     "b.pbrt")
    err_path = float(np.mean((f_path - ref) ** 2))
    err_bdpt = float(np.mean((f_bdpt - ref) ** 2))
    assert np.isfinite(f_bdpt).all()
    assert err_bdpt < err_path, (
        f"bdpt MSE {err_bdpt:.5f} !< path MSE {err_path:.5f}"
    )


def test_bdpt_strategies_all_finite(tmp_path):
    """Every (s,t) strategy contributes finite energy (no NaN from
    delta-light or grazing connections)."""
    f = _render(_box_scene("bdpt", 8, maxdepth=5, size=8), tmp_path,
                "s.pbrt")
    assert np.isfinite(f).all()
    assert (f >= 0).all()


def _env_scene(integrator: str, spp: int, maxdepth: int = 4,
               size: int = 10, with_floor: bool = True) -> str:
    floor = (
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" '
        "[-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n"
    ) if with_floor else ""
    return (
        f'Integrator "{integrator}" "integer maxdepth" [{maxdepth}] '
        '"integer iterations" [1] "bool expiterations" ["false"]\n'
        f'Sampler "random" "integer pixelsamples" [{spp}]\n'
        f'Film "image" "integer xresolution" [{size}] '
        f'"integer yresolution" [{size}]\n'
        "LookAt 0 0.5 -3  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'LightSource "infinite" "rgb L" [1 1 1]\n' + floor + "WorldEnd\n"
    )


def test_bdpt_infinite_light_direct(tmp_path):
    """All camera rays escape into a constant L=1 environment: the
    (s=0, t=2) strategy must reproduce it exactly (weight 1), i.e. the
    escaped-ray light vertex exists (bdpt.cpp:962-1000)."""
    f = _render(_env_scene("bdpt", 8, with_floor=False), tmp_path,
                "e.pbrt")
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f, 1.0, atol=1e-3)


def test_bdpt_infinite_light_matches_path(tmp_path):
    """Env-lit floor: bdpt's strategy mixture (s=0 escaped vertices +
    s=1 env NEE + surface connections) estimates the same integral as
    unidirectional path tracing."""
    f_path = _render(_env_scene("path", 128), tmp_path, "p.pbrt")
    f_bdpt = _render(_env_scene("bdpt", 128), tmp_path, "b.pbrt")
    assert np.isfinite(f_bdpt).all()
    rel = abs(f_bdpt.mean() - f_path.mean()) / f_path.mean()
    assert rel < 0.05, (
        f"bdpt {f_bdpt.mean():.4f} vs path {f_path.mean():.4f}"
    )
