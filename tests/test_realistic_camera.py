"""Realistic camera: lens tracing, autofocus, exit pupil, rendering.

Reference: /root/reference/src/cameras/realistic.cpp (element trace
100-151, thick-lens focus 429-474, exit pupil 499-537, GenerateRay
749-784)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from statmc_tpu.render import camera as CAM

LENS = os.path.join(os.path.dirname(__file__), "fixtures", "biconvex.dat")
FOCUS = 2.0  # metres


def _rows():
    rows = []
    with open(LENS) as f:
        for line in f:
            line = line.split("#", 1)[0]
            rows.extend(float(t) for t in line.split())
    return np.asarray(rows, np.float64)


def _cam(xres=32, yres=32, aperture=2.0):
    c2w = np.eye(4, dtype=np.float32)
    return CAM.make_realistic(c2w, _rows(), xres, yres, aperture, FOCUS,
                              35.0)


def test_autofocus_converges_at_focus_distance():
    """Rays from the film centre through many pupil samples must all
    pass near the on-axis point at `focusdistance` (the thick-lens
    solve, realistic.cpp:454-474)."""
    cam = _cam()
    n = 64
    rng = np.random.default_rng(0)
    pf = jnp.broadcast_to(jnp.asarray([16.0, 16.0]), (n, 2))
    ul = jnp.asarray(rng.random((n, 2)), jnp.float32)
    o, d, w = CAM.generate_rays_weighted(cam, pf, ul)
    o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
    alive = w > 0
    assert alive.sum() > n // 2, "most pupil samples should survive"
    # Closest approach to the axis point (0, 0, FOCUS) in camera space
    # (identity c2w): t* = dot(target - o, d).
    target = np.array([0.0, 0.0, FOCUS])
    t = np.einsum("ij,ij->i", target[None] - o, d)
    closest = o + t[:, None] * d
    miss = np.linalg.norm(closest[alive] - target, axis=-1)
    # Paraxial focus: at f/17 the residual spherical aberration
    # is well under a millimetre at 2 m.
    assert miss.max() < 0.002, f"focus spread {miss.max():.4f} m"


def test_small_aperture_approaches_pinhole():
    """Stopping the lens down shrinks the focus blur radius."""
    wide = _cam(aperture=10.0)
    tight = _cam(aperture=2.0)
    n = 128
    rng = np.random.default_rng(1)
    pf = jnp.broadcast_to(jnp.asarray([16.0, 16.0]), (n, 2))
    ul = jnp.asarray(rng.random((n, 2)), jnp.float32)

    def blur_at(cam, z):
        o, d, w = CAM.generate_rays_weighted(cam, pf, ul)
        o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
        t = (z - o[:, 2]) / d[:, 2]
        p = o + t[:, None] * d
        m = w > 0
        return np.linalg.norm(p[m, :2] - p[m, :2].mean(0), axis=-1).mean()

    # At the focus plane the tight aperture converges ~100x better
    # (the wide f/3.5 singlet's spherical aberration dominates there).
    assert blur_at(tight, FOCUS) < blur_at(wide, FOCUS) * 0.1


def test_realistic_render_focus(tmp_path):
    """End-to-end: a small emissive quad at the focus plane renders
    sharper (more concentrated energy) than the same quad off-focus."""
    def scene(zq, half):
        return (
            'Integrator "path" "integer maxdepth" [2] '
            '"integer iterations" [1] "bool expiterations" ["false"]\n'
            'Sampler "random" "integer pixelsamples" [64]\n'
            'Film "image" "integer xresolution" [48] '
            '"integer yresolution" [48]\n'
            f'Camera "realistic" "string lensfile" ["{LENS}"] '
            f'"float focusdistance" [{FOCUS}] '
            '"float aperturediameter" [10.0]\n'
            "WorldBegin\n"
            'AttributeBegin\n'
            'AreaLightSource "diffuse" "rgb L" [40 40 40]\n'
            'ReverseOrientation\n'
            'Material "matte" "rgb Kd" [0 0 0]\n'
            'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
            '"point P" '
            f"[-{half} -{half} {zq}  {half} -{half} {zq}  "
            f"{half} {half} {zq}  -{half} {half} {zq}]\n"
            "AttributeEnd\nWorldEnd\n"
        )

    from statmc_tpu.driver import load

    def energy_conc(zq, half):
        p = tmp_path / f"s{zq}.pbrt"
        p.write_text(scene(zq, half))
        r = load(str(p))
        r.render(iterations=1, verbose=False)
        f = np.asarray(r.film_mean)[..., 0]
        tot = f.sum()
        assert np.isfinite(f).all() and tot > 0
        # Energy concentration: fraction of total in the brightest 4
        # pixels (sharp image -> concentrated).
        return np.sort(f.ravel())[-4:].sum() / tot

    # Equal angular size (image ~0.4 mm on the 35 mm film): in focus
    # it lands in a couple of pixels; at 0.15 m the f/3.5 defocus blur
    # (~1 mm radius) spreads it over many.
    sharp = energy_conc(FOCUS, 0.02)
    blurred = energy_conc(0.15, 0.0015)
    assert sharp > blurred + 0.15, (sharp, blurred)
