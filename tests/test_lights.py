"""Light sampling unit tests: pdf consistency and irradiance estimates
against closed forms (shapes/{sphere,triangle}.cpp Sample/Pdf math)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from statmc_tpu.core import math as cm
from statmc_tpu.render import lights as LT
from statmc_tpu.scene import build as sb
from statmc_tpu.scene.api import parse_scene
from statmc_tpu.scene.build import build_scene
import tempfile


def _scene(text):
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(
            'Integrator "statpath" "integer iterations" [1]\n'
            'Film "image" "integer xresolution" [4] '
            '"integer yresolution" [4] "string filename" ["t.pfm"]\n'
            'Camera "perspective" "float fov" [60]\nWorldBegin\n'
            + text + "WorldEnd\n"
        )
    return build_scene(parse_scene(p)).to_device()


def test_sphere_light_solid_angle_estimate():
    """Monte Carlo estimate of the subtended solid angle of a sphere
    light equals the cone formula 2*pi*(1-cos_theta_max)."""
    sc = _scene(
        'AttributeBegin\nAreaLightSource "diffuse" "rgb L" [1 1 1]\n'
        'Material "matte" "rgb Kd" [0 0 0]\n'
        'TransformBegin\nTransform [1 0 0 0 0 1 0 0 0 0 1 0 0 0 5 1]\n'
        'Shape "sphere" "float radius" [1.0]\nTransformEnd\nAttributeEnd\n'
    )
    R = 4096
    rng = np.random.default_rng(0)
    ref_p = jnp.zeros((R, 3))
    ref_n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    u2 = jnp.asarray(rng.random((R, 2)), jnp.float32)
    ls = LT.sample_li(sc, jnp.zeros((R,), jnp.int32), ref_p, ref_n, u2)
    # Each sample's 1/pdf estimates the solid angle.
    est = float(jnp.mean(1.0 / jnp.maximum(ls.pdf, 1e-9)))
    d, r = 5.0, 1.0
    cos_max = np.sqrt(1 - (r / d) ** 2)
    expect = 2 * np.pi * (1 - cos_max)
    np.testing.assert_allclose(est, expect, rtol=1e-3)
    # All sampled directions lie inside the cone.
    cos_to_center = np.asarray(ls.wi[:, 2])
    assert (cos_to_center >= cos_max - 1e-4).all()


def test_triangle_light_irradiance():
    """Irradiance from a diffuse quad overhead matches the analytic
    form factor: E = L * solid-angle-weighted integral; estimated via
    NEE samples sum(L * cos_surf / pdf)/N."""
    sc = _scene(
        'AttributeBegin\nAreaLightSource "diffuse" "rgb L" [2 2 2]\n'
        'Material "matte" "rgb Kd" [0 0 0]\n'
        'Shape "trianglemesh" "integer indices" [0 2 1 0 3 2] '
        '"point P" [-1 -1 3  1 -1 3  1 1 3  -1 1 3]\n'
        'AttributeEnd\n'
    )
    # Lights are per-triangle: two lights.
    assert int(sc.light_kind.shape[0]) == 2
    R = 8192
    rng = np.random.default_rng(1)
    ref_p = jnp.zeros((R, 3))
    ref_n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    u2 = jnp.asarray(rng.random((R, 2)), jnp.float32)
    light_id = jnp.asarray(rng.integers(0, 2, R), jnp.int32)
    ls = LT.sample_li(sc, light_id, ref_p, ref_n, u2)
    cos_s = jnp.maximum(ls.wi[:, 2], 0.0)
    # Each sample estimates its chosen light's irradiance; dividing by
    # the uniform selection pmf (1/2) makes the mean estimate E0 + E1.
    est = float(jnp.mean(
        ls.li[:, 0] * cos_s / jnp.maximum(ls.pdf, 1e-9) / 0.5
    ))
    # Analytic irradiance from a 2x2 Lambertian quad at height 3 over
    # the origin with radiance L: E = L * Omega_proj; compute by dense
    # numeric integration for the expected value.
    xs = np.linspace(-1, 1, 400)
    X, Y = np.meshgrid(xs, xs)
    d2 = X**2 + Y**2 + 9.0
    cos1 = 3.0 / np.sqrt(d2)  # at the receiver
    cos2 = 3.0 / np.sqrt(d2)  # at the emitter (parallel planes)
    dA = (2 / 400) ** 2
    expect = 2.0 * np.sum(cos1 * cos2 / d2) * dA
    np.testing.assert_allclose(est, expect, rtol=0.05)


def test_point_light_inverse_square():
    sc = _scene(
        'LightSource "point" "rgb I" [4 4 4] "point from" [0 0 2]\n'
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        'Shape "sphere" "float radius" [0.1]\n'
    )
    R = 4
    ref_p = jnp.zeros((R, 3))
    ref_n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    u2 = jnp.full((R, 2), 0.5)
    ls = LT.sample_li(sc, jnp.zeros((R,), jnp.int32), ref_p, ref_n, u2)
    np.testing.assert_allclose(np.asarray(ls.li[:, 0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ls.pdf), 1.0)
    assert bool(ls.is_delta.all())


def test_distant_light():
    sc = _scene(
        'LightSource "distant" "rgb L" [3 3 3] '
        '"point from" [0 0 0] "point to" [0 0 1]\n'
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        'Shape "sphere" "float radius" [0.1]\n'
    )
    R = 4
    ls = LT.sample_li(
        sc, jnp.zeros((R,), jnp.int32), jnp.zeros((R, 3)),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3)),
        jnp.full((R, 2), 0.3),
    )
    # Direction TOWARD the light source (opposite of propagation).
    np.testing.assert_allclose(np.asarray(ls.wi[:, 2]), -1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ls.li[:, 0]), 3.0)
