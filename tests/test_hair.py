"""Marschner hair BSDF validation, in the pattern of the reference's
/root/reference/src/tests/hair.cpp: white-furnace energy conservation
(uniform and importance-sampled), pdf normalization over the sphere,
and per-sample weight sanity for the sampled lobe."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from statmc_tpu.render import hair


def _lanes(n, h, beta_m, beta_n, sigma_a=(0.0, 0.0, 0.0), eta=1.55,
           alpha=0.0):
    ones = jnp.ones((n,))
    return hair.HairLanes(
        h=ones * h,
        eta=ones * eta,
        sigma_a=jnp.broadcast_to(jnp.asarray(sigma_a, jnp.float32), (n, 3)),
        beta_m=ones * beta_m,
        beta_n=ones * beta_n,
        alpha=ones * alpha,
    )


def _uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([z, r * jnp.cos(phi), r * jnp.sin(phi)], -1)


N = 1 << 16


@pytest.mark.parametrize("beta_m,beta_n", [(0.4, 0.6), (0.8, 0.8)])
def test_white_furnace_uniform(beta_m, beta_n):
    """sigma_a=0: int f * |cos| dwi == 1 (hair.cpp WhiteFurnace test)."""
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((N, 2), np.float32))
    wo = _uniform_sphere(jnp.asarray(rng.random((1, 2), np.float32)))
    wo = jnp.broadcast_to(wo, (N, 3))
    h = float(rng.uniform(-0.9, 0.9))
    hp = _lanes(N, h, beta_m, beta_n)
    wi = _uniform_sphere(u)
    f = jax.jit(hair.eval_f)(hp, wo, wi)
    est = f * jnp.abs(wi[..., 2:3]) * (4.0 * jnp.pi)
    mean = float(est.mean(0)[1])
    assert 0.90 < mean < 1.10, mean


@pytest.mark.parametrize("beta_m,beta_n", [(0.1, 0.2), (0.4, 0.4),
                                           (0.9, 0.9)])
def test_white_furnace_sampled(beta_m, beta_n):
    """E[f*|cos|/pdf] == 1 under sample_wi (WhiteFurnaceSampled)."""
    rng = np.random.default_rng(11)
    wo = _uniform_sphere(jnp.asarray(rng.random((1, 2), np.float32)))
    wo = jnp.broadcast_to(wo, (N, 3))
    hp = _lanes(N, float(rng.uniform(-0.9, 0.9)), beta_m, beta_n)
    u2 = jnp.asarray(rng.random((N, 2), np.float32))
    uc = jnp.asarray(rng.random((N,), np.float32))

    @jax.jit
    def weights(hp, wo, u2, uc):
        wi = hair.sample_wi(hp, wo, u2, uc)
        f = hair.eval_f(hp, wo, wi)
        p = hair.pdf(hp, wo, wi)
        return f * jnp.abs(wi[..., 2:3]) / jnp.maximum(p, 1e-12)[..., None]

    w = weights(hp, wo, u2, uc)
    mean = float(w.mean(0)[1])
    assert 0.97 < mean < 1.03, mean


def test_pdf_normalized():
    """int pdf dwi == 1 over the sphere (SamplingConsistency precursor)."""
    rng = np.random.default_rng(3)
    wo = _uniform_sphere(jnp.asarray(rng.random((1, 2), np.float32)))
    wo = jnp.broadcast_to(wo, (N, 3))
    hp = _lanes(N, 0.3, 0.5, 0.5, sigma_a=(0.3, 0.5, 1.2), alpha=2.0)
    wi = _uniform_sphere(jnp.asarray(rng.random((N, 2), np.float32)))
    p = jax.jit(hair.pdf)(hp, wo, wi)
    est = float((p * 4.0 * jnp.pi).mean())
    assert 0.92 < est < 1.08, est


def test_sampling_weights_near_one():
    """With alpha=0 the sampled weight f*cos/pdf stays near 1 per sample
    (hair.cpp SamplingWeights: weight in [0.99, 1.01] up to absorption)."""
    rng = np.random.default_rng(5)
    wo = _uniform_sphere(jnp.asarray(rng.random((N, 2), np.float32)))
    hp = _lanes(N, -0.25, 0.6, 0.7)
    u2 = jnp.asarray(rng.random((N, 2), np.float32))
    uc = jnp.asarray(rng.random((N,), np.float32))
    wi = jax.jit(hair.sample_wi)(hp, wo, u2, uc)
    f = hair.eval_f(hp, wo, wi)
    p = hair.pdf(hp, wo, wi)
    w = np.asarray(f[:, 1] * jnp.abs(wi[:, 2]) / jnp.maximum(p, 1e-12))
    # All weights finite and tightly clustered around 1.
    assert np.isfinite(w).all()
    assert 0.95 < float(np.median(w)) < 1.05, float(np.median(w))


def test_absorption_darkens():
    """Higher sigma_a strictly reduces the furnace response."""
    rng = np.random.default_rng(9)
    wo = _uniform_sphere(jnp.asarray(rng.random((1, 2), np.float32)))
    wo = jnp.broadcast_to(wo, (N, 3))
    wi = _uniform_sphere(jnp.asarray(rng.random((N, 2), np.float32)))
    means = []
    for sa in (0.0, 0.5, 2.0):
        hp = _lanes(N, 0.4, 0.5, 0.5, sigma_a=(sa, sa, sa))
        f = hair.eval_f(hp, wo, wi)
        means.append(float((f[..., 1] * jnp.abs(wi[..., 2])).mean()))
    assert means[0] > means[1] > means[2]


def test_sigma_a_conversions():
    """SigmaAFromConcentration/Reflectance behaviors (hair.cpp:270-287):
    darker reflectance -> more absorption; eumelanin absorbs blue most."""
    sa = np.asarray(hair.sigma_a_from_concentration(1.3, 0.0))
    assert sa[0] < sa[1] < sa[2]
    dark = np.asarray(hair.sigma_a_from_reflectance(
        jnp.full((3,), 0.1), 0.3))
    light = np.asarray(hair.sigma_a_from_reflectance(
        jnp.full((3,), 0.8), 0.3))
    assert (dark > light).all()


def test_material_lanes_wiring():
    """MaterialLanes slot mapping -> HairLanes (scene/build.py MAT_HAIR):
    evaluate/sample route hair lanes through the full Marschner model
    when hair_h is set, and the sampled weight is consistent."""
    from statmc_tpu.render import bsdf as B
    from statmc_tpu.scene import build as sb

    n = 4096
    rng = np.random.default_rng(13)
    ones = np.ones((n, 3), np.float32)
    m = B.MaterialLanes(
        mat_type=jnp.full((n,), sb.MAT_HAIR, jnp.int32),
        kd=jnp.asarray(0.5 * ones), ks=jnp.asarray(0.0 * ones),
        kr=jnp.asarray(ones),
        kt=jnp.asarray(0.0 * ones),              # sigma_a = 0 (furnace)
        eta=jnp.asarray(1.55 * ones), k=jnp.asarray(0.0 * ones),
        rough_u=jnp.full((n,), 0.6),             # beta_n
        rough_v=jnp.full((n,), 0.0),             # alpha degrees
        sigma=jnp.full((n,), 0.5),               # beta_m
        hair_h=jnp.full((n,), 0.2),
    )
    wo = _uniform_sphere(jnp.asarray(rng.random((n, 2), np.float32)))
    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    uc = jnp.asarray(rng.random((n,), np.float32))
    s = B.sample(m, wo, u2, uc)
    w = np.asarray(s.f[:, 1] * np.abs(np.asarray(s.wi)[:, 2])
                   / np.maximum(np.asarray(s.pdf), 1e-12))
    assert np.isfinite(w).all()
    assert 0.9 < float(np.median(w)) < 1.1, float(np.median(w))
    # evaluate() must keep energy below the surface (TT lobe): some
    # sampled directions transmit through the fiber.
    below = np.asarray(s.wi)[:, 2] * np.asarray(wo)[:, 2] < 0
    assert below.mean() > 0.05, below.mean()


@pytest.mark.slow
def test_hair_scene_renders(tmp_path):
    """End-to-end: curve shapes with Material "hair" render finite and
    non-black through the wavefront integrator (tangent frame +
    Marschner lobes)."""
    from statmc_tpu.driver import load

    text = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective" "float fov" [60]
Sampler "random" "integer pixelsamples" [16]
Integrator "path" "integer maxdepth" [4]
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point from" [0 2 0] "point to" [0 0 2]
Material "hair" "float eumelanin" [0.8]
Shape "curve" "point P" [-0.6 -0.3 2  -0.2 0.4 2  0.2 -0.4 2  0.6 0.3 2]
  "float width" [0.25]
Material "matte" "rgb Kd" [0.4 0.4 0.4]
AttributeBegin
  Translate 0 0 4
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-5 -5 0  5 -5 0  5 5 0  -5 5 0]
AttributeEnd
WorldEnd
"""
    p = tmp_path / "hair.pbrt"
    p.write_text(text)
    r = load(str(p))
    assert bool(np.any(np.asarray(r.s.scene.mat_type) == 10))
    r.render(iterations=1, verbose=False)
    film = np.asarray(r.film_mean)
    assert np.isfinite(film).all()
    assert film.mean() > 0
