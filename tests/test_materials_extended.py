"""Extended material families: disney, hair, subsurface maps, mix fold."""
import jax.numpy as jnp
import numpy as np

from statmc_tpu.render import bsdf as B
from statmc_tpu.scene import build as sb


def _lanes(mat_type, kd=(0.5, 0.5, 0.5), ks=(0.2, 0.2, 0.2), rough=0.1,
           sigma=0.0, n=1):
    ones = np.ones((n, 3), np.float32)
    return B.MaterialLanes(
        mat_type=jnp.full((n,), mat_type, jnp.int32),
        kd=jnp.asarray(np.asarray(kd, np.float32) * ones),
        ks=jnp.asarray(np.asarray(ks, np.float32) * ones),
        kr=jnp.asarray(ones), kt=jnp.asarray(ones),
        eta=jnp.asarray(1.5 * ones), k=jnp.asarray(0.0 * ones),
        rough_u=jnp.full((n,), rough), rough_v=jnp.full((n,), rough),
        sigma=jnp.full((n,), sigma),
    )


def _mc_albedo(m, n=4096, seed=0):
    """Monte Carlo hemispherical albedo of the sampled lobe set."""
    rng = np.random.default_rng(seed)
    wo = jnp.asarray(np.tile([[0.3, 0.1, 0.95]], (n, 1)) /
                     np.linalg.norm([0.3, 0.1, 0.95]))
    u2 = jnp.asarray(rng.random((n, 2)), dtype=jnp.float32)
    uc = jnp.asarray(rng.random(n), dtype=jnp.float32)
    # Optional plumbing fields (fourier_id/fourier_tab/hair_h) stay None
    # when absent; only broadcast the array-valued lanes.
    mm = B.MaterialLanes(*[x if x is None
                           else jnp.broadcast_to(x, (n,) + x.shape[1:])
                           for x in m])
    s = B.sample(mm, wo, u2, uc)
    w = np.asarray(s.f * B.abs_cos_theta(s.wi)[..., None]
                   / jnp.maximum(s.pdf, 1e-9)[..., None])
    return w.mean(axis=0)


def test_disney_energy_bounded_and_metallic_shifts():
    alb_dielectric = _mc_albedo(_lanes(sb.MAT_DISNEY, kd=(0.8, 0.2, 0.2),
                                       rough=0.25, sigma=0.0))
    alb_metal = _mc_albedo(_lanes(sb.MAT_DISNEY, kd=(0.8, 0.2, 0.2),
                                  rough=0.25, sigma=1.0))
    assert (alb_dielectric <= 1.05).all()
    assert (alb_metal <= 1.05).all()
    # Metallic kills the diffuse lobe: less total energy, tinted spec.
    assert alb_metal[0] < alb_dielectric[0]
    assert alb_metal[0] > 2.5 * alb_metal[1]  # strongly tinted


def test_hair_lobe_finite_and_colored():
    alb = _mc_albedo(_lanes(sb.MAT_HAIR, kd=(0.6, 0.3, 0.1), rough=0.09))
    assert np.isfinite(alb).all() and (alb > 0).all()
    assert alb[0] > alb[2]  # keeps the absorption color ordering


def test_mix_fold_lerps_params():
    r1 = dict(mat_type=sb.MAT_MATTE, kd=np.array([1.0, 0, 0], np.float32),
              ks=np.zeros(3, np.float32), kr=np.zeros(3, np.float32),
              kt=np.zeros(3, np.float32), eta=np.ones(3, np.float32),
              k=np.zeros(3, np.float32), rough_u=0.0, rough_v=0.0,
              sigma=0.0, kd_tex_name=None)
    r2 = dict(r1, kd=np.array([0, 0, 1.0], np.float32), rough_u=0.4,
              rough_v=0.4)
    out = sb._mix_rows(r1, r2, np.full(3, 0.25, np.float32))
    np.testing.assert_allclose(out["kd"], [0.25, 0, 0.75], rtol=1e-6)
    assert abs(out["rough_u"] - 0.3) < 1e-6
    assert out["mat_type"] == sb.MAT_MATTE


def test_scene_with_new_materials_renders():
    import tempfile

    from statmc_tpu.driver import load

    text = (
        'Integrator "statpath" "integer maxdepth" [3] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [4]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'MakeNamedMaterial "red" "string type" ["matte"] "rgb Kd" [1 0 0]\n'
        'MakeNamedMaterial "gloss" "string type" ["plastic"] '
        '"rgb Kd" [0 0 1]\n'
        'Material "mix" "string namedmaterial1" ["red"] '
        '"string namedmaterial2" ["gloss"] "rgb amount" [0.5 0.5 0.5]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n'
        'Material "disney" "rgb color" [0.7 0.5 0.3] '
        '"float metallic" [0.8] "float roughness" [0.3]\n'
        "AttributeBegin\nTranslate -1 0 0\n"
        'Shape "sphere" "float radius" [0.8]\nAttributeEnd\n'
        'Material "hair" "float eumelanin" [1.3]\n'
        "AttributeBegin\nTranslate 1 0 0\n"
        'Shape "curve" "point P" [0 -1 0  0.2 -0.3 0  0.3 0.4 0  0 1 0] '
        '"float width0" [0.4] "float width1" [0.1]\nAttributeEnd\n'
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [10 10 10]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1 4 -1  1 4 -1  1 4 1  -1 4 1]\n'
        "AttributeEnd\n"
        "WorldEnd\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".pbrt",
                                     delete=False) as f:
        f.write(text)
        path = f.name
    r = load(path)
    assert sb.MAT_DISNEY in np.asarray(r.s.scene.mat_type)
    assert sb.MAT_HAIR in np.asarray(r.s.scene.mat_type)
    r.render(iterations=1, verbose=False)
    img = np.asarray(r.film_mean)
    assert np.isfinite(img).all() and img.mean() > 0
