"""Procedural texture kinds (scene/textures.py) vs pbrt semantics."""
import jax.numpy as jnp
import numpy as np

from statmc_tpu.scene import textures as TX


def _table(builder):
    return builder.build()


def test_noise_band_limited():
    # Gradient noise: zero at lattice points, bounded, smooth.
    xs = np.arange(0, 8, 1.0)
    at_lattice = TX.noise3(jnp.asarray(xs), jnp.asarray(xs),
                           jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(at_lattice), 0.0, atol=1e-6)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random((4096, 3)) * 40)
    v = np.asarray(TX.noise_p(p))
    assert np.abs(v).max() <= 2.0  # gradient noise bound
    assert v.std() > 0.05  # not degenerate
    assert abs(v.mean()) < 0.05  # zero-mean


def test_fbm_octaves_add_energy():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.random((2048, 3)) * 10)
    v1 = np.asarray(TX.fbm(p, 0.5, jnp.asarray(1.0)))
    v6 = np.asarray(TX.fbm(p, 0.5, jnp.asarray(6.0)))
    assert v6.std() > v1.std()


def test_constant_and_scale_and_mix():
    b = TX.TextureTableBuilder()
    c = b.add_constant([0.2, 0.4, 0.6])
    c2 = b.add_constant([0.4, 0.4, 0.3])
    s = b.add_scale(c, [2.0, 1.0, 0.5])
    m = b.add_mix(c, c2, 0.5)  # combinators nest one level deep
    t = _table(b)
    uv = jnp.zeros((3, 2))
    p = jnp.zeros((3, 3))
    out = TX.sample_texture(t, jnp.asarray([c, s, m]), uv, p)
    np.testing.assert_allclose(np.asarray(out[0]), [0.2, 0.4, 0.6],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [0.4, 0.4, 0.3],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), [0.3, 0.4, 0.45],
                               rtol=1e-6)


def test_uv_and_bilerp():
    b = TX.TextureTableBuilder()
    u = b.add_uv()
    bl = b.add_bilerp([0, 0, 0], [0, 1, 0], [1, 0, 0], [1, 1, 1])
    t = _table(b)
    uv = jnp.asarray([[0.25, 0.75], [1.0, 0.0]])
    out = TX.sample_texture(t, jnp.asarray([u, bl]), uv)
    np.testing.assert_allclose(np.asarray(out[0]), [0.25, 0.75, 0.0],
                               rtol=1e-6)
    # bilerp at (1.0 % 1 = 0, 0) -> v00
    np.testing.assert_allclose(np.asarray(out[1]), [0, 0, 0], atol=1e-6)


def test_marble_in_palette_range():
    b = TX.TextureTableBuilder()
    m = b.add_noise(TX.KIND_MARBLE, octaves=8, omega=0.5, scale=1.0,
                    variation=0.2)
    t = _table(b)
    rng = np.random.default_rng(3)
    R = 512
    p = jnp.asarray(rng.random((R, 3)) * 10 - 5)
    out = np.asarray(TX.sample_texture(
        t, jnp.full((R,), m, jnp.int32), jnp.zeros((R, 2)), p))
    assert np.isfinite(out).all()
    # 1.5 x spline of colors in [0.2, 0.6] -> values in [0.3, 0.9].
    assert out.min() >= 0.2 and out.max() <= 1.0
    assert out.std() > 0.01


def test_dots_coverage():
    b = TX.TextureTableBuilder()
    d = b.add_dots([1, 0, 0], [0, 0, 1])
    t = _table(b)
    rng = np.random.default_rng(4)
    uv = jnp.asarray(rng.random((8192, 2)) * 50)
    out = np.asarray(TX.sample_texture(
        t, jnp.full((8192,), d, jnp.int32), uv))
    frac_inside = (out[:, 0] > 0.5).mean()
    # ~half the cells have dots, dot covers pi*r^2 ~ 38% of its cell.
    assert 0.05 < frac_inside < 0.4


def test_scene_with_marble_kd_renders():
    import tempfile

    from statmc_tpu.driver import load

    text = (
        'Integrator "statpath" "integer maxdepth" [2] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [2]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'Texture "swirl" "spectrum" "marble" "float scale" [2]\n'
        'Material "matte" "texture Kd" ["swirl"]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n'
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [8 8 8]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1 4 -1  1 4 -1  1 4 1  -1 4 1]\n'
        "AttributeEnd\n"
        "WorldEnd\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".pbrt", delete=False) as f:
        f.write(text)
        path = f.name
    r = load(path)
    r.render(iterations=1, verbose=False)
    img = np.asarray(r.film_mean)
    assert np.isfinite(img).all() and img.mean() > 0
    # Marble varies across the floor: the image is not constant.
    lit = img[img.sum(-1) > 0]
    assert lit.std() > 1e-4
