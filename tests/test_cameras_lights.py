"""Orthographic/environment cameras + goniometric/projection lights."""
import jax.numpy as jnp
import numpy as np

from statmc_tpu.render import camera as CAM


def test_orthographic_rays_parallel():
    cam = CAM.make_orthographic(np.eye(4, dtype=np.float32), 32, 32)
    pf = jnp.asarray([[0.5, 0.5], [16.0, 16.0], [31.5, 31.5]])
    o, d = CAM.generate_rays(cam, pf)
    d = np.asarray(d)
    np.testing.assert_allclose(d, [[0, 0, 1]] * 3, atol=1e-6)
    o = np.asarray(o)
    assert not np.allclose(o[0], o[2])  # origins spread over the window


def test_environment_rays_cover_sphere():
    cam = CAM.make_environment(np.eye(4, dtype=np.float32), 64, 32)
    xs, ys = np.meshgrid(np.arange(64) + 0.5, np.arange(32) + 0.5)
    pf = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1),
                     dtype=jnp.float32)
    o, d = CAM.generate_rays(cam, pf)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # Directions span all octants.
    for axis in range(3):
        assert d[:, axis].max() > 0.5 and d[:, axis].min() < -0.5
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)


def _point_scene(light_stmt):
    return (
        'Integrator "statpath" "integer maxdepth" [2] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [4]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        f"{light_stmt}"
        'Material "matte" "rgb Kd" [0.6 0.6 0.6]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n'
        "WorldEnd\n"
    )


def _render(text):
    import tempfile

    from statmc_tpu.driver import load

    with tempfile.NamedTemporaryFile("w", suffix=".pbrt",
                                     delete=False) as f:
        f.write(text)
        path = f.name
    r = load(path)
    r.render(iterations=1, verbose=False)
    return np.asarray(r.film_mean), r


def test_goniometric_light_no_map_equals_point():
    img_g, rg = _render(_point_scene(
        'AttributeBegin\nTranslate 0 4 0\n'
        'LightSource "goniometric" "rgb I" [20 20 20]\nAttributeEnd\n'))
    img_p, rp = _render(_point_scene(
        'LightSource "point" "rgb I" [20 20 20] '
        '"point from" [0 4 0]\n'))
    assert np.isfinite(img_g).all() and img_g.mean() > 0
    # Without a map the goniometric light degenerates to a point light.
    np.testing.assert_allclose(img_g, img_p, rtol=1e-4, atol=1e-5)


def test_projection_light_limits_to_frustum():
    img, r = _render(_point_scene(
        "AttributeBegin\nTranslate 0 4 0\nRotate 90 1 0 0\n"
        'LightSource "projection" "rgb I" [40 40 40] "float fov" [30]\n'
        "AttributeEnd\n"))
    assert np.isfinite(img).all()
    # A 30 degree projector pointing down lights a spot, not the
    # whole floor: some lit, some dark pixels.
    sums = img.sum(-1)
    assert (sums > 1e-5).any()
    assert (sums < 1e-5).any()


def test_ortho_camera_scene_renders():
    text = (
        'Integrator "statpath" "integer maxdepth" [2] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [2]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 0 -5  0 0 0  0 1 0\n"
        'Camera "orthographic" "float screenwindow" [-3 3 -3 3]\n'
        "WorldBegin\n"
        'LightSource "point" "rgb I" [30 30 30] "point from" [0 3 -3]\n'
        'Material "matte" "rgb Kd" [0.6 0.6 0.6]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-2 -2 0  2 -2 0  2 2 0  -2 2 0]\n'
        "WorldEnd\n"
    )
    img, r = _render(text)
    assert np.isfinite(img).all() and img.mean() > 0
