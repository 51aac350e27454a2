"""Albedo LUT system: interpolation, precompute vs closed forms,
per-material reduced curves."""
import numpy as np
import jax
import jax.numpy as jnp

from statmc_tpu.render.albedo_lut import (
    LookupTable, albedo_from_curves, precompute_family,
    precompute_material_curves,
)


def test_lookup_table_interpolation():
    # 2-D bilinear on a known plane f(x,y) = 2x + 3y.
    n0, n1 = 5, 9
    xs = np.linspace(0, 1, n0)
    ys = np.linspace(0, 1, n1)
    data = (2 * xs[:, None] + 3 * ys[None, :]).reshape(-1)
    lut = LookupTable(jnp.asarray(data, jnp.float32), (n0, n1))
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((64, 2)), jnp.float32)
    out = np.asarray(lut.lookup(c))
    expect = 2 * np.asarray(c[:, 0]) + 3 * np.asarray(c[:, 1])
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_matte_lut_matches_lambert():
    """sigma=0 matte albedo is exactly Kd=1 -> 1.0 at all angles."""
    lut = precompute_family("matte", (8, 8), n_samples=256)
    vals = np.asarray(lut.data).reshape(8, 8)
    np.testing.assert_allclose(vals[:, 0], 1.0, atol=0.02)  # sigma=0 col
    # Oren-Nayar loses energy at grazing + high sigma.
    assert vals[0, -1] < 0.95


def test_material_curves_scene():
    """Reduced curves on a mini scene: matte row scales with Kd; metal
    row is chromatic (copper-like)."""
    import tempfile
    from statmc_tpu.scene.api import parse_scene
    from statmc_tpu.scene.build import build_scene

    scene = (
        'Integrator "statpath" "integer iterations" [1]\n'
        'Film "image" "integer xresolution" [4] "integer yresolution" [4] '
        '"string filename" ["t.pfm"]\n'
        'Camera "perspective" "float fov" [60]\nWorldBegin\n'
        'Material "matte" "rgb Kd" [0.25 0.5 0.75]\n'
        'Shape "sphere" "float radius" [1]\n'
        'Material "metal" "float roughness" [0.1] '
        '"bool remaproughness" ["false"]\n'
        'Shape "sphere" "float radius" [2]\n'
        'WorldEnd\n'
    )
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(scene)
    sc = build_scene(parse_scene(p)).to_device()
    lut_d, lut_rest = precompute_material_curves(sc, n_cos=8, n_samples=256)
    # Matte (row 0): diffuse part ~1 at normal incidence, rest ~0.
    assert float(lut_d[0, -1, 0]) > 0.95
    np.testing.assert_allclose(np.asarray(lut_rest[0]), 0.0, atol=1e-6)
    # Metal (row 1): no diffuse; chromatic rest (copper: R > B).
    np.testing.assert_allclose(np.asarray(lut_d[1]), 0.0, atol=1e-6)
    r, b = float(lut_rest[1, -1, 0]), float(lut_rest[1, -1, 2])
    assert r > b + 0.1

    # Query path: matte albedo == Kd * curve.
    alb = albedo_from_curves(
        lut_d, lut_rest, jnp.asarray([0], jnp.int32),
        jnp.asarray([[0.25, 0.5, 0.75]]), jnp.asarray([0.9]),
    )
    np.testing.assert_allclose(
        np.asarray(alb[0]), [0.25, 0.5, 0.75], atol=0.03
    )


# --- full N-D family tables (round-2 verdict #7) ------------------------


def test_family_axes_match_reference_grids():
    """Axis inventory mirrors precomputealbedo/main.cpp:78-128: 9
    precomputed families with the reference's dimensionalities."""
    from statmc_tpu.render.albedo_lut import FAMILY_AXES

    dims = {f: len(a) for f, a in FAMILY_AXES.items()}
    assert dims == {"matte": 2, "mirror": 2, "hair": 4, "plastic": 4,
                    "metal": 5, "substrate": 5, "translucent": 6,
                    "glass": 6, "uber": 8}
    for axes in FAMILY_AXES.values():
        assert axes[0][0] == "cos_theta"


def test_mirror_family_exact():
    """Mirror albedo is exactly Kr (delta lobe): LUT linear in axis 1."""
    from statmc_tpu.render.albedo_lut import precompute_family_nd

    lut = precompute_family_nd("mirror", (3, 5), n_samples=16)
    vals = np.asarray(lut.data).reshape(3, 5)
    np.testing.assert_allclose(vals[0], np.linspace(0, 1, 5), atol=1e-5)


def test_plastic_family_offgrid_compare():
    """--compare criterion on a mid-size plastic table: interpolated
    LUT within 0.05 + MC noise of fresh MC at off-grid params
    (main.cpp:50 LutCheckThreshold)."""
    import jax.numpy as jnp

    from statmc_tpu.render.albedo_lut import (
        mc_albedo_at, precompute_family_nd,
    )

    lut = precompute_family_nd("plastic", (8, 4, 4, 8), n_samples=512,
                               seed=2)
    rng = np.random.default_rng(5)
    coords = jnp.asarray(rng.random((32, 4)), jnp.float32)
    interp = np.asarray(lut.lookup(coords))
    truth = np.asarray(mc_albedo_at("plastic", coords, n_samples=2048,
                                    seed=11))
    err = np.abs(interp - truth)
    # Kd/Ks axes are exactly linear, so a 4-wide axis suffices there;
    # the 0.06 budget = 0.05 threshold + MC noise at these sample counts.
    assert err.max() < 0.06, (err.max(), err.mean())


def test_hair_family_table_monotone_in_absorption():
    """Hair albedo falls as sigma_a rises, at every (wo, beta) cell."""
    from statmc_tpu.render.albedo_lut import precompute_family_nd

    lut = precompute_family_nd("hair", (3, 4, 2, 2), n_samples=256)
    v = np.asarray(lut.data).reshape(3, 4, 2, 2)
    assert (np.diff(v, axis=1) < 0.02).all()  # monotone up to MC noise


def test_hair_material_curves_nonzero():
    """ADVICE r3 regression: hair rows must route through the Marschner
    model in the reduced curves (hair.cpp:171 hairAlbedoLUT analogue) --
    a dark-brown fiber's G-buffer albedo is small but clearly nonzero,
    and a low-absorption fiber reflects more."""
    import tempfile
    from statmc_tpu.scene.api import parse_scene
    from statmc_tpu.scene.build import build_scene

    scene = (
        'Integrator "statpath" "integer iterations" [1]\n'
        'Film "image" "integer xresolution" [4] "integer yresolution" [4] '
        '"string filename" ["t.pfm"]\n'
        'Camera "perspective" "float fov" [60]\nWorldBegin\n'
        'Material "hair" "rgb sigma_a" [0.06 0.10 0.15]\n'
        'Shape "sphere" "float radius" [1]\n'
        'Material "hair" "rgb sigma_a" [3.0 4.0 5.0]\n'
        'Shape "sphere" "float radius" [2]\n'
        'WorldEnd\n'
    )
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(scene)
    sc = build_scene(parse_scene(p)).to_device()
    lut_d, lut_rest = precompute_material_curves(sc, n_cos=8, n_samples=256)
    light = np.asarray(lut_rest[0])   # low absorption
    dark = np.asarray(lut_rest[1])    # high absorption
    assert (light >= 0).all() and (light <= 1.2).all()
    assert float(light[-1].mean()) > 0.2     # clearly nonzero
    assert float(light[-1].mean()) > float(dark[-1].mean()) + 0.05
    # Query path: hair ignores kd (lut_d zeroed), albedo = lut_rest.
    alb = albedo_from_curves(
        lut_d, lut_rest, jnp.asarray([0], jnp.int32),
        jnp.asarray([[0.5, 0.5, 0.5]]), jnp.asarray([0.9]),
    )
    assert float(np.asarray(alb).mean()) > 0.1
