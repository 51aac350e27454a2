"""Core math / spectrum / RNG / PFM tests."""
import numpy as np
import jax
import jax.numpy as jnp

from statmc_tpu.core import math as cm
from statmc_tpu.core import rng as crng
from statmc_tpu.core import spectrum as spec
from statmc_tpu.io import pfm


def test_normalize_and_basis():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = cm.normalize(v)
    np.testing.assert_allclose(cm.length(n), [1.0, 1.0], rtol=1e-6)
    t, b = cm.coordinate_system(n)
    np.testing.assert_allclose(cm.dot(n, t), 0.0, atol=1e-6)
    np.testing.assert_allclose(cm.dot(n, b), 0.0, atol=1e-6)
    np.testing.assert_allclose(cm.length(t), 1.0, rtol=1e-6)


def test_lookat_perspective_roundtrip():
    c2w = cm.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
    p = cm.np_transform_point(c2w, np.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, -5], atol=1e-6)
    d = cm.np_transform_vector(c2w, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)


def test_transform_point_vs_numpy():
    m = cm.translate([1, 2, 3]) @ cm.rotate(30, [0, 1, 0]) @ cm.scale_mat(2.0)
    p = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    jp = cm.transform_point(jnp.asarray(m), jnp.asarray(p))
    npp = cm.np_transform_point(m, p)
    np.testing.assert_allclose(jp, npp, rtol=1e-5, atol=1e-6)


def test_luminance_weights():
    y = spec.luminance(jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(y, 1.0, rtol=1e-4)
    # XYZ->RGB of RGB->XYZ is near-identity.
    rgb = jnp.array([[0.2, 0.5, 0.8]])
    rt = spec.xyz_to_rgb(spec.rgb_to_xyz(rgb))
    np.testing.assert_allclose(rt, rgb, rtol=1e-3, atol=1e-4)


def test_rng_shard_invariance():
    """Values depend only on global pixel id, not how lanes are batched."""
    key = crng.base_key(42)
    ids = jnp.arange(16, dtype=jnp.int32)
    ks = crng.pixel_keys(key, ids, 3)
    full = crng.uniform_2d(ks, 2, crng.SLOT_BSDF)
    half = crng.uniform_2d(ks[8:], 2, crng.SLOT_BSDF)
    np.testing.assert_array_equal(np.asarray(full[8:]), np.asarray(half))
    # Distinct slots decorrelate.
    other = crng.uniform_2d(ks, 2, crng.SLOT_LIGHT_SAMPLE)
    assert not np.allclose(full, other)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    pfm.write_pfm(p, img)
    back = pfm.read_pfm(p)
    np.testing.assert_array_equal(back, img)
    gray = img[..., 0]
    pfm.write_pfm(p, gray)
    np.testing.assert_array_equal(pfm.read_pfm(p), gray)
