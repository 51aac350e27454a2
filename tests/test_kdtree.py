"""kd-tree accelerator (accel/kdtree.py): build + kd-restart parity.

The reference offers no kd-tree unit tests; parity here is against the
dense all-pairs intersector over identical triangle soup, which the
BVH-family accelerators are pinned to the same way (test_bvh.py
pattern)."""
import jax.numpy as jnp
import numpy as np
import pytest

from statmc_tpu.accel import kdtree as K


def _soup(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (n, 3)).astype(np.float32)
    return p0, e1, e2


def _rays(m, seed=1, spread=4.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2 * spread, 2 * spread, (m, 3)).astype(np.float32)
    d = rng.normal(0, 1, (m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _dense_ref(p0, e1, e2, o, d, t_max):
    """Brute-force closest hit (same Moller-Trumbore epsilon rules)."""
    oo = np.asarray(o)[:, None, :]
    dd = np.asarray(d)[:, None, :]
    pvec = np.cross(dd, e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = oo - p0[None]
    u = np.sum(tvec * pvec, -1) * inv_det
    qvec = np.cross(tvec, e1[None])
    v = np.sum(dd * qvec, -1) * inv_det
    t = np.sum(e2[None] * qvec, -1) * inv_det
    tm = np.asarray(t_max)[:, None]
    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > 1e-4) & (t < tm))
    t = np.where(ok, t, np.inf)
    j = np.argmin(t, -1)
    tj = t[np.arange(len(t)), j]
    hit = np.isfinite(tj)
    return np.where(hit, tj, np.asarray(t_max)), \
        np.where(hit, j, -1), hit


def test_build_shapes_and_depth():
    p0, e1, e2 = _soup(200)
    kd = K.build_kdtree(p0, e1, e2)
    ni = np.asarray(kd.node_i)
    assert kd.n_nodes == ni.shape[0] > 1
    leaves = ni[:, 0] == 3
    assert leaves.any()
    # Every interior node's above-child link is a valid node id.
    interior = ~leaves
    assert (ni[interior, 1] > 0).all()
    assert (ni[interior, 1] < kd.n_nodes).all()
    # Leaf prim lists cover every triangle at least once.
    covered = np.unique(np.asarray(kd.leaf_prims))
    covered = covered[covered >= 0]
    assert len(covered) == 200


@pytest.mark.parametrize("n,seed", [(40, 0), (300, 2), (1500, 3)])
def test_closest_hit_matches_dense(n, seed):
    p0, e1, e2 = _soup(n, seed)
    kd = K.build_kdtree(p0, e1, e2)
    o, d = _rays(512, seed + 10)
    t_max = jnp.full((512,), 1e9)
    t, idx, hit = K.intersect_kdtree(kd, o, d, t_max)
    t_ref, idx_ref, hit_ref = _dense_ref(p0, e1, e2, o, d, t_max)
    assert (np.asarray(hit) == hit_ref).all()
    np.testing.assert_allclose(np.asarray(t)[hit_ref], t_ref[hit_ref],
                               rtol=2e-4)
    # Same triangle except exact-tie pairs (equal t within tolerance).
    mism = np.asarray(idx)[hit_ref] != idx_ref[hit_ref]
    if mism.any():
        tt = np.asarray(t)[hit_ref][mism]
        tr = t_ref[hit_ref][mism]
        np.testing.assert_allclose(tt, tr, rtol=2e-4)


def test_any_hit_occlusion_matches():
    p0, e1, e2 = _soup(300, 5)
    kd = K.build_kdtree(p0, e1, e2)
    o, d = _rays(512, 20)
    t_max = jnp.full((512,), 6.0)
    _, _, hit = K.intersect_kdtree(kd, o, d, t_max, any_hit=True)
    _, _, hit_ref = _dense_ref(p0, e1, e2, o, d, t_max)
    assert (np.asarray(hit) == hit_ref).all()


def test_axis_parallel_rays():
    """Degenerate directions (zero components) walk correctly."""
    p0, e1, e2 = _soup(120, 7)
    kd = K.build_kdtree(p0, e1, e2)
    m = 128
    rng = np.random.default_rng(9)
    o = rng.uniform(-8, 8, (m, 3)).astype(np.float32)
    d = np.zeros((m, 3), np.float32)
    d[np.arange(m), rng.integers(0, 3, m)] = np.where(
        rng.random(m) < 0.5, 1.0, -1.0)
    t_max = jnp.full((m,), 1e9)
    t, idx, hit = K.intersect_kdtree(kd, jnp.asarray(o), jnp.asarray(d),
                                     t_max)
    t_ref, _, hit_ref = _dense_ref(p0, e1, e2, o, d, t_max)
    assert (np.asarray(hit) == hit_ref).all()
    np.testing.assert_allclose(np.asarray(t)[hit_ref], t_ref[hit_ref],
                               rtol=2e-4)


def test_accelerator_directive_renders():
    """`Accelerator "kdtree"` selects the kd walk through the full
    driver; the film matches the default-accelerator render exactly
    (accelerators are result-invariant)."""
    import tempfile

    from statmc_tpu.driver import load

    base = (
        'Integrator "statpath" "integer maxdepth" [3] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [4]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "{ACCEL}"
        "WorldBegin\n"
        'Material "matte" "rgb Kd" [0.7 0.4 0.2]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]\n'
        "AttributeBegin\nTranslate 0 0.2 0\n"
        'Shape "sphere" "float radius" [0.8]\nAttributeEnd\n'
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [10 10 10]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-1 4 -1  1 4 -1  1 4 1  -1 4 1]\n'
        "AttributeEnd\nWorldEnd\n"
    )
    films = {}
    for name, accel in [("kd", 'Accelerator "kdtree"\n'), ("bvh", "")]:
        with tempfile.NamedTemporaryFile("w", suffix=".pbrt",
                                         delete=False) as f:
            f.write(base.replace("{ACCEL}", accel))
            path = f.name
        r = load(path)
        if name == "kd":
            assert type(r.s.bvh).__name__ == "KdTreeTris"
        r.render(iterations=1, verbose=False)
        films[name] = np.asarray(r.film_mean)
    assert np.isfinite(films["kd"]).all()
    np.testing.assert_allclose(films["kd"], films["bvh"], rtol=1e-4,
                               atol=1e-6)