"""Packed-table traversal (one-hot and take modes) vs dense ground truth."""
import numpy as np
import jax.numpy as jnp

from statmc_tpu.accel.bvh import build_bvh
from statmc_tpu.accel import onehot as OH
from statmc_tpu.core import math as cm
from statmc_tpu.render.intersect import ray_triangles


def _scene_tris(n=700, seed=3):
    rng = np.random.default_rng(seed)
    p0 = rng.random((n, 3)).astype(np.float32) * 10 - 5
    e1 = (rng.random((n, 3)).astype(np.float32) - 0.5)
    e2 = (rng.random((n, 3)).astype(np.float32) - 0.5)
    return p0, e1, e2


def _rays(R=512, seed=4):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.random((R, 3)).astype(np.float32) * 16 - 8)
    d = cm.normalize(jnp.asarray(rng.random((R, 3)).astype(np.float32) - 0.5))
    return o, d


def _dense_truth(p0, e1, e2, o, d):
    t_max = jnp.full(o.shape[:1], cm.INF)
    t, _, _, hit = ray_triangles(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), t_max
    )
    t = jnp.where(hit, t, cm.INF)
    return np.asarray(jnp.min(t, -1)), np.asarray(jnp.any(hit, -1))


def _check(bvh, p0, e1, e2):
    o, d = _rays()
    t_max = jnp.full(o.shape[:1], cm.INF)
    tb, idb, hb = OH.intersect_onehot(bvh, o, d, t_max)
    t_true, hit_true = _dense_truth(p0, e1, e2, o, d)
    np.testing.assert_array_equal(np.asarray(hb), hit_true)
    np.testing.assert_allclose(
        np.asarray(tb)[hit_true], t_true[hit_true], rtol=1e-5
    )
    # any-hit agrees on the hit set
    _, _, ha = OH.intersect_onehot(bvh, o, d, t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(ha), hit_true)


def test_onehot_mode_matches_dense():
    p0, e1, e2 = _scene_tris()
    for leaf in (4, 8, 16):
        flat = build_bvh(p0, e1, e2, leaf_size=leaf)
        bvh = OH.OneHotBVH.from_flat(flat, p0, e1, e2, leaf_size=leaf)
        assert bvh.n_nodes <= OH.ONEHOT_MAX_NODES  # one-hot fetch mode
        _check(bvh, p0, e1, e2)


def test_take_mode_matches_dense(monkeypatch):
    """Force the contiguous-row gather fetch (large-scene path)."""
    monkeypatch.setattr(OH, "ONEHOT_MAX_NODES", 1)
    p0, e1, e2 = _scene_tris(seed=5)
    flat = build_bvh(p0, e1, e2, leaf_size=8)
    bvh = OH.OneHotBVH.from_flat(flat, p0, e1, e2, leaf_size=8)
    _check(bvh, p0, e1, e2)


def test_ray_chunked_traversal(monkeypatch):
    """Rays beyond _RAY_CHUNK take the lax.map path."""
    monkeypatch.setattr(OH, "_RAY_CHUNK", 128)
    p0, e1, e2 = _scene_tris(seed=6, n=200)
    flat = build_bvh(p0, e1, e2, leaf_size=8)
    bvh = OH.OneHotBVH.from_flat(flat, p0, e1, e2, leaf_size=8)
    _check(bvh, p0, e1, e2)
