"""BVH build + traversal vs dense ground truth."""
import numpy as np
import jax.numpy as jnp

from statmc_tpu.accel.bvh import build_bvh
from statmc_tpu.accel.traverse import intersect_bvh
from statmc_tpu.core import math as cm
from statmc_tpu.render.intersect import ray_triangles


def _random_tris(n, rng):
    base = rng.random((n, 3)).astype(np.float32) * 10 - 5
    e1 = rng.random((n, 3)).astype(np.float32) - 0.5
    e2 = rng.random((n, 3)).astype(np.float32) - 0.5
    return base, e1, e2


def test_bvh_matches_dense():
    rng = np.random.default_rng(7)
    p0, e1, e2 = _random_tris(200, rng)
    bvh = build_bvh(p0, e1, e2).to_device()

    R = 256
    o = (rng.random((R, 3)).astype(np.float32) * 16 - 8)
    d = rng.random((R, 3)).astype(np.float32) - 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), cm.INF)

    tb, idb, hitb = intersect_bvh(
        bvh, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), o, d, t_max
    )

    t, _, _, hit = ray_triangles(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), t_max
    )
    t = jnp.where(hit, t, cm.INF)
    t_dense = jnp.min(t, axis=-1)
    hit_dense = jnp.any(hit, axis=-1)

    np.testing.assert_array_equal(np.asarray(hitb), np.asarray(hit_dense))
    np.testing.assert_allclose(
        np.asarray(tb)[np.asarray(hit_dense)],
        np.asarray(t_dense)[np.asarray(hit_dense)],
        rtol=1e-5,
    )


def test_bvh_any_hit():
    rng = np.random.default_rng(8)
    p0, e1, e2 = _random_tris(64, rng)
    bvh = build_bvh(p0, e1, e2).to_device()
    R = 128
    o = (rng.random((R, 3)).astype(np.float32) * 16 - 8)
    d = rng.random((R, 3)).astype(np.float32) - 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), cm.INF)
    _, _, found_any = intersect_bvh(
        bvh, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), o, d, t_max,
        any_hit=True,
    )
    t, _, _, hit = ray_triangles(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), t_max
    )
    np.testing.assert_array_equal(
        np.asarray(found_any), np.asarray(jnp.any(hit, axis=-1))
    )
