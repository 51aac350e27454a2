"""Native C++ BVH builder vs numpy builder vs dense intersection."""
import numpy as np
import jax.numpy as jnp
import pytest

from statmc_tpu.accel.bvh import build_bvh
from statmc_tpu.accel.traverse import intersect_bvh
from statmc_tpu.core import math as cm
from statmc_tpu.native import build_bvh_native, get_library
from statmc_tpu.render.intersect import ray_triangles


@pytest.mark.skipif(get_library() is None, reason="no native toolchain")
def test_native_bvh_matches_dense():
    rng = np.random.default_rng(11)
    n = 500
    p0 = rng.random((n, 3)).astype(np.float32) * 10 - 5
    e1 = (rng.random((n, 3)).astype(np.float32) - 0.5)
    e2 = (rng.random((n, 3)).astype(np.float32) - 0.5)
    bvh = build_bvh(p0, e1, e2, use_native=True).to_device()

    R = 256
    o = (rng.random((R, 3)).astype(np.float32) * 16 - 8)
    d = rng.random((R, 3)).astype(np.float32) - 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_max = jnp.full((R,), cm.INF)

    tb, _, hitb = intersect_bvh(
        bvh, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), o, d, t_max
    )
    t, _, _, hit = ray_triangles(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2), t_max
    )
    t = jnp.where(hit, t, cm.INF)
    np.testing.assert_array_equal(
        np.asarray(hitb), np.asarray(jnp.any(hit, axis=-1))
    )
    mask = np.asarray(hitb)
    np.testing.assert_allclose(
        np.asarray(tb)[mask], np.asarray(jnp.min(t, axis=-1))[mask],
        rtol=1e-5,
    )


@pytest.mark.skipif(get_library() is None, reason="no native toolchain")
def test_native_flatten_invariants():
    rng = np.random.default_rng(12)
    n = 200
    p0 = rng.random((n, 3)).astype(np.float32)
    e1 = rng.random((n, 3)).astype(np.float32) * 0.1
    e2 = rng.random((n, 3)).astype(np.float32) * 0.1
    lo, hi, miss, leaf, slots = build_bvh_native(p0, e1, e2, 4)
    # Every triangle appears exactly once in the slots.
    ids = slots[slots >= 0]
    assert sorted(ids.tolist()) == list(range(n))
    # Miss links point forward (DFS order) or -1.
    for i, m in enumerate(miss):
        assert m == -1 or m > i
    # Leaf slot offsets are multiples of LEAF_SIZE.
    assert all(off % 4 == 0 for off in leaf[leaf >= 0])
