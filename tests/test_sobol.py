"""True Sobol' sampler (core/sobol.py vs src/core/sobolmatrices.cpp +
lowdiscrepancy.h:SobolSampleBits)."""
import numpy as np
import jax.numpy as jnp

from statmc_tpu.core import rng as crng
from statmc_tpu.core import sobol as sbl


def test_first_two_dims_match_02_pair():
    """Dimension 0 must be van der Corput and dimension 1 the classic
    x+1 recurrence -- bit-for-bit the (0,2) pair pbrt's zerotwosequence
    uses (lowdiscrepancy.h:VanDerCorput/Sobol2D)."""
    n = jnp.arange(256, dtype=jnp.uint32)
    v0 = crng._vdc_bits(n)
    v1 = crng._sobol2_bits(n)
    s0 = sbl.sobol_bits(jnp.zeros(256, jnp.int32), n)
    s1 = sbl.sobol_bits(jnp.ones(256, jnp.int32), n)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(v1))


def test_every_dim_is_a_01_sequence():
    """Each dimension must be a base-2 (0,1)-sequence: every 2^k-sample
    prefix block places exactly one point in each dyadic interval of
    width 2^-k (the defining property the generator-matrix construction
    guarantees when the matrices are nonsingular upper-triangular)."""
    N = 256
    n = jnp.arange(N, dtype=jnp.uint32)
    for d in range(0, 24):
        u = np.asarray(sbl.sobol_1d(jnp.full(N, d, jnp.int32), n))
        assert ((0 <= u) & (u < 1)).all()
        for k in (2, 4, 16, 64, 256):
            for blk in range(N // k):
                cells = np.floor(u[blk * k:(blk + 1) * k] * k).astype(int)
                assert len(set(cells.tolist())) == k, (d, k, blk)


def test_scramble_changes_values_not_stratification():
    N = 64
    n = jnp.arange(N, dtype=jnp.uint32)
    dim = jnp.full(N, 5, jnp.int32)
    u0 = np.asarray(sbl.sobol_1d(dim, n))
    us = np.asarray(sbl.sobol_1d(dim, n, jnp.full(N, 0xDEADBEEF,
                                                  jnp.uint32)))
    assert not np.allclose(u0, us)
    cells = np.floor(us * N).astype(int)  # XOR scrambling keeps the net
    assert len(set(cells.tolist())) == N


def test_mode_sobol_draw_sites_stratify():
    """draw_1d under MODE_SOBOL must stratify over the sample index at
    every (bounce, slot) site."""
    key = crng.base_key(7)
    pixel_ids = jnp.arange(4, dtype=jnp.int32)
    keys = crng.pixel_keys(key, pixel_ids, 0)
    scr = crng.pixel_scramble(key, pixel_ids)
    for bounce, slot in [(0, crng.SLOT_LIGHT_SELECT),
                         (3, crng.SLOT_RR)]:
        us = np.stack([
            np.asarray(crng.draw_1d(keys, (scr, s), crng.MODE_SOBOL,
                                    jnp.asarray(bounce), slot))
            for s in range(16)
        ])  # [S, P]
        for p in range(4):
            cells = np.floor(us[:, p] * 16).astype(int)
            assert len(set(cells.tolist())) == 16
        # distinct pixels get distinct scrambled sequences
        assert not np.allclose(us[:, 0], us[:, 1])


def test_sobol_sampler_renders():
    """End-to-end: Sampler \"sobol\" now routes through the true matrix
    sampler and renders a finite, lit film."""
    import tempfile

    from statmc_tpu.driver import load

    text = """
Integrator "statpath" "integer maxdepth" [3] "integer iterations" [1]
  "bool calcstats" ["false"] "float rrthreshold" [0]
Sampler "sobol" "integer pixelsamples" [4]
Film "image" "integer xresolution" [8] "integer yresolution" [8] "string filename" ["t.pfm"]
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
WorldBegin
  Material "matte" "rgb Kd" [0.5 0.5 0.5]
  Shape "sphere" "float radius" [1.0]
  LightSource "point" "rgb I" [3 3 3] "point from" [0 0 -2]
WorldEnd
"""
    tmp = tempfile.mkdtemp()
    p = tmp + "/s.pbrt"
    with open(p, "w") as f:
        f.write(text)
    r = load(p)
    assert r.s.icfg.sampler_mode == crng.MODE_SOBOL
    r.render(iterations=1, verbose=False)
    film = np.asarray(r.film_mean)
    assert np.isfinite(film).all() and film.mean() > 0
