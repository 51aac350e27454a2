"""Lockstep sampler: pbrt PCG32 stream replay (core/lockstep.py).

Checks (a) the numpy PCG32 against the independently-written JAX
limb-arithmetic PCG32 (core/pcg32.py, itself tested bit-exact against
pbrt's constants in test_pcg32.py), (b) the tile/pixel/sample table
layout, (c) an end-to-end render in "lockstep" sampler mode.
Reference anchors: src/core/rng.h:61-63,130-145;
src/samplers/random.cpp:52,68,86-87; src/statistics/statpath.cpp:132-184.
"""
import numpy as np
import pytest

from statmc_tpu.core import lockstep as LS


def _pbrt_stream(seq: int, n: int) -> np.ndarray:
    """n UniformFloats from a fresh SetSequence(seq) via core/pcg32.py."""
    import jax.numpy as jnp

    from statmc_tpu.core import pcg32

    s = pcg32.set_sequence(
        jnp.uint32(seq >> 32), jnp.uint32(seq & 0xFFFFFFFF))
    out = []
    for _ in range(n):
        v, s = pcg32.uniform_float(s)
        out.append(float(v))
    return np.asarray(out, np.float32)


def test_numpy_pcg32_matches_jax_pcg32():
    for seed in (1, 2, 7, 12345, (3 + 1) * (11 + 1)):
        state, inc = LS._set_sequence(np.asarray([seed], np.uint64))
        vals = []
        for _ in range(16):
            v, state = LS._uniform_float(state, inc)
            vals.append(float(v[0]))
        np.testing.assert_array_equal(
            np.asarray(vals, np.float32), _pbrt_stream(seed, 16))


def test_table_layout_tile_serial_order():
    w, h, spp, n_steps, seed = 40, 20, 2, 3, 5
    D = LS.dims_per_sample(n_steps)
    tab = LS.make_table(w, h, spp, n_steps, seed)
    assert tab.shape == (w * h, spp, D)

    # Tile (0,0): stream seeded (seed+1)*(0+1); pixel (0,0) is its first
    # pixel, so sample 0 occupies stream positions [0, D).
    st = _pbrt_stream((seed + 1) * 1, 3 * D)
    np.testing.assert_array_equal(tab[0, 0], st[:D])
    np.testing.assert_array_equal(tab[0, 1], st[D:2 * D])
    # Pixel (1,0) follows pixel (0,0)'s spp samples in the same stream.
    np.testing.assert_array_equal(tab[1, 0], st[2 * D:3 * D])

    # Tile (1,0) covers x in [16,32): its stream is seeded with
    # tileIndex=1 and its first pixel is (16, 0).
    st1 = _pbrt_stream((seed + 1) * 2, D)
    np.testing.assert_array_equal(tab[16, 0], st1)

    # Edge tile (2,0) covers x in [32,40) (cropped width 8): its second
    # row pixel (32,1) sits at in-tile index 8, not 16.
    st2 = _pbrt_stream((seed + 1) * 3, (8 * spp + 1) * D)
    np.testing.assert_array_equal(tab[32 + w, 0], st2[8 * spp * D:
                                                      (8 * spp + 1) * D])


def _tiny_lockstep_scene(tmp_path):
    from statmc_tpu.testscenes import scene_text

    text = scene_text(width=16, height=8, spp=2, iterations=1, maxdepth=3,
                      denoise=False, filterradius=2)
    text = text.replace('Sampler "random"', 'Sampler "lockstep"')
    path = str(tmp_path / "lockstep.pbrt")
    with open(path, "w") as f:
        f.write(text)
    return path


def test_lockstep_render_end_to_end(tmp_path):
    from statmc_tpu.driver import load

    path = _tiny_lockstep_scene(tmp_path)
    r = load(path, base_seed=0)
    r.render(iterations=1, verbose=False)
    film = np.asarray(r.film_mean)
    assert np.isfinite(film).all()

    # Deterministic: same seed -> identical film.
    r2 = load(path, base_seed=0)
    r2.render(iterations=1, verbose=False)
    np.testing.assert_array_equal(film, np.asarray(r2.film_mean))

    # Different base seed -> different stream -> different film.
    r3 = load(path, base_seed=9)
    r3.render(iterations=1, verbose=False)
    assert not np.allclose(film, np.asarray(r3.film_mean))


def test_camera_jitter_comes_from_table():
    """The film jitter of pixel p, sample s must be exactly
    table[p, s, 0:2] — the reference's GetCameraSample film 2D."""
    from statmc_tpu.core import rng as crng
    import jax.numpy as jnp

    tab = LS.make_table(16, 8, 2, 4, 0)
    ld = (jnp.asarray(tab), jnp.asarray(1, jnp.int32))
    keys = jnp.zeros((16 * 8, 2), jnp.uint32)
    u = crng.draw_2d(keys, ld, crng.MODE_LOCKSTEP, 0, crng.SLOT_CAMERA)
    np.testing.assert_array_equal(np.asarray(u), tab[:, 1, 0:2])
