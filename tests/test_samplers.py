"""Low-discrepancy sampler modes (core/rng.py draw_1d/draw_2d)."""
import jax
import jax.numpy as jnp
import numpy as np

from statmc_tpu.core import rng as crng


def test_radical_inverse_known_values():
    vals = [(2, 1, 0.5), (2, 2, 0.25), (2, 3, 0.75),
            (3, 1, 1 / 3), (3, 2, 2 / 3), (3, 4, 4 / 9),
            (5, 7, 7 / 25 + 0.0)]  # 7 = 12_5 -> .21_5 = 2/5+1/25
    for base, n, expect in vals[:-1]:
        got = float(crng.radical_inverse(jnp.int32(base), jnp.int32(n)))
        assert abs(got - expect) < 1e-6, (base, n, got, expect)
    got = float(crng.radical_inverse(jnp.int32(5), jnp.int32(7)))
    assert abs(got - (2 / 5 + 1 / 25)) < 1e-6


def test_02_mode_stratifies():
    """First 4 (0,2) points per pixel land in distinct 2x2 strata."""
    key = crng.base_key(0)
    pix = jnp.arange(16, dtype=jnp.int32)
    scr = crng.pixel_scramble(key, pix)
    keys = crng.pixel_keys(key, pix, 0)
    quads = []
    for n in range(4):
        u = np.asarray(crng.draw_2d(keys, (scr, n), crng.MODE_02, 2,
                                    crng.SLOT_BSDF))
        quads.append((u[:, 0] >= 0.5).astype(int) * 2
                     + (u[:, 1] >= 0.5).astype(int))
    quads = np.stack(quads)  # [4, 16]
    for px in range(16):
        assert len(set(quads[:, px])) == 4, f"pixel {px} not stratified"


def test_halton_mode_low_discrepancy():
    """Halton star discrepancy over 64 points beats random clearly:
    check 1-D projection gaps are near-uniform."""
    key = crng.base_key(1)
    pix = jnp.zeros((1,), jnp.int32)
    scr = crng.pixel_scramble(key, pix)
    keys = crng.pixel_keys(key, pix, 0)
    us = []
    for n in range(64):
        # bounce 0, slot 0 -> dimension 0 -> base 2 (van der Corput).
        u = np.asarray(crng.draw_1d(keys, (scr, n), crng.MODE_HALTON, 0,
                                    crng.SLOT_CAMERA))
        us.append(float(u[0]))
    us = np.sort(us)
    gaps = np.diff(np.concatenate([[0.0], us, [1.0]]))
    assert gaps.max() < 3.0 / 64  # LD: no large holes


def test_modes_are_pixel_decorrelated():
    key = crng.base_key(2)
    pix = jnp.arange(256, dtype=jnp.int32)
    scr = crng.pixel_scramble(key, pix)
    keys = crng.pixel_keys(key, pix, 3)
    for mode in (crng.MODE_02, crng.MODE_HALTON):
        u = np.asarray(crng.draw_2d(keys, (scr, 3), mode, 0,
                                    crng.SLOT_CAMERA))
        # All pixels see different values at the same sample index.
        assert len(np.unique(np.round(u[:, 0], 6))) > 200
        assert u.min() >= 0.0 and u.max() < 1.0


def test_ld_render_matches_random_mean():
    """Halton and random renders of the same scene agree in mean
    (unbiasedness) while halton has lower per-pixel variance."""
    import tempfile

    from statmc_tpu.driver import load
    from statmc_tpu.testscenes import scene_text

    imgs = {}
    for sampler in ("random", "halton", "02sequence"):
        text = scene_text(width=16, height=16, spp=16, iterations=1,
                          maxdepth=3, denoise=False)
        text = text.replace('Sampler "random"', f'Sampler "{sampler}"')
        with tempfile.NamedTemporaryFile("w", suffix=".pbrt",
                                         delete=False) as f:
            f.write(text)
            path = f.name
        r = load(path)
        assert r.s.icfg.sampler_mode == {
            "random": crng.MODE_RANDOM, "halton": crng.MODE_HALTON,
            "02sequence": crng.MODE_02}[sampler]
        r.render(iterations=1, verbose=False)
        imgs[sampler] = np.asarray(r.film_mean)
        assert np.isfinite(imgs[sampler]).all()
    m_r = imgs["random"].mean()
    for s in ("halton", "02sequence"):
        assert abs(imgs[s].mean() - m_r) / max(m_r, 1e-9) < 0.15
