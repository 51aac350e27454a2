"""Pallas filter kernel vs XLA reference + VJP finite-difference checks.

Runs in Pallas interpreter mode on the CPU test backend; the same kernel
compiles natively on TPU (exercised by bench.py / the driver).
"""
import numpy as np
import jax
import jax.numpy as jnp

from statmc_tpu.denoise.filter_jax import stat_filter, corrected_stats
from statmc_tpu.denoise.filter_pallas import _run_filter, filter_apply
from statmc_tpu.denoise.ttest import quantile_table


def _fields(seed=0, H=24, W=40, C=3, N=16):
    rng = np.random.default_rng(seed)
    xs = rng.gamma(4.0, 0.25, size=(N, H, W, C)).astype(np.float32)
    ys = 2.0 * (np.sqrt(xs) - 1.0)
    n = np.full((H, W), N, np.float32)
    mean = ys.mean(0)
    d = ys - mean
    m2 = (d**2).sum(0)
    m3 = (d**3).sum(0)
    fm = xs.mean(0)
    gb = rng.random((H, W, 3)).astype(np.float32)
    return n, mean, m2, m3, fm, gb


def test_pallas_matches_xla_reference():
    n, mean, m2, m3, fm, gb = _fields()
    H, W, C = mean.shape
    radius, sd = 3, 2.0
    tq = jnp.asarray(quantile_table(0.005))
    ref = stat_filter(
        jnp.asarray(n), jnp.asarray(mean), jnp.asarray(m2),
        jnp.asarray(m3), jnp.asarray(fm), jnp.asarray(gb)[None],
        jnp.asarray([-0.5 / 0.1**2]), jnp.asarray(-0.5 / sd**2), tq, radius,
    )
    mc, disc = corrected_stats(
        jnp.asarray(n), jnp.asarray(mean), jnp.asarray(m2),
        jnp.asarray(m3), tq,
    )
    out, wsum = _run_filter(
        mc, disc * disc, jnp.asarray(fm), jnp.asarray(gb),
        jnp.ones((H, W)), radius, -0.5 / sd**2,
        tuple([-0.5 / 0.1**2] * 3), th=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref["film_mean_f"]), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(mc), np.asarray(ref["mean_corr"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(disc), np.asarray(ref["discriminator"]), rtol=1e-5
    )
    # Self weight always present; the kernel's quadratic range-term
    # expansion leaves an O(1e-6) fp residual in the zero-offset
    # exponent, so exactly 1.0 is not guaranteed.
    assert float(jnp.min(wsum)) >= 1.0 - 1e-5


def test_vjp_matches_finite_difference():
    n, mean, m2, m3, fm, gb = _fields(seed=1, H=16, W=16, N=32)
    H, W, C = mean.shape
    radius, sd = 2, 1.5
    tq = jnp.asarray(quantile_table(0.005))
    mc, disc = corrected_stats(
        jnp.asarray(n), jnp.asarray(mean), jnp.asarray(m2),
        jnp.asarray(m3), tq,
    )
    args = (mc, disc * disc, jnp.asarray(gb), jnp.ones((H, W)),
            radius, -0.5 / sd**2, tuple([-0.5 / 0.1**2] * 3), True)

    # Weighted loss so the gradient isn't spatially uniform.
    wloss = jnp.asarray(
        np.random.default_rng(2).random((H, W, 1)).astype(np.float32)
    )

    def loss(fmx):
        return jnp.sum(wloss * filter_apply(fmx, *args))

    g = jax.grad(loss)(jnp.asarray(fm))
    eps = 1e-2
    rng = np.random.default_rng(3)
    for _ in range(4):
        i, j, c = rng.integers(0, H), rng.integers(0, W), rng.integers(0, C)
        fm2 = fm.copy()
        fm2[i, j, c] += eps
        fd = (float(loss(jnp.asarray(fm2))) - float(loss(jnp.asarray(fm)))) / eps
        assert abs(float(g[i, j, c]) - fd) < 5e-3 + 0.05 * abs(fd), (
            f"grad mismatch at {(i, j, c)}: {float(g[i, j, c])} vs {fd}"
        )


def test_range_bf16_quality():
    """The bf16 range-term fast path (production default on TPU) must
    stay within a small perturbation of the exact f32 sweep: mean
    relative error well under the MC noise the filter removes."""
    import numpy as np
    from statmc_tpu.denoise.filter_pallas import _run_filter

    rng = np.random.default_rng(5)
    H, W, C, G, R = 24, 40, 3, 6, 4
    mk = lambda c: jnp.asarray(rng.random((H, W, c), np.float32))
    mc, d2, fm, gb = mk(C), mk(C) * 0.01, mk(C), mk(G)
    valid = jnp.ones((H, W))
    gf = tuple([-0.5 / 0.1**2] * G)
    f32, _ = _run_filter(mc, d2, fm, gb, valid, R, -0.005, gf, th=8,
                         interpret=True)
    b16, _ = _run_filter(mc, d2, fm, gb, valid, R, -0.005, gf, th=8,
                         interpret=True, range_bf16=True)
    rel = np.abs(np.asarray(b16) - np.asarray(f32)) / (
        np.abs(np.asarray(f32)) + 1e-6)
    assert rel.mean() < 2e-3, rel.mean()
    assert np.isfinite(np.asarray(b16)).all()
