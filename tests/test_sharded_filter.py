"""Row-sharded halo-exchange filter == unsharded filter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from statmc_tpu.denoise.filter_jax import stat_filter
from statmc_tpu.denoise.ttest import quantile_table


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_sharded_filter_matches_unsharded():
    from statmc_tpu.parallel.shard import make_mesh, make_sharded_filter

    H, W, C, G = 32, 16, 3, 1
    radius, sd = 3, 2.0
    rng = np.random.default_rng(0)
    xs = rng.gamma(4.0, 0.25, size=(16, H, W, C)).astype(np.float32)
    ys = 2.0 * (np.sqrt(xs) - 1.0)
    n = np.full((H, W), 16, np.float32)
    mean = ys.mean(0)
    d = ys - mean
    m2 = (d**2).sum(0)
    m3 = (d**3).sum(0)
    fm = xs.mean(0)
    gb = rng.random((G, H, W, 3)).astype(np.float32)
    film = rng.random((H, W, 3)).astype(np.float32)
    tq = jnp.asarray(quantile_table(0.005))

    ref = stat_filter(
        jnp.asarray(n), jnp.asarray(mean), jnp.asarray(m2),
        jnp.asarray(m3), jnp.asarray(fm), jnp.asarray(gb),
        jnp.asarray([-0.5 / 0.1**2]), jnp.asarray(-0.5 / sd**2), tq,
        radius, film_img=jnp.asarray(film),
    )

    mesh = make_mesh(1, 4)
    fn = make_sharded_filter(
        mesh, H, W, C, G, radius, -0.5 / sd**2, [-0.5 / 0.1**2]
    )
    mc, disc, fmf, filmf = fn(
        jnp.asarray(n), jnp.asarray(mean), jnp.asarray(m2),
        jnp.asarray(m3), jnp.asarray(fm), jnp.asarray(gb),
        jnp.asarray(film),
    )
    np.testing.assert_allclose(
        np.asarray(fmf), np.asarray(ref["film_mean_f"]), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(filmf), np.asarray(ref["film_f"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mc), np.asarray(ref["mean_corr"]), rtol=1e-5
    )
