"""Spatial light distribution (render/lightdistrib.py vs
src/core/lightdistrib.cpp:SpatialLightDistribution).

The reference estimates each voxel's per-light importance by Monte
Carlo over Halton points (ComputeDistribution, lightdistrib.cpp:235+);
the tests check the structural properties that estimator guarantees and
the variance win it exists to provide.
"""
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from statmc_tpu.driver import load, prepare
from statmc_tpu.scene.api import parse_scene
from statmc_tpu.render.lightdistrib import (
    make_distribution, sample_light_id, _radical_inverse,
)


def _corridor_scene(strategy: str, n_lights: int = 8) -> str:
    """A long corridor: floor along +x with one light per segment.
    Near each floor segment exactly one light dominates, so a spatial
    pmf concentrates where power stays uniform."""
    lights = "\n".join(
        f'LightSource "point" "rgb I" [8 8 8] "point from" [{2.0 * k + 1.0} 0.9 0]'
        for k in range(n_lights)
    )
    L = 2.0 * n_lights
    return f"""
Integrator "statpath" "integer maxdepth" [2] "integer iterations" [1]
  "bool calcstats" ["false"] "float rrthreshold" [0]
  "string lightsamplestrategy" ["{strategy}"]
Sampler "random" "integer pixelsamples" [4]
Film "image" "integer xresolution" [16] "integer yresolution" [8] "string filename" ["c.pfm"]
LookAt {L / 2} 6 0   {L / 2} 0 0   1 0 0
Camera "perspective" "float fov" [70]
WorldBegin
{lights}
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" [0 0 -1  {L} 0 -1  {L} 0 1  0 0 1]
WorldEnd
"""


def test_radical_inverse_matches_known_values():
    # RadicalInverse(2, i) = bit-reversed fractions; base 3 by hand.
    ri2 = _radical_inverse(2, 8)
    np.testing.assert_allclose(
        ri2, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-7)
    ri3 = _radical_inverse(3, 4)
    np.testing.assert_allclose(ri3, [0, 1 / 3, 2 / 3, 1 / 9], atol=1e-7)


def _setup(strategy):
    text = _corridor_scene(strategy)
    tmp = tempfile.mkdtemp()
    p = tmp + "/c.pbrt"
    with open(p, "w") as f:
        f.write(text)
    return p


def test_spatial_pmf_localizes():
    """Voxels near light k must give light k most of the probability
    mass, while the power pmf stays uniform (equal-intensity lights)."""
    path = _setup("spatial")
    setup = prepare(parse_scene(path))
    dist = setup.dist
    assert dist.grid_res is not None
    # Query at a point right under light 0 and under light 7.
    p = jnp.asarray([[1.0, 0.5, 0.0], [15.0, 0.5, 0.0]])
    u = jnp.asarray([0.0, 0.0])
    ids, pmf = sample_light_id(dist, u, p)
    # u=0 selects the first light of each voxel's cdf; its pmf must be
    # strongly concentrated (near light 0 the pmf of light 0 dominates).
    v_pmf = np.asarray(dist.pmf)
    # pmf row for the voxel containing x=1 (light 0's segment)
    assert float(pmf[0]) > 0.3  # vs 1/8 = 0.125 for power/uniform
    # every light keeps nonzero probability everywhere (the 0.001*avg
    # floor, lightdistrib.cpp:283-292)
    assert v_pmf.min() > 0.0


def test_spatial_beats_power_variance():
    """Equal-spp film variance across seeds: the corridor's spatial
    distribution must beat power (the verdict's acceptance test).
    Variance is estimated across independent base seeds."""
    seeds = [0, 1, 2, 3, 4]
    films = {}
    for strategy in ("spatial", "power"):
        path = _setup(strategy)
        acc = []
        for s in seeds:
            r = load(path, base_seed=s)
            r.render(iterations=1, verbose=False)
            acc.append(np.asarray(r.film_mean))
        films[strategy] = np.stack(acc)
    var_s = films["spatial"].var(axis=0).mean()
    var_p = films["power"].var(axis=0).mean()
    assert var_s < var_p, (var_s, var_p)
    # and the means agree (both unbiased)
    np.testing.assert_allclose(
        films["spatial"].mean(0).mean(), films["power"].mean(0).mean(),
        rtol=0.15)
