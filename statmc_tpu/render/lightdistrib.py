"""Light sampling distributions.

The reference supports uniform/power/spatial strategies
(src/core/lightdistrib.cpp; statpath defaults to "spatial",
statpath.cpp:982).  Here:

* uniform / power: exact ports of the distribution math (power uses each
  light's total emitted power, lightdistrib.cpp:PowerLightDistribution).
* spatial: the reference's voxelized scene-adaptive distribution keys a
  hash table by voxel; our TPU equivalent precomputes a coarse voxel grid
  of power-times-unoccluded-heuristic weights on host.  Round 1 maps
  spatial -> power (noise-level difference only, zero bias); the grid
  variant is tracked in the roadmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import build as sb

Array = jax.Array


class LightDistribution(NamedTuple):
    cdf: Array  # [L]
    pmf: Array  # [L]


def _light_power(scene: sb.SceneTables) -> np.ndarray:
    kind = np.asarray(scene.light_kind)
    L = np.asarray(scene.light_L)
    area = np.asarray(scene.light_area)
    wr = float(scene.world_radius)
    lum = L @ np.array([0.212671, 0.715160, 0.072169], np.float32)
    power = np.zeros(kind.shape[0], np.float32)
    power[kind == sb.LIGHT_AREA_TRI] = (
        lum[kind == sb.LIGHT_AREA_TRI] * area[kind == sb.LIGHT_AREA_TRI] * np.pi
    )
    power[kind == sb.LIGHT_AREA_SPH] = (
        lum[kind == sb.LIGHT_AREA_SPH] * area[kind == sb.LIGHT_AREA_SPH] * np.pi
    )
    power[kind == sb.LIGHT_POINT] = 4.0 * np.pi * lum[kind == sb.LIGHT_POINT]
    power[kind == sb.LIGHT_SPOT] = (
        2.0 * np.pi * lum[kind == sb.LIGHT_SPOT]
    )
    power[kind == sb.LIGHT_DISTANT] = (
        np.pi * wr * wr * lum[kind == sb.LIGHT_DISTANT]
    )
    power[kind == sb.LIGHT_INFINITE] = (
        np.pi * wr * wr * lum[kind == sb.LIGHT_INFINITE]
    )
    return power


def make_distribution(scene: sb.SceneTables, strategy: str = "power"
                      ) -> LightDistribution:
    nl = int(np.asarray(scene.light_kind).shape[0])
    if nl == 0:
        return LightDistribution(
            cdf=jnp.ones((1,)), pmf=jnp.ones((1,))
        )
    if strategy == "uniform":
        pmf = np.full(nl, 1.0 / nl, np.float32)
    else:  # power, spatial->power
        p = _light_power(scene)
        tot = p.sum()
        pmf = (p / tot if tot > 0 else np.full(nl, 1.0 / nl)).astype(np.float32)
    cdf = np.cumsum(pmf).astype(np.float32)
    cdf[-1] = 1.0
    return LightDistribution(cdf=jnp.asarray(cdf), pmf=jnp.asarray(pmf))


def sample_light_id(dist: LightDistribution, u: Array) -> tuple[Array, Array]:
    """Draw a light id per lane: (id [R], pmf [R])."""
    idx = jnp.searchsorted(dist.cdf, u, side="right")
    idx = jnp.minimum(idx, dist.cdf.shape[0] - 1).astype(jnp.int32)
    return idx, dist.pmf[idx]
