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
    cdf: Array  # [V, L] per-voxel (V=1 for uniform/power)
    pmf: Array  # [V, L]
    grid_res: Any  # (nx, ny, nz) or None
    world_lo: Any  # [3]
    world_inv_extent: Any  # [3]


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
    # Image-modulated point lights: 4pi I is the upper bound pbrt also
    # uses before image averaging (goniometric.cpp:Power ~ average).
    power[kind == sb.LIGHT_GONIO] = 4.0 * np.pi * lum[kind == sb.LIGHT_GONIO]
    power[kind == sb.LIGHT_PROJ] = 2.0 * np.pi * lum[kind == sb.LIGHT_PROJ]
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


# Spatial grid resolution per axis and the cap on table size: beyond the
# cap (many thousand emissive triangles) the voxel table would not fit,
# so spatial falls back to power -- noise-level change only.
SPATIAL_RES = 8
SPATIAL_MAX_LIGHTS = 2048


def _flat(pmf: np.ndarray) -> LightDistribution:
    cdf = np.cumsum(pmf, axis=-1).astype(np.float32)
    cdf[..., -1] = 1.0
    return LightDistribution(
        cdf=jnp.asarray(cdf[None] if cdf.ndim == 1 else cdf),
        pmf=jnp.asarray(pmf[None] if pmf.ndim == 1 else pmf),
        grid_res=None,
        world_lo=jnp.zeros((3,)),
        world_inv_extent=jnp.ones((3,)),
    )


def make_distribution(scene: sb.SceneTables, strategy: str = "power"
                      ) -> LightDistribution:
    nl = int(np.asarray(scene.light_kind).shape[0])
    if nl == 0:
        return _flat(np.ones((1,), np.float32))
    if strategy == "uniform":
        return _flat(np.full(nl, 1.0 / nl, np.float32))

    p = _light_power(scene)
    tot = p.sum()
    power_pmf = (
        p / tot if tot > 0 else np.full(nl, 1.0 / nl)
    ).astype(np.float32)

    if strategy != "spatial" or nl > SPATIAL_MAX_LIGHTS:
        return _flat(power_pmf)

    # Spatial (lightdistrib.cpp:SpatialLightDistribution, simplified):
    # per-voxel importance = estimated unoccluded contribution of each
    # light at the voxel center (power / distance^2, with the emitter
    # cosine folded in for area lights; clamped to avoid spikes), blended
    # with the power pmf for robustness.  The reference's lazy hashed
    # voxels become a dense precomputed [V, L] table.
    res = SPATIAL_RES
    kind = np.asarray(scene.light_kind)
    L = np.asarray(scene.light_L)
    area = np.asarray(scene.light_area)
    pos = np.asarray(scene.light_pos)
    prim = np.asarray(scene.light_prim)
    lum = L @ np.array([0.212671, 0.715160, 0.072169], np.float32)

    # Representative position per light.
    light_p = pos.copy()
    tri_mask = kind == sb.LIGHT_AREA_TRI
    if tri_mask.any() and np.asarray(scene.tri_p0).shape[0]:
        p0 = np.asarray(scene.tri_p0)
        e1 = np.asarray(scene.tri_e1)
        e2 = np.asarray(scene.tri_e2)
        t = prim[tri_mask]
        light_p[tri_mask] = p0[t] + (e1[t] + e2[t]) / 3.0
    sph_mask = kind == sb.LIGHT_AREA_SPH
    if sph_mask.any() and np.asarray(scene.sph_center).shape[0]:
        light_p[sph_mask] = np.asarray(scene.sph_center)[prim[sph_mask]]

    wc = np.asarray(scene.world_center)
    wr = float(scene.world_radius)
    lo = wc - wr
    extent = 2.0 * wr
    centers = (np.stack(np.meshgrid(
        *[(np.arange(res) + 0.5) / res] * 3, indexing="ij"
    ), axis=-1).reshape(-1, 3) * extent + lo)  # [V,3]

    d2 = ((centers[:, None, :] - light_p[None, :, :]) ** 2).sum(-1)  # [V,L]
    d2 = np.maximum(d2, (0.05 * wr) ** 2)
    est = lum[None, :] * np.maximum(area, 1e-3)[None, :] / d2
    # Delta/infinite lights: distance-independent importance where apt.
    inf_mask = (kind == sb.LIGHT_INFINITE) | (kind == sb.LIGHT_DISTANT)
    est[:, inf_mask] = (np.pi * wr * wr * lum[inf_mask])[None, :] / (wr * wr)
    pt_mask = (kind == sb.LIGHT_POINT) | (kind == sb.LIGHT_SPOT)
    est[:, pt_mask] = lum[pt_mask][None, :] / d2[:, pt_mask]

    vsum = est.sum(-1, keepdims=True)
    est = np.where(vsum > 0, est / np.maximum(vsum, 1e-30), power_pmf[None, :])
    pmf = (0.8 * est + 0.2 * power_pmf[None, :]).astype(np.float32)
    pmf /= pmf.sum(-1, keepdims=True)

    cdf = np.cumsum(pmf, axis=-1).astype(np.float32)
    cdf[..., -1] = 1.0
    return LightDistribution(
        cdf=jnp.asarray(cdf),
        pmf=jnp.asarray(pmf),
        grid_res=res,
        world_lo=jnp.asarray(lo.astype(np.float32)),
        world_inv_extent=jnp.asarray(
            np.full(3, 1.0 / max(extent, 1e-9), np.float32)
        ),
    )


def sample_light_id(dist: LightDistribution, u: Array,
                    p: Array | None = None) -> tuple[Array, Array]:
    """Draw a light id per lane: (id [R], pmf [R]).

    p: [R,3] shading points for the spatial strategy (voxel lookup);
    ignored for flat distributions.
    """
    if dist.grid_res is None or p is None:
        cdf = dist.cdf[0]
        idx = jnp.searchsorted(cdf, u, side="right")
        idx = jnp.minimum(idx, cdf.shape[0] - 1).astype(jnp.int32)
        return idx, dist.pmf[0][idx]
    res = dist.grid_res
    g = jnp.clip(
        ((p - dist.world_lo) * dist.world_inv_extent * res).astype(jnp.int32),
        0, res - 1,
    )
    v = (g[..., 0] * res + g[..., 1]) * res + g[..., 2]
    cdf_rows = dist.cdf[v]  # [R, L]
    idx = jax.vmap(
        lambda row, uu: jnp.searchsorted(row, uu, side="right")
    )(cdf_rows, u)
    idx = jnp.minimum(idx, dist.cdf.shape[1] - 1).astype(jnp.int32)
    pmf = jnp.take_along_axis(dist.pmf[v], idx[:, None], axis=1)[:, 0]
    return idx, pmf
