"""Directional-albedo lookup tables: N-D multilinear interp + MC precompute.

The reference precomputes per-material-family directional-albedo tables
(~100x faster than pbrt's rho(); src/statistics/luts/precomputealbedo/
README) and queries them per bounce-0 intersection through a generic
up-to-8-D multilinear interpolator (src/statistics/lut.h:163-272), with
constant-texture dimensions baked out at material construction
(src/core/material.cpp:134-255).

TPU shape: tables are flat device arrays; interpolation over N static
dims unrolls into 2^N gathers + lerps, vectorized over all lanes.  The
precompute is itself a JAX Monte Carlo integration over the existing
BSDF sampling code (no separate C++ tool needed; exposed as
`python -m statmc_tpu.tools.precomputealbedo` with the reference tool's
--comparetopbrt / --testlut / --benchmark modes).

Families and axes (chosen to cover the parameters our BSDFs expose):
  matte:     (cos_theta, sigma)            -- 16 x 16
  metal:     (cos_theta, alpha)            -- 16 x 16, per (eta,k) row
  substrate: (cos_theta, alpha)            -- weighted by Kd/Ks at query
  plastic:   (cos_theta, alpha)
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class LookupTable(NamedTuple):
    """Flattened N-D table with per-dim sizes (lut.h:163 equivalent)."""
    data: Array  # [prod(sizes)] or [prod(sizes), C]
    sizes: tuple  # static per-dim sample counts

    def lookup(self, coords: Array) -> Array:
        """Multilinear interpolation.

        coords: [..., N] normalized in [0,1] per dimension.
        Returns [...] or [..., C].
        """
        n = len(self.sizes)
        idx0 = []
        fracs = []
        for d in range(n):
            x = jnp.clip(coords[..., d], 0.0, 1.0) * (self.sizes[d] - 1)
            i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          self.sizes[d] - 2 if self.sizes[d] > 1 else 0)
            idx0.append(i0)
            fracs.append(x - i0.astype(jnp.float32))

        strides = []
        s = 1
        for d in reversed(range(n)):
            strides.insert(0, s)
            s *= self.sizes[d]

        out = None
        for corner in range(1 << n):
            flat = 0
            w = None
            for d in range(n):
                hi = (corner >> d) & 1
                step = hi if self.sizes[d] > 1 else 0
                flat = flat + (idx0[d] + step) * strides[d]
                wd = fracs[d] if hi else (1.0 - fracs[d])
                w = wd if w is None else w * wd
            val = self.data[flat]
            if val.ndim > flat.ndim:
                w = w[..., None]
            out = val * w if out is None else out + val * w
        return out


def _mc_albedo(mat_lanes, cos_thetas: Array, n_samples: int,
               key) -> Array:
    """MC directional albedo rho(wo) = E[f |cos wi| / pdf] per lane."""
    from . import bsdf as B

    G = cos_thetas.shape[0]
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_thetas**2))
    wo = jnp.stack([st, jnp.zeros_like(st), cos_thetas], axis=-1)

    def body(i, acc):
        k = jax.random.fold_in(key, i)
        u2 = jax.random.uniform(k, (G, 2))
        uc = jax.random.uniform(jax.random.fold_in(k, 1), (G,))
        smp = B.sample(mat_lanes, wo, u2, uc)
        w = smp.f * jnp.abs(smp.wi[..., 2:3]) / jnp.maximum(
            smp.pdf, 1e-9)[..., None]
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        # Reflection-side albedo only (GetAlbedo semantics).
        w = jnp.where((smp.wi[..., 2:3] > 0), w, 0.0)
        return acc + w

    total = jax.lax.fori_loop(0, n_samples, body, jnp.zeros((G, 3)))
    return total / n_samples


def precompute_family(family: str, sizes=(16, 16), n_samples: int = 1024,
                      seed: int = 0, eta=None, k=None) -> LookupTable:
    """Precompute a (cos_theta, param2) albedo table for one family.

    param2 axis: sigma in [0, 90] deg for matte; alpha in [0.01, 1] for
    microfacet families.  Albedo here is for unit Kd/Ks; callers scale
    by the material color (matching e.g. matte.cpp:110-113
    Kd * Material::GetAlbedo).
    """
    from . import bsdf as B
    from ..scene import build as sb

    n_cos, n_p2 = sizes
    cos = (np.arange(n_cos) + 0.5) / n_cos
    if family == "matte":
        p2 = np.linspace(0.0, 90.0, n_p2)
        mat_type = sb.MAT_MATTE
    elif family == "metal":
        p2 = np.linspace(0.01, 1.0, n_p2)
        mat_type = sb.MAT_METAL
    elif family == "substrate":
        p2 = np.linspace(0.01, 1.0, n_p2)
        mat_type = sb.MAT_SUBSTRATE
    elif family == "plastic":
        p2 = np.linspace(0.01, 1.0, n_p2)
        mat_type = sb.MAT_PLASTIC
    else:
        raise ValueError(f"unknown albedo family {family!r}")

    cc, pp = np.meshgrid(cos, p2, indexing="ij")
    G = cc.size
    ones = jnp.ones((G, 3))
    zeros = jnp.zeros((G, 3))
    eta_arr = (jnp.broadcast_to(jnp.asarray(eta, jnp.float32), (G, 3))
               if eta is not None else jnp.full((G, 3), 1.5))
    k_arr = (jnp.broadcast_to(jnp.asarray(k, jnp.float32), (G, 3))
             if k is not None else jnp.zeros((G, 3)))
    rough = jnp.asarray(pp.reshape(-1), jnp.float32)
    sigma = (jnp.asarray(pp.reshape(-1), jnp.float32)
             if family == "matte" else jnp.zeros((G,)))
    if family == "matte":
        rough = jnp.zeros((G,))

    from .bsdf import MaterialLanes

    lanes = MaterialLanes(
        mat_type=jnp.full((G,), mat_type, jnp.int32),
        kd=ones, ks=ones if family != "matte" else zeros,
        kr=zeros, kt=zeros, eta=eta_arr, k=k_arr,
        rough_u=rough, rough_v=rough, sigma=sigma,
    )
    vals = _mc_albedo(
        lanes, jnp.asarray(cc.reshape(-1), jnp.float32), n_samples,
        jax.random.PRNGKey(seed),
    )[..., 0]  # family tables are achromatic at unit coefficients
    return LookupTable(data=vals, sizes=(n_cos, n_p2))


# ---------------------------------------------------------------------------
# Per-material reduced tables (the reference's LUT reduction:
# material.cpp:134-255 bakes constant-texture dimensions out at material
# construction; with untextured parameters every dimension but cos_theta
# is constant, so each material reduces to a 1-D albedo curve).
# ---------------------------------------------------------------------------


def precompute_material_curves(scene_tables, n_cos: int = 16,
                               n_samples: int = 512, seed: int = 3):
    """Returns (lut_d [M, n_cos, 3], lut_rest [M, n_cos, 3]):

    albedo(cos) ~= kd_runtime * lut_d[mat](cos) + lut_rest[mat](cos)

    lut_d is the diffuse-lobe albedo with unit Kd (so textured Kd scales
    linearly at query time); lut_rest holds every non-Kd lobe with the
    material's actual parameters.
    """
    from .bsdf import MaterialLanes

    M = int(scene_tables.mat_type.shape[0])
    cos = jnp.asarray((np.arange(n_cos) + 0.5) / n_cos, jnp.float32)
    G = M * n_cos

    def tile(x):
        return jnp.repeat(x, n_cos, axis=0)

    ones3 = jnp.ones((G, 3))
    zeros3 = jnp.zeros((G, 3))
    base = MaterialLanes(
        mat_type=tile(scene_tables.mat_type),
        kd=ones3,
        ks=zeros3,
        kr=zeros3,
        kt=zeros3,
        eta=tile(scene_tables.mat_eta),
        k=tile(scene_tables.mat_k),
        rough_u=tile(scene_tables.mat_rough_u),
        rough_v=tile(scene_tables.mat_rough_v),
        sigma=tile(scene_tables.mat_sigma),
    )
    rest = base._replace(
        kd=zeros3,
        ks=tile(scene_tables.mat_ks),
        kr=tile(scene_tables.mat_kr),
        kt=tile(scene_tables.mat_kt),
    )
    cc = jnp.tile(cos, (M,))
    key = jax.random.PRNGKey(seed)
    lut_d = _mc_albedo(base, cc, n_samples, key).reshape(M, n_cos, 3)
    lut_rest = _mc_albedo(
        rest, cc, n_samples, jax.random.fold_in(key, 1)
    ).reshape(M, n_cos, 3)
    # The kd * lut_d decomposition only applies to families with a
    # Kd-proportional lobe; conductor/dielectric families ignore Kd, so
    # their whole albedo lives in lut_rest (computed with kd=0 above,
    # which those BSDFs never read anyway).
    from ..scene import build as sb

    t = scene_tables.mat_type
    kd_linear = (
        (t == sb.MAT_MATTE) | (t == sb.MAT_PLASTIC) | (t == sb.MAT_UBER)
        | (t == sb.MAT_SUBSTRATE) | (t == sb.MAT_TRANSLUCENT)
        | (t == sb.MAT_DISNEY)
    )
    lut_d = jnp.where(kd_linear[:, None, None], lut_d, 0.0)
    return lut_d, lut_rest


def albedo_from_curves(lut_d: Array, lut_rest: Array, mat_id: Array,
                       kd: Array, cos_o: Array) -> Array:
    """Query the reduced curves per lane: [R,3] albedo."""
    n_cos = lut_d.shape[1]
    x = jnp.clip(jnp.abs(cos_o), 0.0, 1.0) * n_cos - 0.5
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_cos - 2)
    f = jnp.clip(x - i0, 0.0, 1.0)[..., None]
    d = lut_d[mat_id, i0] * (1 - f) + lut_d[mat_id, i0 + 1] * f
    rr = lut_rest[mat_id, i0] * (1 - f) + lut_rest[mat_id, i0 + 1] * f
    return jnp.clip(kd * d + rr, 0.0, 1.0)
