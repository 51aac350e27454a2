"""bsdftest: BSDF sampling-consistency checker.

Re-derivation of the reference tool (/root/reference/src/tools/
bsdftest.cpp): for a chosen material, estimate the hemispherical
reflectance rho(wo) three independent ways and report the spread --
the reference compares uniform-hemisphere integration, cosine-weighted
integration, and the BSDF's own importance sampling; disagreement
flags an inconsistent f/pdf pair.

Usage: python -m statmc_tpu.tools.bsdftest [material] [roughness]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp


def estimate_rho(mat_type: int, kd, ks, rough: float, n: int = 1 << 14,
                 seed: int = 0, cos_o: float = 0.8):
    """(rho_uniform, rho_cosine, rho_importance) RGB estimates."""
    from ..render import bsdf as B

    rng = np.random.default_rng(seed)
    so = float(np.sqrt(max(0.0, 1.0 - cos_o * cos_o)))
    wo = jnp.broadcast_to(jnp.asarray([so, 0.0, cos_o]), (n, 3))
    ones = np.ones((n, 3), np.float32)
    m = B.MaterialLanes(
        mat_type=jnp.full((n,), mat_type, jnp.int32),
        kd=jnp.asarray(np.asarray(kd, np.float32) * ones),
        ks=jnp.asarray(np.asarray(ks, np.float32) * ones),
        kr=jnp.asarray(ones), kt=jnp.asarray(0.0 * ones),
        eta=jnp.asarray(1.5 * ones), k=jnp.asarray(0.0 * ones),
        rough_u=jnp.full((n,), rough), rough_v=jnp.full((n,), rough),
        sigma=jnp.zeros((n,)),
    )
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    uc = jnp.asarray(rng.random(n), jnp.float32)

    # 1) Uniform hemisphere integration of f cos / (1/2pi).
    z = u2[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * jnp.pi * u2[:, 1]
    wi_u = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    f_u, _ = B.evaluate(m, wo, wi_u)
    rho_u = np.asarray(jnp.mean(f_u * z[:, None] * (2 * jnp.pi), axis=0))

    # 2) Cosine-weighted integration of f cos / (cos/pi).
    wi_c = B.cosine_sample_hemisphere(u2)
    f_c, _ = B.evaluate(m, wo, wi_c)
    rho_c = np.asarray(jnp.mean(f_c * jnp.pi, axis=0))

    # 3) The BSDF's own importance sampling: f cos / pdf.
    s = B.sample(m, wo, u2, uc)
    w = s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-9)[:, None]
    w = jnp.where((s.pdf > 1e-9)[:, None] & (s.wi[:, 2:3] > 0), w, 0.0)
    rho_i = np.asarray(jnp.mean(w, axis=0))
    return rho_u, rho_c, rho_i


def main(argv=None):
    from ..scene import build as sb

    argv = argv if argv is not None else sys.argv[1:]
    name = argv[0] if argv else "matte"
    rough = float(argv[1]) if len(argv) > 1 else 0.2
    mt = sb.MATERIAL_IDS.get(name) if hasattr(sb, "MATERIAL_IDS") else None
    if mt is None:
        mt = {"matte": sb.MAT_MATTE, "plastic": sb.MAT_PLASTIC,
              "substrate": sb.MAT_SUBSTRATE, "metal": sb.MAT_METAL,
              "uber": sb.MAT_UBER}.get(name)
    if mt is None:
        print(f"unknown material {name!r}", file=sys.stderr)
        return 1
    rho_u, rho_c, rho_i = estimate_rho(mt, (0.5, 0.5, 0.5),
                                       (0.3, 0.3, 0.3), rough)
    print(f"material {name} roughness {rough}")
    print(f"  rho uniform-hemisphere : {rho_u}")
    print(f"  rho cosine-weighted    : {rho_c}")
    print(f"  rho importance-sampled : {rho_i}")
    spread = float(np.abs(np.ptp(np.stack([rho_u, rho_c, rho_i]), axis=0)).max())
    print(f"  max spread: {spread:.4f} "
          f"({'OK' if spread < 0.05 else 'INCONSISTENT'})")
    return 0 if spread < 0.05 else 2


if __name__ == "__main__":
    sys.exit(main())
