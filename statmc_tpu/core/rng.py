"""Counter-based per-(pixel, sample, bounce) random streams.

The reference uses a serial PCG32 per tile with seed
(baseSeed+1)*(tileSeed+1) (/root/reference/src/samplers/random.cpp:68) and
relies on strict consumption order.  A serial stream is the wrong shape
for a data-parallel machine, so here every random draw is addressed by
coordinates (pixel_id, sample_index, bounce, slot) and hashed with
threefry.  This makes sample values independent of sharding: a pixel's
stream depends only on its global id, never on which device computes it,
which is what makes N-device renders equal 1-device renders exactly.

Slots are small static integers enumerating the draw sites inside one
bounce (camera jitter, light selection, light sample, BSDF sample, RR, ...).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Draw-site slot numbers (static). One bounce consumes slots within a
# (pixel, sample, bounce) key, so slots never collide across bounces.
SLOT_CAMERA = 0  # 2D film jitter (+ future lens)
SLOT_LIGHT_SELECT = 1  # 1D light distribution draw
SLOT_LIGHT_SAMPLE = 2  # 2D light surface sample
SLOT_BSDF_NEE = 3  # 2D BSDF sample inside NEE-MIS
SLOT_BSDF = 4  # 2D BSDF sample for path continuation
SLOT_RR = 5  # 1D Russian roulette
SLOT_BSDF_COMPONENT = 6  # 1D BxDF component selection (NEE half)
SLOT_BSDF_COMPONENT_PC = 7  # 1D BxDF component selection (continuation)


def base_key(base_seed: int) -> Array:
    """Root key; mirrors the --baseseed CLI flag semantics."""
    return jax.random.PRNGKey(jnp.uint32(base_seed))


def pixel_keys(key: Array, pixel_ids: Array, sample_index: Array) -> Array:
    """Per-pixel keys for one sample index: fold (sample, pixel) into key.

    pixel_ids: int32 [P] global pixel ids (stable under sharding).
    Returns stacked keys [P, 2] (raw threefry key data).
    """
    k = jax.random.fold_in(key, sample_index)
    return jax.vmap(lambda pid: jax.random.fold_in(k, pid))(pixel_ids)


def uniform_1d(keys: Array, bounce, slot: int) -> Array:
    """One uniform in [0,1) per pixel key. keys: [P] key array."""
    ks = jax.vmap(lambda k: jax.random.fold_in(jax.random.fold_in(k, bounce), slot))(
        keys
    )
    return jax.vmap(lambda k: jax.random.uniform(k, ()))(ks)


def uniform_2d(keys: Array, bounce, slot: int) -> Array:
    """[P, 2] uniforms."""
    ks = jax.vmap(lambda k: jax.random.fold_in(jax.random.fold_in(k, bounce), slot))(
        keys
    )
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(ks)
