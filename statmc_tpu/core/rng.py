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
# Media draw sites (volpath, render/volume.py).  These always draw
# threefry uniforms (uniform_1d/2d) -- media sampling consumes a
# variable number of draws (delta/ratio tracking), so LD/lockstep
# stream mappings do not extend to them; N_SLOTS below intentionally
# excludes them to keep existing Halton dimension assignments stable.
SLOT_MEDIUM = 8  # 2D: channel select + distance (homogeneous.cpp:55-58)
SLOT_PHASE = 9  # 2D Henyey-Greenstein direction sample
SLOT_PHASE_NEE = 10  # 2D phase half of EstimateDirect at a medium vertex
SLOT_TR = 11  # base for tracking-loop draws (fold the iteration index)
SLOT_LENS = 12  # 2D exit-pupil sample (realistic camera)
# BSSRDF draw sites (render/sss.py; statpath.cpp:892-926).  Like the
# media slots these always draw threefry uniforms -- the SSS block
# never runs under lockstep/LD parity scenes, so the LD dimension map
# (N_SLOTS) intentionally excludes them.
SLOT_SSS_AXIS = 13  # 1D axis/channel/chain selector (pbrt reuses u1)
SLOT_SSS_RADIUS = 14  # 2D profile radius + phi
SLOT_SSS_LIGHT_SELECT = 15  # 1D light pick at the exit vertex
SLOT_SSS_LIGHT = 16  # 2D light surface sample at the exit vertex
SLOT_SSS_NEE_BSDF = 17  # 2D Sw-lobe sample inside EstimateDirect
SLOT_SSS_SW = 18  # 2D Sw-lobe continuation sample


def base_key(base_seed: int) -> Array:
    """Root key; mirrors the --baseseed CLI flag semantics."""
    return jax.random.PRNGKey(jnp.uint32(base_seed))


def pixel_keys(key: Array, pixel_ids: Array, sample_index: Array) -> Array:
    """Per-pixel keys for one sample index: fold (sample, pixel) into key.

    pixel_ids: int32 [P] global pixel ids (stable under sharding).
    sample_index: scalar, or [P] per-lane indices (path-regeneration
    wavefront: each lane advances through its own sample budget).
    Returns stacked keys [P, 2] (raw threefry key data).
    """
    if jnp.ndim(sample_index) == 0:
        k = jax.random.fold_in(key, sample_index)
        return jax.vmap(lambda pid: jax.random.fold_in(k, pid))(pixel_ids)
    return jax.vmap(
        lambda s, pid: jax.random.fold_in(jax.random.fold_in(key, s), pid)
    )(sample_index, pixel_ids)


def _site_keys(keys: Array, bounce, slot: int) -> Array:
    """Fold (bounce, slot) into per-lane keys; bounce scalar or [P]."""
    b = jnp.broadcast_to(jnp.asarray(bounce), keys.shape[:1])
    return jax.vmap(
        lambda k, bb: jax.random.fold_in(jax.random.fold_in(k, bb), slot)
    )(keys, b)


def uniform_1d(keys: Array, bounce, slot: int) -> Array:
    """One uniform in [0,1) per pixel key. keys: [P] key array."""
    ks = _site_keys(keys, bounce, slot)
    return jax.vmap(lambda k: jax.random.uniform(k, ()))(ks)


def uniform_2d(keys: Array, bounce, slot: int) -> Array:
    """[P, 2] uniforms."""
    ks = _site_keys(keys, bounce, slot)
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(ks)


# ---------------------------------------------------------------------------
# Low-discrepancy camera jitter: scrambled (0,2)-sequence.
#
# pbrt's zerotwosequence/stratified samplers stratify the film jitter
# (src/samplers/zerotwosequence.cpp, core/lowdiscrepancy.h).  In the
# counter-addressed design the equivalent is a per-pixel-scrambled
# (0,2)-sequence indexed by the global sample number: dimension 1 is the
# bit-reversed van der Corput sequence, dimension 2 the classic Sobol'
# second direction set, both XOR-scrambled with pixel-derived bits.
# ---------------------------------------------------------------------------


def _vdc_bits(n: Array) -> Array:
    """Bit-reversed 32-bit integers (vectorized van der Corput)."""
    n = n.astype(jnp.uint32)
    n = ((n << 16) | (n >> 16)) & jnp.uint32(0xFFFFFFFF)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def _sobol2_bits(n: Array) -> Array:
    """Second Sobol' dimension (direction numbers v, v^=v>>1)."""
    n = n.astype(jnp.uint32)
    result = jnp.zeros_like(n)
    v = jnp.full_like(n, jnp.uint32(1 << 31))

    def body(i, carry):
        n, v, result = carry
        result = jnp.where((n & 1) == 1, result ^ v, result)
        return n >> 1, v ^ (v >> 1), result

    _, _, result = jax.lax.fori_loop(0, 32, body, (n, v, result))
    return result


def pixel_scramble(key: Array, pixel_ids: Array) -> Array:
    """Per-pixel scramble words independent of the sample index."""
    return jax.vmap(lambda pid: jax.random.fold_in(key, pid))(pixel_ids)


def ld_camera_jitter(keys: Array, sample_index) -> Array:
    """[P,2] (0,2)-sequence film jitter, per-pixel scrambled."""
    # Per-pixel scramble words from the pixel keys (already folded with
    # the base seed but NOT the sample index -- the scramble must be
    # constant along the sequence).
    scr = keys.astype(jnp.uint32)
    s0 = scr[:, 0]
    s1 = scr[:, 1] if scr.shape[1] > 1 else scr[:, 0] ^ jnp.uint32(0x9E3779B9)
    n = jnp.broadcast_to(jnp.uint32(sample_index), s0.shape)
    u0 = (_vdc_bits(n) ^ s0).astype(jnp.float32) * (1.0 / 4294967296.0)
    u1 = (_sobol2_bits(n) ^ s1).astype(jnp.float32) * (1.0 / 4294967296.0)
    return jnp.stack([u0, u1], axis=-1)


# ---------------------------------------------------------------------------
# Full low-discrepancy sample streams over every integrator dimension.
#
# pbrt's zerotwosequence/sobol/stratified samplers feed LD points to
# every Get1D/Get2D call (src/samplers/zerotwosequence.cpp,
# src/samplers/sobol.cpp, src/core/lowdiscrepancy.h).  The
# counter-addressed equivalents keep the draw-site addressing (bounce,
# slot) but replace the threefry hash with:
#   MODE_02:     per-(pixel,bounce,slot) XOR-scrambled Sobol' (0,2)
#                pairs -- exactly the zerotwosequence construction.
#   MODE_HALTON: per-dimension radical inverse (dimension = flattened
#                (bounce, slot) index) with per-pixel Cranley-Patterson
#                rotation instead of pbrt's global-index pixel
#                interleaving (same convergence class, shard-stable).
# "sobol"/"maxmindist"/"stratified" map to MODE_02: the full 1024-dim
# Joe-Kuo matrix table (sobolmatrices.cpp, 27k LoC of data) is
# deliberately replaced by per-pair (0,2) nets + scrambling.
# ---------------------------------------------------------------------------

MODE_RANDOM = 0
MODE_02 = 1
MODE_HALTON = 2
# Lockstep replay of the reference's serial per-tile PCG32 streams from
# a host-precomputed table (core/lockstep.py); ld = (table[P,S,D], n).
MODE_LOCKSTEP = 3
# Exact conditional-consumption replay (core/lockstep.py EXACT mode +
# render/lockstep_exact.py): ld = raw stream rows [P, L]; the stream
# cursor lives in the bounce-scan carry, advanced by the same control
# flow that gates pbrt's sampler calls.  Draw sites in
# integrator._bounce_step read positionally at the cursor.
MODE_LOCKSTEP_EXACT = 4
# True Sobol' sampler (core/sobol.py): generated generator matrices
# over the flattened (bounce, slot) dimension index with per-site XOR
# scrambling -- the matrix-based counterpart of sobol.cpp minus the
# Joe-Kuo data table (see core/sobol.py header for the departure).
MODE_SOBOL = 5

N_SLOTS = 8  # draw sites per bounce (slots above)

SAMPLER_MODES = {
    "random": MODE_RANDOM,
    "stratified": MODE_02,
    "02sequence": MODE_02,
    "zerotwosequence": MODE_02,
    "lowdiscrepancy": MODE_02,
    "sobol": MODE_SOBOL,
    "maxmindist": MODE_02,
    "halton": MODE_HALTON,
    "lockstep": MODE_LOCKSTEP,
}


def _primes(n: int):
    import numpy as np

    sieve = np.ones(20000, bool)
    sieve[:2] = False
    for i in range(2, 142):
        if sieve[i]:
            sieve[i * i :: i] = False
    return np.nonzero(sieve)[0][:n].astype(np.int32)


_PRIMES = None


def _primes_table():
    # Cache the host-side numpy table only: caching the jnp array would
    # capture a tracer when the first call happens under a trace
    # (shard_map/jit), poisoning every later trace (order-dependent
    # UnexpectedTracerError).  The asarray below is a per-trace constant.
    global _PRIMES
    if _PRIMES is None:
        _PRIMES = _primes(1100)
    return jnp.asarray(_PRIMES)


def radical_inverse(base, n):
    """Radical inverse of n in the given (traced) base; broadcasts
    scalar/[P] base against scalar/[P] n."""
    base_f = base.astype(jnp.float32)
    n0, _ = jnp.broadcast_arrays(jnp.asarray(n, jnp.int32),
                                 jnp.asarray(base, jnp.int32))
    rd0 = jnp.zeros_like(n0, jnp.float32)
    inv0 = jnp.ones_like(n0, jnp.float32)

    def body(i, c):
        n, rd, inv = c
        nxt = n // base
        digit = n - nxt * base
        live = n > 0
        rd = jnp.where(live, rd * base_f + digit.astype(jnp.float32), rd)
        inv = jnp.where(live, inv / base_f, inv)
        return nxt, rd, inv

    _, rd, inv = jax.lax.fori_loop(0, 32, body, (n0, rd0, inv0))
    return rd * inv


def _ld_fold(scramble_keys: Array, bounce, slot: int) -> Array:
    return _site_keys(scramble_keys, bounce, slot)


# Lockstep table layout (core/lockstep.py): 5 camera dims then 8 per
# bounce.  BSDF_COMPONENT reuses uScattering.x / the continuation
# sample's x, mirroring pbrt's BSDF::Sample_f which derives the BxDF
# component choice from u[0] of the SAME 2D sample it remaps
# (src/core/reflection.cpp BSDF::Sample_f).
_LOCKSTEP_POS = {
    SLOT_CAMERA: (0, 1),
    SLOT_LIGHT_SELECT: (5 + 0,),
    SLOT_LIGHT_SAMPLE: (5 + 1, 5 + 2),
    SLOT_BSDF_COMPONENT: (5 + 3,),
    SLOT_BSDF_NEE: (5 + 3, 5 + 4),
    SLOT_BSDF_COMPONENT_PC: (5 + 5,),
    SLOT_BSDF: (5 + 5, 5 + 6),
    SLOT_RR: (5 + 7,),
}


def _lockstep_draw(ld, bounce, slot: int) -> list:
    """Values for (bounce, slot) from a lockstep table.

    ld = (tab [P,S,D], n);  n scalar or [P];  bounce scalar or [P].
    Camera dims are absolute; bounce dims offset by 8*bounce."""
    tab, n = ld
    P, S, D = tab.shape
    nn = jnp.clip(jnp.broadcast_to(jnp.asarray(n, jnp.int32), (P,)), 0, S - 1)
    row = jnp.take_along_axis(tab, nn[:, None, None], axis=1)[:, 0]  # [P,D]
    if slot == SLOT_CAMERA:
        offs = jnp.zeros((P,), jnp.int32)
    else:
        b = jnp.broadcast_to(jnp.asarray(bounce, jnp.int32), (P,))
        offs = 8 * b
    out = []
    for pos in _LOCKSTEP_POS[slot]:
        idx = jnp.clip(offs + pos, 0, D - 1)
        out.append(jnp.take_along_axis(row, idx[:, None], axis=1)[:, 0])
    return out


def draw_1d(keys: Array, ld, mode: int, bounce, slot: int) -> Array:
    """One uniform per lane at draw site (bounce, slot) under the given
    sampler mode.  ld = (scramble_keys [P,2], sample_index) or None."""
    if mode == MODE_LOCKSTEP and ld is not None:
        return _lockstep_draw(ld, bounce, slot)[0]
    if mode == MODE_RANDOM or ld is None:
        return uniform_1d(keys, bounce, slot)
    scr, n = ld
    words = _ld_fold(scr, bounce, slot).astype(jnp.uint32)
    if mode == MODE_02:
        nn = jnp.broadcast_to(jnp.uint32(n), words[:, 0].shape)
        return (_vdc_bits(nn) ^ words[:, 0]).astype(jnp.float32) \
            * (1.0 / 4294967296.0)
    if mode == MODE_SOBOL:
        from . import sobol as sbl

        dim = 2 * (jnp.asarray(bounce, jnp.int32) * N_SLOTS + slot)
        nn = jnp.broadcast_to(jnp.uint32(n), words[:, 0].shape)
        return sbl.sobol_1d(jnp.broadcast_to(dim, nn.shape), nn,
                            words[:, 0])
    # Halton: dimension from the flattened draw site.
    dim = 2 * (bounce * N_SLOTS + slot)
    base = _primes_table()[jnp.minimum(dim, 1099)]
    h = radical_inverse(base, jnp.asarray(n))
    rot = words[:, 0].astype(jnp.float32) * (1.0 / 4294967296.0)
    return jnp.mod(h + rot, 1.0)


def draw_2d(keys: Array, ld, mode: int, bounce, slot: int) -> Array:
    """[P,2] uniforms at draw site (bounce, slot) under the mode."""
    if mode == MODE_LOCKSTEP and ld is not None:
        u0, u1 = _lockstep_draw(ld, bounce, slot)
        return jnp.stack([u0, u1], axis=-1)
    if mode == MODE_RANDOM or ld is None:
        return uniform_2d(keys, bounce, slot)
    scr, n = ld
    words = _ld_fold(scr, bounce, slot).astype(jnp.uint32)
    if mode == MODE_02:
        nn = jnp.broadcast_to(jnp.uint32(n), words[:, 0].shape)
        u0 = (_vdc_bits(nn) ^ words[:, 0]).astype(jnp.float32) \
            * (1.0 / 4294967296.0)
        u1 = (_sobol2_bits(nn) ^ words[:, 1]).astype(jnp.float32) \
            * (1.0 / 4294967296.0)
        return jnp.stack([u0, u1], axis=-1)
    if mode == MODE_SOBOL:
        from . import sobol as sbl

        dim = 2 * (jnp.asarray(bounce, jnp.int32) * N_SLOTS + slot)
        nn = jnp.broadcast_to(jnp.uint32(n), words[:, 0].shape)
        dimv = jnp.broadcast_to(dim, nn.shape)
        u0 = sbl.sobol_1d(dimv, nn, words[:, 0])
        u1 = sbl.sobol_1d(dimv + 1, nn, words[:, 1])
        return jnp.stack([u0, u1], axis=-1)
    dim = 2 * (bounce * N_SLOTS + slot)
    p = _primes_table()
    b0 = p[jnp.minimum(dim, 1098)]
    b1 = p[jnp.minimum(dim + 1, 1099)]
    h0 = radical_inverse(b0, jnp.asarray(n))
    h1 = radical_inverse(b1, jnp.asarray(n))
    r0 = words[:, 0].astype(jnp.float32) * (1.0 / 4294967296.0)
    r1 = words[:, 1].astype(jnp.float32) * (1.0 / 4294967296.0)
    return jnp.stack(
        [jnp.mod(h0 + r0, 1.0), jnp.mod(h1 + r1, 1.0)], axis=-1
    )
