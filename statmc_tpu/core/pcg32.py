"""PCG32 in JAX (32-bit limb arithmetic; no x64 requirement).

The reference's RNG is pbrt's PCG32 (src/core/rng.h) seeded per tile as
(baseSeed+1)*(tileSeed+1) (src/samplers/random.cpp:52,68,86-87).  This
module reproduces its bit-exact output stream so a future "lockstep"
sampler mode can replay the reference's exact sample sequences for
allclose parity runs (SURVEY.md §7 hard part #4).

State is a pair of uint32 arrays (hi, lo) per lane; all ops vectorize.
Matches pbrt's constants: multiplier 0x5851f42d4c957f2d, default
stream/inc handling via SetSequence.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_MUL_HI = jnp.uint32(0x5851F42D)
_MUL_LO = jnp.uint32(0x4C957F2D)
_DEFAULT_STATE_HI = jnp.uint32(0x853C49E6)
_DEFAULT_STATE_LO = jnp.uint32(0x748FEA9B)
_DEFAULT_INC_HI = jnp.uint32(0xDA3E39CB)
_DEFAULT_INC_LO = jnp.uint32(0x94B95BDB)


class PCG32State(NamedTuple):
    state_hi: Array
    state_lo: Array
    inc_hi: Array
    inc_lo: Array


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """(a_hi:a_lo) * (b_hi:b_lo) mod 2^64 using 16-bit partial products."""
    a0 = a_lo & 0xFFFF
    a1 = a_lo >> 16
    b0 = b_lo & 0xFFFF
    b1 = b_lo >> 16
    # low 32x32 -> 64
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    lo = (p00 & 0xFFFF) | (mid << 16)
    carry = (mid >> 16) + (p01 >> 16) + (p10 >> 16) + p11
    hi = a_lo * b_hi + a_hi * b_lo + carry
    return hi & jnp.uint32(0xFFFFFFFF), lo & jnp.uint32(0xFFFFFFFF)


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    hi = a_hi + b_hi + carry
    return hi, lo


def _advance(s: PCG32State) -> PCG32State:
    hi, lo = _mul64(s.state_hi, s.state_lo, _MUL_HI, _MUL_LO)
    hi, lo = _add64(hi, lo, s.inc_hi, s.inc_lo)
    return PCG32State(hi, lo, s.inc_hi, s.inc_lo)


def _output(state_hi, state_lo):
    """xorshift + rotate (rng.h:UniformUInt32)."""
    # xorshifted = (uint32)(((state >> 18) ^ state) >> 27)
    s18_hi = state_hi >> 18
    s18_lo = (state_lo >> 18) | ((state_hi & jnp.uint32(0x3FFFF)) << 14)
    x_hi = s18_hi ^ state_hi
    x_lo = s18_lo ^ state_lo
    xorshifted = (x_lo >> 27) | ((x_hi & jnp.uint32(0x7FFFFFF)) << 5)
    rot = state_hi >> 27  # state >> 59
    return (xorshifted >> rot) | (
        xorshifted << ((-rot.astype(jnp.int32)).astype(jnp.uint32) & 31)
    )


def set_sequence(seq_hi: Array, seq_lo: Array) -> PCG32State:
    """RNG::SetSequence(initseq) with initstate = default (rng.h)."""
    inc_hi = (seq_hi << 1) | (seq_lo >> 31)
    inc_lo = (seq_lo << 1) | jnp.uint32(1)
    zero = jnp.zeros_like(seq_lo)
    s = PCG32State(zero, zero, inc_hi & jnp.uint32(0xFFFFFFFF), inc_lo)
    s = _advance(s)
    s = PCG32State(*_add64(s.state_hi, s.state_lo,
                           _DEFAULT_STATE_HI, _DEFAULT_STATE_LO),
                   s.inc_hi, s.inc_lo)
    return _advance(s)


def uniform_uint32(s: PCG32State) -> tuple[Array, PCG32State]:
    ns = _advance(s)
    # pbrt outputs from the OLD state (oldstate = state; state = ...).
    return _output(s.state_hi, s.state_lo), ns


ONE_MINUS_EPSILON = float.fromhex("0x1.fffffep-1")  # pbrt.h


def uniform_float(s: PCG32State) -> tuple[Array, PCG32State]:
    """rng.h:UniformFloat = min(OneMinusEpsilon, u32 * 2^-32)."""
    u, ns = uniform_uint32(s)
    f = jnp.minimum(
        jnp.float32(ONE_MINUS_EPSILON),
        u.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
    )
    return f, ns
