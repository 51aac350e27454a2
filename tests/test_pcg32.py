"""PCG32 bit-exactness vs a pure-python 64-bit reference."""
import numpy as np
import jax.numpy as jnp

from statmc_tpu.core import pcg32

MASK64 = (1 << 64) - 1
MUL = 0x5851F42D4C957F2D
DEFAULT_STATE = 0x853C49E6748FEA9B


class PyPCG:
    """pbrt rng.h semantics in python ints."""

    def __init__(self, initseq):
        self.inc = ((initseq << 1) | 1) & MASK64
        self.state = 0
        self._advance()
        self.state = (self.state + DEFAULT_STATE) & MASK64
        self._advance()

    def _advance(self):
        self.state = (self.state * MUL + self.inc) & MASK64

    def next_u32(self):
        old = self.state
        self._advance()
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) \
            & 0xFFFFFFFF


def test_pcg32_matches_reference_stream():
    seqs = [0, 1, 7, 123456, 2**40 + 17]
    seq_hi = jnp.asarray([(s >> 32) & 0xFFFFFFFF for s in seqs], jnp.uint32)
    seq_lo = jnp.asarray([s & 0xFFFFFFFF for s in seqs], jnp.uint32)
    st = pcg32.set_sequence(seq_hi, seq_lo)
    py = [PyPCG(s) for s in seqs]
    for step in range(20):
        u, st = pcg32.uniform_uint32(st)
        expect = [p.next_u32() for p in py]
        np.testing.assert_array_equal(
            np.asarray(u, np.uint32), np.asarray(expect, np.uint32),
            err_msg=f"step {step}",
        )


def test_uniform_float_range():
    st = pcg32.set_sequence(
        jnp.zeros((8,), jnp.uint32), jnp.arange(8, dtype=jnp.uint32)
    )
    for _ in range(10):
        f, st = pcg32.uniform_float(st)
        assert (np.asarray(f) >= 0).all() and (np.asarray(f) < 1.0).all()
