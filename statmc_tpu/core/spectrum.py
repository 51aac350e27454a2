"""RGB spectrum helpers.

The reference's default spectral representation is RGBSpectrum
(/root/reference/src/core/spectrum.h); SampledSpectrum (60 bins) is an
opt-in compile flag the paper never uses.  We keep radiance as [..., 3]
RGB arrays and provide the same XYZ conversions and luminance weights so
film output matches pbrt's XYZ->RGB round trip bit-for-bit in f32.
"""
from __future__ import annotations

import jax.numpy as jnp

# pbrt core/spectrum.h YWeight + XYZ conversion constants.
_Y_WEIGHT = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)


def luminance(rgb):
    """RGBSpectrum::y() (spectrum.h:RGBSpectrum::y)."""
    return jnp.sum(rgb * _Y_WEIGHT, axis=-1)


def rgb_to_xyz(rgb):
    """spectrum.h:RGBToXYZ."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    return jnp.stack([x, y, z], axis=-1)


def xyz_to_rgb(xyz):
    """spectrum.h:XYZToRGB."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875991 * y + 0.041556 * z
    b = 0.055648 * x - 0.204043 * y + 1.057311 * z
    return jnp.stack([r, g, b], axis=-1)
