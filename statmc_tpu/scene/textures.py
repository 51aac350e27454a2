"""Texture system: image atlas + procedural textures, SoA for TPU.

The reference's texture plugins (src/textures/, src/core/texture.h,
src/core/mipmap.h) evaluate per-intersection through virtual
Texture::Evaluate.  Here every image texture is packed into one flat
texel atlas with a (offset, width, height) row per texture; lookups are
batched bilinear gathers over ray lanes.  Procedural textures evaluate
branchlessly across all lanes and are selected per lane by kind:
checkerboard, uv, bilerp, dots (2-D mappings), fbm, wrinkled, windy,
marble (3-D noise, src/core/texture.cpp:Noise/FBm/Turbulence), plus
scale/mix combinators over one level of child textures and folded
constants.

Noise deviates from pbrt in one deliberate way: the lattice hash is an
arithmetic integer mix instead of pbrt's NoisePerm permutation table
(texture.cpp:NoisePerm) -- a 512-entry gather per lane is the one
operation a TPU hates, and the noise statistics (band-limited gradient
noise, same octave weights) are what the textures rely on, not the
exact lattice values.

MIPmapping (mipmap.h): every image texture carries a box-filtered
power-of-two pyramid in the atlas (add_image below); lookups blend two
levels trilinearly with the level chosen from the ray-cone footprint
(the TPU stand-in for pbrt's ray differentials).  EWA's anisotropic
ellipse sampling (mipmap.h:EWA) is approximated by that isotropic cone.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

TEX_NONE = -1
MAX_MIP = 12  # mip chain cap (4096x4096 fully reduced)
# Kinds for evaluated textures.
KIND_IMAGE = 0
KIND_CHECKER = 1
KIND_SCALE = 2  # child0 * p0 (constant rgb scale)
KIND_FBM = 3
KIND_WRINKLED = 4
KIND_WINDY = 5
KIND_MARBLE = 6
KIND_DOTS = 7
KIND_UV = 8
KIND_BILERP = 9
KIND_MIX = 10  # lerp(child0, child1, par[0])
KIND_CONSTANT = 11


class TextureTable(NamedTuple):
    atlas: Array  # [T,3] flat texels of all images
    tex_offset: Array  # [N] first texel index
    tex_width: Array  # [N]
    tex_height: Array  # [N]
    tex_kind: Array  # [N]
    tex_p0: Array  # [N,3] kind-specific rgb (checker tex1, const, v00...)
    tex_p1: Array  # [N,3] kind-specific rgb (checker tex2, v01...)
    tex_p2: Array  # [N,3] bilerp v10 / dots inside
    tex_p3: Array  # [N,3] bilerp v11 / dots outside
    tex_uvscale: Array  # [N,2] uscale, vscale
    tex_par: Array  # [N,4] octaves, omega/roughness, scale, variation
    tex_child: Array  # [N,2] child texture ids for scale/mix (-1 none)
    tex_mip_offset: Array  # [N,MAX_MIP] per-level atlas offsets
    tex_mip_w: Array  # [N,MAX_MIP]
    tex_mip_h: Array  # [N,MAX_MIP]
    tex_n_mips: Array  # [N]
    has_children: bool  # static: any scale/mix rows present
    # Static tuple of the texture kinds present (sorted ints); survives
    # the table becoming a jit argument (driver.split_device_args) so
    # kind gating stays a compile-time decision.  None on tables built
    # by hand (helpers fall back to evaluating every kind).
    kinds_static: Any = None

    @staticmethod
    def empty():
        return TextureTable(
            atlas=jnp.zeros((1, 3)),
            tex_offset=jnp.zeros((1,), jnp.int32),
            tex_width=jnp.ones((1,), jnp.int32),
            tex_height=jnp.ones((1,), jnp.int32),
            tex_kind=jnp.zeros((1,), jnp.int32),
            tex_p0=jnp.ones((1, 3)),
            tex_p1=jnp.zeros((1, 3)),
            tex_p2=jnp.zeros((1, 3)),
            tex_p3=jnp.zeros((1, 3)),
            tex_uvscale=jnp.ones((1, 2)),
            tex_par=jnp.zeros((1, 4)),
            tex_child=-jnp.ones((1, 2), jnp.int32),
            tex_mip_offset=jnp.zeros((1, MAX_MIP), jnp.int32),
            tex_mip_w=jnp.ones((1, MAX_MIP), jnp.int32),
            tex_mip_h=jnp.ones((1, MAX_MIP), jnp.int32),
            tex_n_mips=jnp.ones((1,), jnp.int32),
            has_children=False,
            kinds_static=(KIND_CONSTANT,),
        )


class TextureTableBuilder:
    def __init__(self):
        self.texels: list[np.ndarray] = []
        self.rows: list[dict] = []
        self._cache: dict[str, int] = {}

    def _row(self, kind, **kw) -> int:
        row = dict(
            offset=0, width=1, height=1, kind=kind,
            p0=np.ones(3, np.float32), p1=np.zeros(3, np.float32),
            p2=np.zeros(3, np.float32), p3=np.zeros(3, np.float32),
            uv=np.ones(2, np.float32),
            par=np.zeros(4, np.float32),
            child=np.array([-1, -1], np.int32),
            mip_offset=np.zeros(MAX_MIP, np.int32),
            mip_w=np.ones(MAX_MIP, np.int32),
            mip_h=np.ones(MAX_MIP, np.int32),
            n_mips=1,
        )
        row.update(kw)
        self.rows.append(row)
        return len(self.rows) - 1

    def add_image(self, path: str, uscale=1.0, vscale=1.0) -> int:
        key = f"img:{path}:{uscale}:{vscale}"
        if key in self._cache:
            return self._cache[key]
        from ..io.image import read_image

        try:
            img = read_image(path)
        except (OSError, ValueError):
            return TEX_NONE
        # MIP pyramid (core/mipmap.h): box-filtered power-of-two chain,
        # all levels appended to the flat atlas.  Level offsets/sizes go
        # in tex_mip_offset/tex_mip_size rows; trilinear lookups blend
        # two levels by the ray-cone footprint (sample_texture).
        levels = [img.astype(np.float32)]
        while min(levels[-1].shape[0], levels[-1].shape[1]) > 1:
            src = levels[-1]
            h2, w2 = max(src.shape[0] // 2, 1), max(src.shape[1] // 2, 1)
            src = src[: h2 * 2, : w2 * 2]
            down = 0.25 * (src[0::2, 0::2] + src[1::2, 0::2]
                           + src[0::2, 1::2] + src[1::2, 1::2])
            levels.append(down)
        levels = levels[:MAX_MIP]
        mo = np.zeros((MAX_MIP,), np.int32)
        mw = np.ones((MAX_MIP,), np.int32)
        mh = np.ones((MAX_MIP,), np.int32)
        for li, lvl in enumerate(levels):
            mo[li] = sum(t.shape[0] for t in self.texels)
            mw[li] = lvl.shape[1]
            mh[li] = lvl.shape[0]
            self.texels.append(lvl.reshape(-1, 3))
        mo[len(levels):] = mo[len(levels) - 1]
        mw[len(levels):] = mw[len(levels) - 1]
        mh[len(levels):] = mh[len(levels) - 1]
        tid = self._row(
            KIND_IMAGE, offset=int(mo[0]), width=img.shape[1],
            height=img.shape[0], uv=np.array([uscale, vscale], np.float32),
            mip_offset=mo, mip_w=mw, mip_h=mh, n_mips=len(levels),
        )
        self._cache[key] = tid
        return tid

    def add_checker(self, rgb1, rgb2, uscale=1.0, vscale=1.0) -> int:
        return self._row(
            KIND_CHECKER, p0=np.asarray(rgb1, np.float32),
            p1=np.asarray(rgb2, np.float32),
            uv=np.array([uscale, vscale], np.float32),
        )

    def add_constant(self, rgb) -> int:
        return self._row(KIND_CONSTANT, p0=np.asarray(rgb, np.float32))

    def add_noise(self, kind, octaves=8, omega=0.5, scale=1.0,
                  variation=0.2) -> int:
        return self._row(
            kind,
            par=np.array([octaves, omega, scale, variation], np.float32),
        )

    def add_dots(self, inside, outside, uscale=1.0, vscale=1.0) -> int:
        return self._row(
            KIND_DOTS, p2=np.asarray(inside, np.float32),
            p3=np.asarray(outside, np.float32),
            uv=np.array([uscale, vscale], np.float32),
        )

    def add_uv(self, uscale=1.0, vscale=1.0) -> int:
        return self._row(
            KIND_UV, uv=np.array([uscale, vscale], np.float32)
        )

    def add_bilerp(self, v00, v01, v10, v11) -> int:
        return self._row(
            KIND_BILERP, p0=np.asarray(v00, np.float32),
            p1=np.asarray(v01, np.float32), p2=np.asarray(v10, np.float32),
            p3=np.asarray(v11, np.float32),
        )

    def add_scale(self, child: int, scale_rgb) -> int:
        return self._row(
            KIND_SCALE, p0=np.asarray(scale_rgb, np.float32),
            child=np.array([child, -1], np.int32),
        )

    def add_mix(self, child0: int, child1: int, amount: float,
                c0_rgb=None, c1_rgb=None) -> int:
        """Mix of two operands; texture children take precedence over
        constant rgb fallbacks (textures/mix.cpp)."""
        return self._row(
            KIND_MIX,
            p0=np.asarray(c0_rgb if c0_rgb is not None else (0, 0, 0),
                          np.float32),
            p1=np.asarray(c1_rgb if c1_rgb is not None else (1, 1, 1),
                          np.float32),
            par=np.array([amount, 0, 0, 0], np.float32),
            child=np.array([child0, child1], np.int32),
        )

    def build(self) -> TextureTable:
        if not self.rows:
            return TextureTable.empty()
        atlas = (np.concatenate(self.texels, 0) if self.texels
                 else np.zeros((1, 3), np.float32))
        return TextureTable(
            atlas=jnp.asarray(atlas),
            tex_offset=jnp.asarray([r["offset"] for r in self.rows],
                                   jnp.int32),
            tex_width=jnp.asarray([r["width"] for r in self.rows], jnp.int32),
            tex_height=jnp.asarray([r["height"] for r in self.rows],
                                   jnp.int32),
            tex_kind=jnp.asarray([r["kind"] for r in self.rows], jnp.int32),
            tex_p0=jnp.asarray(np.stack([r["p0"] for r in self.rows])),
            tex_p1=jnp.asarray(np.stack([r["p1"] for r in self.rows])),
            tex_p2=jnp.asarray(np.stack([r["p2"] for r in self.rows])),
            tex_p3=jnp.asarray(np.stack([r["p3"] for r in self.rows])),
            tex_uvscale=jnp.asarray(np.stack([r["uv"] for r in self.rows])),
            tex_par=jnp.asarray(np.stack([r["par"] for r in self.rows])),
            tex_child=jnp.asarray(np.stack([r["child"] for r in self.rows])),
            tex_mip_offset=jnp.asarray(
                np.stack([r["mip_offset"] for r in self.rows])),
            tex_mip_w=jnp.asarray(np.stack([r["mip_w"] for r in self.rows])),
            tex_mip_h=jnp.asarray(np.stack([r["mip_h"] for r in self.rows])),
            tex_n_mips=jnp.asarray([r["n_mips"] for r in self.rows],
                                   jnp.int32),
            has_children=any(
                r["kind"] in (KIND_SCALE, KIND_MIX) for r in self.rows
            ),
            kinds_static=tuple(sorted({r["kind"] for r in self.rows})),
        )


# ---------------------------------------------------------------------------
# Gradient noise (core/texture.cpp:Noise/FBm/Turbulence, arithmetic hash).


def _hash3(ix, iy, iz):
    ux = ix.astype(jnp.uint32)
    uy = iy.astype(jnp.uint32)
    uz = iz.astype(jnp.uint32)
    h = (ux * jnp.uint32(0x27D4EB2D)) ^ (uy * jnp.uint32(0x165667B1)) \
        ^ (uz * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    return (h & 15).astype(jnp.int32)


def _grad(ix, iy, iz, dx, dy, dz):
    """pbrt Grad (texture.cpp:446): 16 gradient directions by hash."""
    h = _hash3(ix, iy, iz)
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    u = jnp.where((h & 1) != 0, -u, u)
    v = jnp.where((h & 2) != 0, -v, v)
    return u + v


def _noise_weight(t):
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def noise3(px, py, pz):
    """Band-limited gradient noise in [-1, 1]; inputs any shape."""
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    iz = jnp.floor(pz)
    dx, dy, dz = px - ix, py - iy, pz - iz
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)
    w000 = _grad(ix, iy, iz, dx, dy, dz)
    w100 = _grad(ix + 1, iy, iz, dx - 1, dy, dz)
    w010 = _grad(ix, iy + 1, iz, dx, dy - 1, dz)
    w110 = _grad(ix + 1, iy + 1, iz, dx - 1, dy - 1, dz)
    w001 = _grad(ix, iy, iz + 1, dx, dy, dz - 1)
    w101 = _grad(ix + 1, iy, iz + 1, dx - 1, dy, dz - 1)
    w011 = _grad(ix, iy + 1, iz + 1, dx, dy - 1, dz - 1)
    w111 = _grad(ix + 1, iy + 1, iz + 1, dx - 1, dy - 1, dz - 1)
    wx = _noise_weight(dx)
    wy = _noise_weight(dy)
    wz = _noise_weight(dz)
    x00 = w000 + wx * (w100 - w000)
    x10 = w010 + wx * (w110 - w010)
    x01 = w001 + wx * (w101 - w001)
    x11 = w011 + wx * (w111 - w011)
    y0 = x00 + wy * (x10 - x00)
    y1 = x01 + wy * (x11 - x01)
    return y0 + wz * (y1 - y0)


def noise_p(p):
    return noise3(p[..., 0], p[..., 1], p[..., 2])


_MAX_OCTAVES = 8


def fbm(p, omega, octaves):
    """texture.cpp:FBm without differentials: fixed octave count."""
    total = jnp.zeros(p.shape[:-1])
    lam = 1.0
    o = 1.0
    for i in range(_MAX_OCTAVES):
        contrib = o * noise_p(p * lam)
        total = total + jnp.where(i < octaves, contrib, 0.0)
        lam = lam * 1.99
        o = o * omega
    return total


def turbulence(p, omega, octaves):
    total = jnp.zeros(p.shape[:-1])
    lam = 1.0
    o = 1.0
    for i in range(_MAX_OCTAVES):
        contrib = o * jnp.abs(noise_p(p * lam))
        total = total + jnp.where(i < octaves, contrib, 0.0)
        lam = lam * 1.99
        o = o * omega
    return total


# Marble spline colors (textures/marble.cpp:Evaluate).
_MARBLE_C = np.array([
    [.58, .58, .6], [.58, .58, .6], [.58, .58, .6],
    [.5, .5, .5], [.6, .59, .58], [.58, .58, .6],
    [.58, .58, .6], [.2, .2, .33], [.58, .58, .6],
], np.float32)


def _marble(p, octaves, omega, scale, variation):
    ps = p * scale[..., None]
    marble = ps[..., 1] + variation * fbm(ps, omega, octaves)
    t = 0.5 + 0.5 * jnp.sin(marble)
    nseg = _MARBLE_C.shape[0] - 3
    first = jnp.clip(jnp.floor(t * nseg).astype(jnp.int32), 0, nseg - 1)
    tt = t * nseg - first.astype(jnp.float32)
    c = jnp.asarray(_MARBLE_C)
    c0 = jnp.take(c, first, axis=0)
    c1 = jnp.take(c, first + 1, axis=0)
    c2 = jnp.take(c, first + 2, axis=0)
    c3 = jnp.take(c, first + 3, axis=0)
    # Bezier via de Casteljau (marble.cpp:60-67), scaled by 1.5.
    tt = tt[..., None]
    s0 = (1 - tt) * c0 + tt * c1
    s1 = (1 - tt) * c1 + tt * c2
    s2 = (1 - tt) * c2 + tt * c3
    s0 = (1 - tt) * s0 + tt * s1
    s1 = (1 - tt) * s1 + tt * s2
    return 1.5 * ((1 - tt) * s0 + tt * s1)


def _dots(uvs, inside, outside):
    """textures/dots.cpp: noise-placed dots in uv cells."""
    s, t = uvs[..., 0], uvs[..., 1]
    s_cell = jnp.floor(s + 0.5)
    t_cell = jnp.floor(t + 0.5)
    have_dot = noise3(s_cell + 0.5, t_cell + 0.5,
                      jnp.full_like(s_cell, 0.5)) > 0
    radius = 0.35
    max_shift = 0.5 - radius
    z = jnp.full_like(s_cell, 0.5)
    s_center = s_cell + max_shift * noise3(s_cell + 1.5, t_cell + 2.8, z)
    t_center = t_cell + max_shift * noise3(t_cell + 4.5, s_cell + 9.2, z)
    ds = s - s_center
    dt = t - t_center
    in_dot = have_dot & (ds * ds + dt * dt < radius * radius)
    return jnp.where(in_dot[..., None], inside, outside)


def _bilinear_level(table: TextureTable, tid, uvs, level):
    """Bilinear sample of one mip level per lane (wrap addressing)."""
    w = table.tex_mip_w[tid, level]
    h = table.tex_mip_h[tid, level]
    off = table.tex_mip_offset[tid, level]
    u = uvs[..., 0] * w.astype(jnp.float32) - 0.5
    # pbrt flips v for images (imagemap.cpp: (1-t)).
    v = (1.0 - uvs[..., 1]) * h.astype(jnp.float32) - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    def texel(iu, iv):
        iu = jnp.mod(iu.astype(jnp.int32), jnp.maximum(w, 1))
        iv = jnp.mod(iv.astype(jnp.int32), jnp.maximum(h, 1))
        return table.atlas[off + iv * w + iu]

    return (
        texel(u0, v0) * ((1 - fu) * (1 - fv))[..., None]
        + texel(u0 + 1, v0) * (fu * (1 - fv))[..., None]
        + texel(u0, v0 + 1) * ((1 - fu) * fv)[..., None]
        + texel(u0 + 1, v0 + 1) * (fu * fv)[..., None]
    )


EWA_TAPS = 8       # taps along the major axis
EWA_MAX_ANISO = 8  # mipmap.h MaxAnisotropy default


def has_image_textures(table: TextureTable) -> bool:
    """Static check: any image rows?  Gates the per-hit anisotropic
    footprint computation (render/intersect.py want_axes)."""
    if table.kinds_static is not None:
        return KIND_IMAGE in table.kinds_static
    try:
        return bool(np.any(np.asarray(table.tex_kind) == KIND_IMAGE))
    except Exception:  # traced table without kinds_static: keep the path
        return True


def _trilinear(table: TextureTable, tid, uvs, minor):
    """Two-level mip blend at footprint `minor` (uv units)."""
    w = table.tex_width[tid]
    h = table.tex_height[tid]
    res = jnp.maximum(w, h).astype(jnp.float32)
    lod = jnp.log2(jnp.maximum(minor * res, 1e-6))
    lod = jnp.clip(lod, 0.0,
                   (table.tex_n_mips[tid] - 1).astype(jnp.float32))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, table.tex_n_mips[tid] - 1)
    fl = (lod - l0.astype(jnp.float32))[..., None]
    return (1.0 - fl) * _bilinear_level(table, tid, uvs, l0) \
        + fl * _bilinear_level(table, tid, uvs, l1)


def _ewa_lookup(table: TextureTable, tid, uvs, duv_major, duv_minor):
    """Anisotropic footprint filtering (core/mipmap.h:EWA equivalent).

    TPU shape: pbrt walks every texel in the ellipse's bounding box with
    a per-texel Gaussian weight -- a data-dependent loop.  Here the
    ellipse is integrated by EWA_TAPS Gaussian-weighted TRILINEAR taps
    spaced along the major axis, each filtered at the minor-axis width
    (the hardware-style anisotropic filter).  Equal quality on the
    grazing-checker test, and the cost is statically bounded at
    EWA_TAPS x 8 gathers/lane.

    duv_major/duv_minor: [R,2] uv-space footprint axes (pbrt's
    dst0/dst1 after the swap at mipmap.h:Lookup).
    """
    maj = jnp.linalg.norm(duv_major, axis=-1)
    mino = jnp.linalg.norm(duv_minor, axis=-1)
    swap = mino > maj
    maj2 = jnp.where(swap, mino, maj)
    min2 = jnp.where(swap, maj, mino)
    dmaj = jnp.where(swap[..., None], duv_minor, duv_major)
    # Eccentricity clamp (mipmap.h: if minor*maxAniso < major, scale
    # minor up -> blurs rather than aliases past the anisotropy cap).
    min2 = jnp.maximum(min2, maj2 / EWA_MAX_ANISO)
    # Gaussian-spaced tap offsets in [-1, 1] along the major axis.
    ts = (jnp.arange(EWA_TAPS, dtype=jnp.float32) + 0.5) / EWA_TAPS * 2.0 - 1.0
    wts = jnp.exp(-2.0 * ts * ts)  # alpha=2 Gaussian (mipmap.h:EWA)
    wts = wts / wts.sum()
    out = 0.0
    for k in range(EWA_TAPS):
        uv_k = uvs + dmaj * ts[k]
        out = out + wts[k] * _trilinear(table, tid, uv_k, min2)
    return out


def _base_value(table: TextureTable, tid, kind, uvs, p, uv_fp=None,
                uv_axes=None):
    """Evaluate all non-combinator kinds for every lane, select by kind.

    uv_fp: optional [R] uv-space footprint (ray-cone width) driving the
    trilinear mip blend (core/mipmap.h:Lookup width path).
    uv_axes: optional [R,2,2] anisotropic footprint (major/minor uv
    axes); when given, image lanes use the EWA-equivalent path."""
    w = table.tex_width[tid]
    h = table.tex_height[tid]
    par = table.tex_par[tid]
    octaves = par[..., 0]
    omega = par[..., 1]

    if uv_axes is not None:
        # EWA-equivalent anisotropic path; the axes already include the
        # uvscale factor applied by the caller.
        img = _ewa_lookup(table, tid, uvs, uv_axes[..., 0, :],
                          uv_axes[..., 1, :])
    elif uv_fp is None:
        img = _bilinear_level(table, tid, uvs,
                              jnp.zeros_like(tid, dtype=jnp.int32))
    else:
        # mipmap.h: level = nLevels-1 + log2(max(width, eps)); trilinear
        # blend of the two bracketing levels.
        img = _trilinear(table, tid, uvs, uv_fp)

    # Checkerboard (textures/checkerboard.cpp 2D mode).
    cu = jnp.floor(uvs[..., 0]).astype(jnp.int32)
    cv = jnp.floor(uvs[..., 1]).astype(jnp.int32)
    even = ((cu + cv) % 2) == 0
    checker = jnp.where(
        even[..., None], table.tex_p0[tid], table.tex_p1[tid]
    )

    out = jnp.where((kind == KIND_CHECKER)[..., None], checker, img)
    out = jnp.where((kind == KIND_CONSTANT)[..., None],
                    table.tex_p0[tid], out)
    out = jnp.where(
        (kind == KIND_UV)[..., None],
        jnp.stack([uvs[..., 0] % 1.0, uvs[..., 1] % 1.0,
                   jnp.zeros_like(uvs[..., 0])], -1),
        out,
    )
    fu_b = uvs[..., 0:1] % 1.0
    fv_b = uvs[..., 1:2] % 1.0
    bilerp = ((1 - fu_b) * (1 - fv_b) * table.tex_p0[tid]
              + (1 - fu_b) * fv_b * table.tex_p1[tid]
              + fu_b * (1 - fv_b) * table.tex_p2[tid]
              + fu_b * fv_b * table.tex_p3[tid])
    out = jnp.where((kind == KIND_BILERP)[..., None], bilerp, out)
    out = jnp.where(
        (kind == KIND_DOTS)[..., None],
        _dots(uvs, table.tex_p2[tid], table.tex_p3[tid]), out,
    )

    # 3-D noise kinds (evaluated only when present in the table).
    kinds_present = None
    if table.kinds_static is not None:
        kinds_present = set(table.kinds_static)
    else:
        try:
            kinds_present = set(np.asarray(table.tex_kind).tolist())
        except Exception:
            pass  # traced table without kinds_static: evaluate everything

    def present(k):
        return kinds_present is None or k in kinds_present

    if present(KIND_FBM):
        out = jnp.where((kind == KIND_FBM)[..., None],
                        fbm(p, omega, octaves)[..., None], out)
    if present(KIND_WRINKLED):
        out = jnp.where((kind == KIND_WRINKLED)[..., None],
                        turbulence(p, omega, octaves)[..., None], out)
    if present(KIND_WINDY):
        wind = fbm(0.1 * p, 0.5, 3)
        wave = fbm(p, 0.5, 6)
        out = jnp.where((kind == KIND_WINDY)[..., None],
                        (jnp.abs(wind) * wave)[..., None], out)
    if present(KIND_MARBLE):
        out = jnp.where(
            (kind == KIND_MARBLE)[..., None],
            _marble(p, octaves, omega, par[..., 2], par[..., 3]), out,
        )
    return out


def sample_texture(table: TextureTable, tex_id: Array, uv: Array,
                   p: Array | None = None, uv_fp: Array | None = None,
                   uv_axes: Array | None = None) -> Array:
    """Texture sample per lane: tex_id [R] (>=0), uv [R,2], p [R,3]
    world position for 3-D noise textures, uv_fp [R] ray-cone footprint
    in uv units for the mip blend, uv_axes [R,2,2] optional anisotropic
    footprint (major/minor uv axes) enabling the EWA-equivalent filter.

    Lanes with tex_id < 0 return 1.0 (callers multiply by a base color).
    """
    if p is None:
        p = jnp.zeros(uv.shape[:-1] + (3,))
    tid = jnp.maximum(tex_id, 0)
    kind = table.tex_kind[tid]
    uvs = uv * table.tex_uvscale[tid]
    axes_tid = (uv_axes * table.tex_uvscale[tid][..., None, :]
                if uv_axes is not None else None)
    out = _base_value(table, tid, kind, uvs, p, uv_fp, axes_tid)

    if table.has_children:
        # One combinator level: scale / mix evaluate their children
        # (themselves base textures) and blend.
        c0 = jnp.maximum(table.tex_child[tid][..., 0], 0)
        c1 = jnp.maximum(table.tex_child[tid][..., 1], 0)
        k0 = table.tex_kind[c0]
        k1 = table.tex_kind[c1]
        uv0 = uv * table.tex_uvscale[c0]
        uv1 = uv * table.tex_uvscale[c1]
        ax0 = (uv_axes * table.tex_uvscale[c0][..., None, :]
               if uv_axes is not None else None)
        ax1 = (uv_axes * table.tex_uvscale[c1][..., None, :]
               if uv_axes is not None else None)
        v0 = _base_value(table, c0, k0, uv0, p, uv_fp, ax0)
        v1 = _base_value(table, c1, k1, uv1, p, uv_fp, ax1)
        has0 = table.tex_child[tid][..., 0] >= 0
        has1 = table.tex_child[tid][..., 1] >= 0
        v0 = jnp.where(has0[..., None], v0, table.tex_p0[tid])
        v1 = jnp.where(has1[..., None], v1, table.tex_p1[tid])
        scale = v0 * table.tex_p0[tid]
        amt = table.tex_par[tid][..., 0:1]
        mix = (1.0 - amt) * v0 + amt * v1
        out = jnp.where((kind == KIND_SCALE)[..., None], scale, out)
        out = jnp.where((kind == KIND_MIX)[..., None], mix, out)

    return jnp.where((tex_id < 0)[..., None], 1.0, out)
