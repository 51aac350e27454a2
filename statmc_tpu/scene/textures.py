"""Texture system: image atlas + procedural textures, SoA for TPU.

The reference's texture plugins (src/textures/, src/core/texture.h,
src/core/mipmap.h) evaluate per-intersection through virtual
Texture::Evaluate.  Here every image texture is packed into one flat
texel atlas with a (offset, width, height) row per texture; lookups are
batched bilinear gathers over ray lanes.  Procedural textures
(checkerboard, scale, mix, constant) are folded at build time where
possible and evaluated branchlessly otherwise.

MIPmapping/EWA (mipmap.h) requires ray differentials through the fused
bounce kernel and is deferred (trilinear level-0 only, like pbrt's
"trilinear" fast path with width 0).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

TEX_NONE = -1
# Kinds for evaluated textures.
KIND_IMAGE = 0
KIND_CHECKER = 1
KIND_SCALE = 2


class TextureTable(NamedTuple):
    atlas: Array  # [T,3] flat texels of all images
    tex_offset: Array  # [N] first texel index
    tex_width: Array  # [N]
    tex_height: Array  # [N]
    tex_kind: Array  # [N]
    tex_p0: Array  # [N,3] checker tex1 rgb / scale factor
    tex_p1: Array  # [N,3] checker tex2 rgb
    tex_uvscale: Array  # [N,2] uscale, vscale

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
            tex_uvscale=jnp.ones((1, 2)),
        )


class TextureTableBuilder:
    def __init__(self):
        self.texels: list[np.ndarray] = []
        self.rows: list[dict] = []
        self._cache: dict[str, int] = {}

    def add_image(self, path: str, uscale=1.0, vscale=1.0) -> int:
        key = f"img:{path}:{uscale}:{vscale}"
        if key in self._cache:
            return self._cache[key]
        from ..io.image import read_image

        try:
            img = read_image(path)
        except (OSError, ValueError):
            return TEX_NONE
        offset = sum(t.shape[0] for t in self.texels)
        self.texels.append(img.reshape(-1, 3).astype(np.float32))
        self.rows.append(dict(
            offset=offset, width=img.shape[1], height=img.shape[0],
            kind=KIND_IMAGE, p0=np.ones(3, np.float32),
            p1=np.zeros(3, np.float32),
            uv=np.array([uscale, vscale], np.float32),
        ))
        tid = len(self.rows) - 1
        self._cache[key] = tid
        return tid

    def add_checker(self, rgb1, rgb2, uscale=1.0, vscale=1.0) -> int:
        self.rows.append(dict(
            offset=0, width=1, height=1, kind=KIND_CHECKER,
            p0=np.asarray(rgb1, np.float32), p1=np.asarray(rgb2, np.float32),
            uv=np.array([uscale, vscale], np.float32),
        ))
        return len(self.rows) - 1

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
            tex_uvscale=jnp.asarray(np.stack([r["uv"] for r in self.rows])),
        )


def sample_texture(table: TextureTable, tex_id: Array, uv: Array) -> Array:
    """Bilinear texture sample per lane: tex_id [R] (>=0), uv [R,2].

    Lanes with tex_id < 0 return 1.0 (callers multiply by a base color).
    """
    tid = jnp.maximum(tex_id, 0)
    kind = table.tex_kind[tid]
    w = table.tex_width[tid]
    h = table.tex_height[tid]
    off = table.tex_offset[tid]
    uvs = uv * table.tex_uvscale[tid]

    # Image: bilinear with wrap (pbrt ImageWrap::Repeat default).
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

    img = (
        texel(u0, v0) * ((1 - fu) * (1 - fv))[..., None]
        + texel(u0 + 1, v0) * (fu * (1 - fv))[..., None]
        + texel(u0, v0 + 1) * ((1 - fu) * fv)[..., None]
        + texel(u0 + 1, v0 + 1) * (fu * fv)[..., None]
    )

    # Checkerboard (textures/checkerboard.cpp 2D mode).
    cu = jnp.floor(uvs[..., 0]).astype(jnp.int32)
    cv = jnp.floor(uvs[..., 1]).astype(jnp.int32)
    even = ((cu + cv) % 2) == 0
    checker = jnp.where(
        even[..., None], table.tex_p0[tid], table.tex_p1[tid]
    )

    out = jnp.where((kind == KIND_CHECKER)[..., None], checker, img)
    return jnp.where((tex_id < 0)[..., None], 1.0, out)
