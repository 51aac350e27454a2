"""Texture subsystem tests: TGA/PNG readers, atlas sampling, and a
textured render."""
import os
import struct
import tempfile
import zlib

import numpy as np
import jax.numpy as jnp

from statmc_tpu.io.image import read_png, read_tga, srgb_to_linear
from statmc_tpu.scene.textures import (
    TextureTableBuilder, sample_texture,
)


def _write_tga(path, img8):
    """img8: [H,W,3] uint8 RGB."""
    h, w = img8.shape[:2]
    hdr = bytearray(18)
    hdr[2] = 2  # uncompressed true color
    hdr[12:14] = struct.pack("<H", w)
    hdr[14:16] = struct.pack("<H", h)
    hdr[16] = 24
    hdr[17] = 0x20  # top-left origin
    bgr = img8[..., ::-1]
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(np.ascontiguousarray(bgr).tobytes())


def _write_png(path, img8):
    h, w = img8.shape[:2]
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(img8[y]).tobytes() for y in range(h)
    )

    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def test_tga_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img8 = (rng.random((7, 9, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.tga")
    _write_tga(p, img8)
    back = read_tga(p)
    np.testing.assert_allclose(
        back, srgb_to_linear(img8.astype(np.float32) / 255.0), atol=1e-6
    )


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img8 = (rng.random((6, 5, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    _write_png(p, img8)
    back = read_png(p)
    np.testing.assert_allclose(
        back, srgb_to_linear(img8.astype(np.float32) / 255.0), atol=1e-6
    )


def test_atlas_bilinear_sampling(tmp_path):
    img8 = np.zeros((2, 2, 3), np.uint8)
    img8[0, 0] = [255, 0, 0]
    img8[1, 1] = [0, 0, 255]
    p = str(tmp_path / "t.tga")
    _write_tga(p, img8)
    b = TextureTableBuilder()
    tid = b.add_image(p)
    table = b.build()
    # Sample texel centers: uv (0.25, 0.75) hits the top-left texel
    # (v flipped: v=0.75 -> row 0).
    uv = jnp.array([[0.25, 0.75], [0.75, 0.25]])
    out = np.asarray(sample_texture(table, jnp.array([tid, tid]), uv))
    assert out[0, 0] > 0.9 and out[0, 2] < 0.1  # red texel
    assert out[1, 2] > 0.9 and out[1, 0] < 0.1  # blue texel
    # tex_id -1 returns 1.
    one = np.asarray(sample_texture(table, jnp.array([-1]), uv[:1]))
    np.testing.assert_allclose(one, 1.0)


def test_checker_texture():
    b = TextureTableBuilder()
    tid = b.add_checker([1, 0, 0], [0, 1, 0], uscale=2, vscale=2)
    table = b.build()
    uv = jnp.array([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6]])
    out = np.asarray(sample_texture(table, jnp.full((3,), tid), uv))
    np.testing.assert_allclose(out[0], [1, 0, 0])  # (0,0) even
    np.testing.assert_allclose(out[1], [0, 1, 0])  # (1,0) odd
    np.testing.assert_allclose(out[2], [1, 0, 0])  # (1,1) even


def test_textured_render(tmp_path):
    """Kd imagemap drives the rendered color: half red, half green quad."""
    img8 = np.zeros((1, 2, 3), np.uint8)
    img8[0, 0] = [255, 0, 0]
    img8[0, 1] = [0, 255, 0]
    _write_tga(str(tmp_path / "split.tga"), img8)
    scene = (
        'Integrator "statpath" "integer maxdepth" [1] '
        '"integer iterations" [1] "bool calcstats" ["true"]\n'
        'Sampler "random" "integer pixelsamples" [8]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8] '
        '"string filename" ["t.pfm"]\n'
        'Camera "perspective" "float fov" [40]\n'
        'WorldBegin\n'
        'Texture "split" "spectrum" "imagemap" '
        '"string filename" ["split.tga"]\n'
        'Material "matte" "texture Kd" ["split"]\n'
        # Quad at z=2 with uv: u in [0,1] left->right.
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-3 -3 2  3 -3 2  3 3 2  -3 3 2] '
        '"float uv" [0 0  1 0  1 1  0 1]\n'
        'LightSource "distant" "rgb L" [3.14159 3.14159 3.14159] '
        '"point from" [0 0 0] "point to" [0 0 1]\n'
        'WorldEnd\n'
    )
    sp = str(tmp_path / "s.pbrt")
    with open(sp, "w") as f:
        f.write(scene)
    from statmc_tpu.driver import load

    r = load(sp)
    r.render(iterations=1, verbose=False)
    film = np.asarray(r.film_mean).reshape(8, 8, 3)
    # Bilinear across a 2-texel image is a smooth red->green ramp: the
    # outermost columns are dominated by their texel.
    left = film[:, 0]
    right = film[:, 7]
    assert left[..., 0].mean() > 2 * left[..., 1].mean()  # red end
    assert right[..., 1].mean() > 2 * right[..., 0].mean()  # green end
    # Monotone ramp in the red channel.
    row = film[4, :, 0]
    assert np.all(np.diff(row) < 1e-3)
