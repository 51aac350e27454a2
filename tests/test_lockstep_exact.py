"""Exact lockstep replay: full-stream positional parity.

The reference consumes sampler draws conditionally (a path that
terminates early stops drawing), so the serial PCG32 position of every
draw depends on every preceding sample's control flow in the tile
(src/samplers/random.cpp:68 one serial rng per tile;
src/core/sampler.cpp:79 SetSampleNumber never touches the rng).  These
tests prove the exact replay (render/lockstep_exact.py) reproduces
those positions across a multi-sample tile with MIXED path lengths:

  escape pixel:  5 draws/sample (camera only)
  mirror pixel:  7 draws/sample (camera + specular continuation;
                 NEE skipped per statpath.cpp:846 NumComponents guard)
  matte pixel:  12 draws/sample (camera + NEE 5 + continuation 2)

at maxdepth=1 (bounce 1 never shades), no RR (starts at bounce 4).
The expected positions are analytic from the geometry; the consumed
values are checked bit-exactly against the host PCG32 stream.
"""
from __future__ import annotations

import numpy as np
import pytest

from statmc_tpu.core import lockstep as LS


def _scene_text(width, height, spp):
    return (
        'Integrator "statpath" "integer maxdepth" [1] '
        '"integer iterations" [1] "bool expiterations" ["false"] '
        '"bool denoiseimage" ["false"] "bool calcstats" ["false"]\n'
        f'Sampler "random" "integer pixelsamples" [{spp}]\n'
        f'Film "image" "integer xresolution" [{width}] '
        f'"integer yresolution" [{height}] "string filename" ["x.pfm"]\n'
        "LookAt 0 0 -2  0 0 0  0 1 0\n"
        'Camera "orthographic" "float screenwindow" [-1 1 -1 1]\n'
        "WorldBegin\n"
        'LightSource "point" "rgb I" [10 10 10] "point from" [0 0 -0.5]\n'
        # Matte wall: screen/world x in [-1.2, 0] (raster x < W/2).
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" '
        "[-1.2 -1.2 1  0 -1.2 1  0 1.2 1  -1.2 1.2 1]\n"
        # Mirror strip: x in [0, 0.5] (raster W/2 .. 3W/4), nearer.
        'Material "mirror" "rgb Kr" [0.9 0.9 0.9]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] "point P" '
        "[0 -1.2 0.9  0.5 -1.2 0.9  0.5 1.2 0.9  0 1.2 0.9]\n"
        "WorldEnd\n"
    )


def _consumption_class(width, height):
    """Per-pixel draws/sample from the analytic scene geometry.

    Screen x = -1 + 2 * raster_x / width; matte x <= 0, mirror (0, 0.5],
    escape beyond -- i.e. raster thirds at W/2 and 3W/4."""
    xs = np.arange(width * height) % width
    cls = np.full(width * height, 12, np.int64)  # matte
    cls[xs >= width // 2] = 7                    # mirror
    cls[xs >= (3 * width) // 4] = 5              # escape
    return cls


def _expected_cursors(width, height, spp, consume):
    """Serial replay of the cursor per tile: pixels row-major within
    cropped tile bounds, samples back-to-back."""
    tid, idx_in_tile, n_tx, n_ty = LS._tile_geometry(width, height)
    P = width * height
    start = np.zeros((P, spp), np.int64)
    end = np.zeros((P, spp), np.int64)
    for t in range(n_tx * n_ty):
        pix = np.nonzero(tid == t)[0]
        pix = pix[np.argsort(idx_in_tile[pix])]
        cur = 0
        for p in pix:
            for s in range(spp):
                start[p, s] = cur
                cur += consume[p]
                end[p, s] = cur
    return start, end


def _load(tmp_path, width, height, spp):
    from statmc_tpu.driver import load

    path = tmp_path / "exact.pbrt"
    path.write_text(_scene_text(width, height, spp))
    return load(str(path))


@pytest.mark.parametrize("width,height,spp", [(16, 8, 4)])
def test_positional_parity_multi_sample_tile(tmp_path, width, height, spp):
    r = _load(tmp_path, width, height, spp)
    rep = r.render_lockstep_exact(spp=spp)

    consume = _consumption_class(width, height)
    exp_start, exp_end = _expected_cursors(width, height, spp, consume)
    np.testing.assert_array_equal(rep.cursor_start, exp_start)
    np.testing.assert_array_equal(rep.cursor_end, exp_end)

    # The camera jitter consumed at each position must be bit-identical
    # to the host PCG32 stream at that serial position.
    stream, pot, npx = LS.make_streams(width, height, spp, 1, base_seed=0)
    tid, _, _, _ = LS._tile_geometry(width, height)
    for p in range(width * height):
        for s in range(spp):
            pos = exp_start[p, s]
            np.testing.assert_array_equal(
                rep.u_cam[p, s], stream[tid[p], pos : pos + 2])

    # Physics sanity: matte pixels lit, escape pixels black.
    xs = np.arange(width * height) % width
    assert (rep.film[xs < width // 2].sum(-1) > 0).all()
    assert (rep.film[xs >= (3 * width) // 4] == 0).all()


def test_cropped_tiles_have_independent_streams(tmp_path):
    """24x8: tile 0 is 16 wide, tile 1 is cropped to 8 wide; each tile
    consumes its own serial stream with its own seed."""
    width, height, spp = 24, 8, 2
    r = _load(tmp_path, width, height, spp)
    rep = r.render_lockstep_exact(spp=spp)

    consume = _consumption_class(width, height)
    exp_start, exp_end = _expected_cursors(width, height, spp, consume)
    np.testing.assert_array_equal(rep.cursor_start, exp_start)
    np.testing.assert_array_equal(rep.cursor_end, exp_end)

    stream, _, _ = LS.make_streams(width, height, spp, 1, base_seed=0)
    tid, _, _, _ = LS._tile_geometry(width, height)
    assert tid.max() == 1
    for p in range(width * height):
        pos = exp_start[p, 0]
        np.testing.assert_array_equal(
            rep.u_cam[p, 0], stream[tid[p], pos : pos + 2])
    # The two tiles' streams differ (different SetSequence seeds).
    assert not np.array_equal(stream[0, :16], stream[1, :16])
