"""imgtool command parity (tools/imgtool.py vs src/tools/imgtool.cpp)."""
import os
import tempfile

import numpy as np

from statmc_tpu.io.pfm import read_pfm, write_pfm
from statmc_tpu.tools import imgtool


def _tmp(name):
    return os.path.join(tempfile.mkdtemp(), name)


def test_convert_scale_roundtrip():
    a = _tmp("a.pfm")
    b = _tmp("b.pfm")
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    write_pfm(a, img)
    assert imgtool.main(["convert", "--scale", "2", a, b]) == 0
    np.testing.assert_allclose(read_pfm(b), img * 2, rtol=1e-6)


def test_diff_exit_codes(capsys):
    a = _tmp("a.pfm")
    b = _tmp("b.pfm")
    img = np.ones((4, 4, 3), np.float32)
    write_pfm(a, img)
    write_pfm(b, img * 1.5)
    assert imgtool.main(["diff", a, a]) == 0
    assert imgtool.main(["diff", a, b]) == 1
    out = capsys.readouterr().out
    assert "MSE" in out


def test_assemble_merges_crops():
    a = _tmp("a.pfm")
    b = _tmp("b.pfm")
    out = _tmp("o.pfm")
    ia = np.zeros((4, 4, 3), np.float32)
    ia[:2] = 1.0
    ib = np.zeros((4, 4, 3), np.float32)
    ib[2:] = 2.0
    write_pfm(a, ia)
    write_pfm(b, ib)
    assert imgtool.main(["assemble", "--outfile", out, a, b]) == 0
    m = read_pfm(out)
    assert (m[:2] == 1.0).all() and (m[2:] == 2.0).all()


def test_makesky_and_info(capsys):
    sky = _tmp("sky.pfm")
    assert imgtool.main(["makesky", "--resolution", "32", "--outfile",
                         sky, "--elevation", "30"]) == 0
    img = read_pfm(sky)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.max() > 1.0  # sun disc is hot
    assert imgtool.main(["info", sky]) == 0
    assert "resolution 32 x 32" in capsys.readouterr().out


def test_png_roundtrip():
    from statmc_tpu.io.image import read_png, write_png

    p = _tmp("x.png")
    img = np.random.default_rng(1).random((6, 5, 3)).astype(np.float32)
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_allclose(back, img, atol=0.02)  # 8-bit quantized
