"""obj2pbrt / cyhair2pbrt / bsdftest tool coverage
(/root/reference/src/tools/)."""
import struct

import numpy as np


def test_obj2pbrt_roundtrip(tmp_path):
    """OBJ quad + mtl -> pbrt fragment that our own parser renders."""
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 0.8 0.1 0.1\n")
    obj = tmp_path / "s.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v -1 -1 3\nv 1 -1 3\nv 1 1 3\nv -1 1 3\n"
        "vn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\n"
        "usemtl red\n"
        "f 1//1 2//2 3//3 4//4\n"  # quad -> 2 tris via fan
    )
    frag = tmp_path / "frag.pbrt"
    from statmc_tpu.tools.obj2pbrt import convert

    n = convert(str(obj), str(frag))
    assert n == 1
    text = frag.read_text()
    assert '"integer indices" [0 1 2 0 2 3]' in text
    assert 'matte' in text

    scene = tmp_path / "scene.pbrt"
    scene.write_text(
        'Integrator "path" "integer maxdepth" [2]\n'
        'Sampler "random" "integer pixelsamples" [4]\n'
        'Film "image" "integer xresolution" [6] '
        '"integer yresolution" [6]\n'
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'LightSource "point" "rgb I" [10 10 10]\n'
        f'Include "{frag}"\n'
        "WorldEnd\n"
    )
    from statmc_tpu.driver import load

    r = load(str(scene))
    r.render(iterations=1, verbose=False)
    f = np.asarray(r.film_mean)
    assert np.isfinite(f).all()
    assert f[..., 0].mean() > 3 * f[..., 2].mean()  # red wall


def test_cyhair2pbrt_conversion(tmp_path):
    """Synthetic 2-strand HAIR file -> bezier cylinder curves."""
    n_strands, pts_per = 2, 4
    n_points = n_strands * pts_per
    flags = 2 | 4  # points + thickness
    header = (b"HAIR"
              + struct.pack("<IIII", n_strands, n_points, flags,
                            pts_per - 1)
              + struct.pack("<ff", 0.1, 0.0)
              + struct.pack("<fff", 0.5, 0.5, 0.5))
    header = header + b"\0" * (128 - len(header))
    pts = np.arange(n_points * 3, dtype="<f4") * 0.1
    thick = np.full(n_points, 0.02, "<f4")
    hair = tmp_path / "t.hair"
    hair.write_bytes(header + pts.tobytes() + thick.tobytes())

    out = tmp_path / "h.pbrt"
    from statmc_tpu.tools.cyhair2pbrt import convert

    n = convert(str(hair), str(out))
    # 2 strands x 3 segments each.
    assert n == 6
    text = out.read_text()
    assert text.count('Shape "curve"') == 6
    assert '"float width0" [0.02]' in text


def test_bsdftest_consistency():
    """The three rho estimators agree for matte + plastic (the
    bsdftest.cpp pass criterion)."""
    from statmc_tpu.scene import build as sb
    from statmc_tpu.tools.bsdftest import estimate_rho

    for mt in (sb.MAT_MATTE, sb.MAT_PLASTIC):
        u, c, i = estimate_rho(mt, (0.5, 0.5, 0.5), (0.2, 0.2, 0.2),
                               0.3, n=1 << 14)
        spread = np.abs(np.ptp(np.stack([u, c, i]), axis=0)).max()
        assert spread < 0.06, (mt, u, c, i)
