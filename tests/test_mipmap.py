"""MIPmapped image textures + ray-cone LOD (scene/textures.py,
core/mipmap.h equivalent)."""
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from statmc_tpu.scene import textures as TX


def _write_checker_png(path, n=64):
    from statmc_tpu.io.image import write_png

    img = np.zeros((n, n, 3), np.float32)
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img[((xs // 1 + ys // 1) % 2) == 0] = 1.0  # 1-texel checker
    write_png(path, img)


def test_mip_pyramid_built_and_top_level_is_average():
    d = tempfile.mkdtemp()
    p = os.path.join(d, "c.png")
    _write_checker_png(p, 64)
    b = TX.TextureTableBuilder()
    tid = b.add_image(p)
    t = b.build()
    n_mips = int(t.tex_n_mips[tid])
    assert n_mips == 7  # 64 -> 1
    # Texel-center uv so the finest-level bilinear doesn't straddle the
    # checker corner (texel centers at (i+0.5)/64).
    uv = jnp.asarray([[8.5 / 64, 8.5 / 64]])
    ids = jnp.asarray([tid], jnp.int32)
    # Huge footprint -> coarsest level = global average (~0.5 for the
    # checker, after sRGB decode somewhat lower).
    wide = TX.sample_texture(t, ids, uv, uv_fp=jnp.asarray([10.0]))
    fine = TX.sample_texture(t, ids, uv, uv_fp=jnp.asarray([1e-6]))
    coarse_val = float(wide[0, 0])
    avg = float(jnp.mean(t.atlas[: 64 * 64, 0]))
    assert abs(coarse_val - avg) < 1e-3
    # Finest level keeps contrast: a point sample is near 0 or 1.
    assert min(abs(float(fine[0, 0]) - 0.0), abs(float(fine[0, 0]) - 1.0)) < 0.3


def test_cone_lod_smooths_distant_checker():
    """End-to-end: with the 1-texel checker floor, distant pixels shade
    toward the mip average instead of aliasing to 0/1."""
    from statmc_tpu.driver import load

    d = tempfile.mkdtemp()
    png = os.path.join(d, "c.png")
    _write_checker_png(png, 64)
    text = (
        'Integrator "statpath" "integer maxdepth" [2] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [8]\n'
        'Film "image" "integer xresolution" [16] "integer yresolution" [16]\n'
        "LookAt 0 0.4 -1  0 0.4 40  0 1 0\n"
        'Camera "perspective" "float fov" [50]\n'
        "WorldBegin\n"
        f'Texture "floor" "spectrum" "imagemap" "string filename" ["{png}"] '
        '"float uscale" [200] "float vscale" [200]\n'
        'Material "matte" "texture Kd" ["floor"]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-50 0 -50  50 0 -50  50 0 50  -50 0 50] '
        '"float uv" [0 0 1 0 1 1 0 1]\n'
        'LightSource "distant" "rgb L" [3 3 3] "point from" [0 1 0] '
        '"point to" [0 0 0]\n'
        "WorldEnd\n"
    )
    sp = os.path.join(d, "s.pbrt")
    open(sp, "w").write(text)
    r = load(sp)
    assert r.s.icfg.cone_spread > 0
    r.render(iterations=1, verbose=False)
    img = np.asarray(r.film_mean).reshape(16, 16, 3)
    assert np.isfinite(img).all()
    # Distant rows (top of image, far floor) must be blended mid-gray,
    # not min/max aliased: their spatial variance collapses.
    far = img[6:8, :, 0]
    near = img[14:16, :, 0]
    lit = img[img.sum(-1) > 0]
    assert lit.size > 0
    assert far.std() < max(near.std(), 1e-9) + 0.05


# --- EWA-equivalent anisotropic filtering (round-2 verdict #8) ----------


def _write_stripes_png(path, n=64):
    """Vertical stripes: value depends only on u (x axis)."""
    from statmc_tpu.io.image import write_png

    img = np.zeros((n, n, 3), np.float32)
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img[(xs % 2) == 0] = 1.0
    write_png(path, img)


def test_ewa_grazing_anisotropy():
    """A footprint long along u (across the stripes) and narrow along v
    must average toward gray, while the isotropic lookup at the minor
    width keeps near-full contrast (mipmap.h:EWA behavior)."""
    d = tempfile.mkdtemp()
    p = os.path.join(d, "s.png")
    _write_stripes_png(p, 64)
    b = TX.TextureTableBuilder()
    tid = b.add_image(p)
    t = b.build()
    ids = jnp.asarray([tid], jnp.int32)
    uv = jnp.asarray([[16.5 / 64, 0.5]])
    # Major axis spans 16 texels along u; minor ~0.25 texel along v.
    axes = jnp.asarray([[[16.0 / 64, 0.0], [0.0, 0.25 / 64]]])
    aniso = float(TX.sample_texture(t, ids, uv, uv_axes=axes)[0, 0])
    iso = float(TX.sample_texture(
        t, ids, uv, uv_fp=jnp.asarray([0.25 / 64]))[0, 0])
    avg = float(jnp.mean(t.atlas[: 64 * 64, 0]))
    # EWA integrates across many stripes -> near the global average.
    assert abs(aniso - avg) < 0.12, (aniso, avg)
    # The isotropic minor-width lookup still sees a single stripe.
    assert min(abs(iso - 0.0), abs(iso - 1.0)) < 0.3, iso


def test_ewa_isotropic_footprint_matches_trilinear():
    """With equal axes the EWA path reduces to the trilinear blend (to
    tap-placement tolerance)."""
    d = tempfile.mkdtemp()
    p = os.path.join(d, "c2.png")
    _write_checker_png(p, 64)
    b = TX.TextureTableBuilder()
    tid = b.add_image(p)
    t = b.build()
    ids = jnp.asarray([tid], jnp.int32)
    uv = jnp.asarray([[0.3, 0.6]])
    w = 4.0 / 64
    axes = jnp.asarray([[[w, 0.0], [0.0, w]]])
    a = float(TX.sample_texture(t, ids, uv, uv_axes=axes)[0, 0])
    tri = float(TX.sample_texture(t, ids, uv, uv_fp=jnp.asarray([w]))[0, 0])
    assert abs(a - tri) < 0.1, (a, tri)


def test_hit_assembly_emits_axes_for_textured_scene():
    """Scenes with image textures materialize Hit.uv_axes; the major
    axis grows as 1/cos at grazing incidence."""
    import jax

    from statmc_tpu.scene.api import parse_scene
    from statmc_tpu.scene.build import build_scene
    from statmc_tpu.render.intersect import intersect_scene

    d = tempfile.mkdtemp()
    png = os.path.join(d, "c3.png")
    _write_checker_png(png, 16)
    sc = (
        'Film "image" "integer xresolution" [4] "integer yresolution" [4]\n'
        'Camera "perspective"\n'
        "WorldBegin\n"
        f'Texture "t" "spectrum" "imagemap" "string filename" ["{png}"]\n'
        'Material "matte" "texture Kd" "t"\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]\n'
        ' "point P" [-5 -1 0  5 -1 0  5 -1 10  -5 -1 10]\n'
        ' "float uv" [0 0  1 0  1 1  0 1]\n'
        "WorldEnd\n"
    )
    sp = os.path.join(d, "s.pbrt")
    open(sp, "w").write(sc)
    st = build_scene(parse_scene(sp)).to_device()
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    dn = jnp.asarray([[0.0, -1.0, 0.02], [0.0, -1.0, 4.0]])
    dn = dn / jnp.linalg.norm(dn, axis=-1, keepdims=True)
    hit = intersect_scene(st, o, dn, jnp.full((2,), 1e30))
    assert hit.uv_axes is not None
    ax = np.asarray(hit.uv_axes)
    maj = np.linalg.norm(ax[:, 0], axis=-1)
    mino = np.linalg.norm(ax[:, 1], axis=-1)
    # Near-normal ray: mild anisotropy; grazing ray: strongly stretched.
    assert maj[1] / max(mino[1], 1e-9) > 3.0
    assert maj[0] / max(mino[0], 1e-9) < maj[1] / max(mino[1], 1e-9)
