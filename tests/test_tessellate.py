"""Shape tessellation (scene/tessellate.py): every non-triangle pbrt
shape becomes triangles feeding the fused intersector."""
import numpy as np

from statmc_tpu.scene import tessellate as TS
from statmc_tpu.scene.params import ParamSet


def _ps(**kv):
    p = ParamSet()
    for k, (decl, vals) in kv.items():
        p.add(f"{decl} {k}", vals)
    return p


def test_disk_geometry():
    p = _ps(radius=("float", [2.0]), height=("float", [0.5]),
            innerradius=("float", [1.0]))
    P, N, UV, idx = TS.disk(p)
    assert np.allclose(P[:, 2], 0.5)
    r = np.linalg.norm(P[:, :2], axis=-1)
    assert r.min() >= 1.0 - 1e-5 and r.max() <= 2.0 + 1e-5
    assert np.allclose(N, [0, 0, 1])
    assert idx.shape[1] == 3 and idx.max() < P.shape[0]


def test_cylinder_normals_radial():
    p = _ps(radius=("float", [1.5]), zmin=("float", [-1.0]),
            zmax=("float", [2.0]))
    P, N, UV, idx = TS.cylinder(p)
    assert np.allclose(np.linalg.norm(P[:, :2], axis=-1), 1.5, atol=1e-5)
    assert P[:, 2].min() == -1.0 and P[:, 2].max() == 2.0
    # Radial normals.
    assert np.allclose(N[:, :2] * 1.5, P[:, :2], atol=1e-5)


def test_cone_apex():
    p = _ps(radius=("float", [1.0]), height=("float", [2.0]))
    P, N, UV, idx = TS.cone(p)
    top = P[np.isclose(P[:, 2], 2.0)]
    assert np.allclose(np.linalg.norm(top[:, :2], axis=-1), 0.0, atol=1e-5)
    assert np.allclose(np.linalg.norm(N, axis=-1), 1.0, atol=1e-4)


def test_loopsubdiv_refines():
    # Tetrahedron: each level multiplies faces by 4.
    P = [0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1]
    I = [0, 1, 2, 0, 1, 3, 0, 2, 3, 1, 2, 3]
    p = _ps(P=("point", P), indices=("integer", I),
            levels=("integer", [2]))
    Pv, N, UV, idx = TS.loopsubdiv(p)
    assert idx.shape[0] == 4 * 16
    assert np.isfinite(Pv).all()


def test_curve_ribbon():
    cps = [0, 0, 0, 0.3, 0.5, 0, 0.7, 0.5, 0, 1, 0, 0]
    p = _ps(P=("point", cps), width0=("float", [0.1]),
            width1=("float", [0.02]), type=("string", ["flat"]))
    P, N, UV, idx = TS.curve(p)
    assert P.shape[0] == 2 * (TS.CURVE_SEGMENTS + 1)
    # Strip width tapers from ~0.1 to ~0.02.
    first_w = np.linalg.norm(P[1] - P[0])
    last_w = np.linalg.norm(P[-1] - P[-2])
    assert np.isclose(first_w, 0.1, atol=1e-5)
    assert np.isclose(last_w, 0.02, atol=1e-5)


def test_heightfield_grid():
    p = _ps(nu=("integer", [3]), nv=("integer", [2]),
            Pz=("float", [0, 1, 2, 3, 4, 5]))
    P, N, UV, idx = TS.heightfield(p)
    assert P.shape[0] == 6
    assert idx.shape[0] == 2 * 2 * 1


def test_nurbs_plane():
    # Degree-3 flat patch: all control z=0 -> tessellation is planar.
    nu = nv = 4
    uk = [0, 0, 0, 0, 1, 1, 1, 1]
    P = []
    for j in range(nv):
        for i in range(nu):
            P += [i / 3.0, j / 3.0, 0.0]
    p = _ps(nu=("integer", [nu]), nv=("integer", [nv]),
            uorder=("integer", [4]), vorder=("integer", [4]),
            uknots=("float", uk), vknots=("float", uk),
            P=("point", P))
    Pv, N, UV, idx = TS.nurbs(p)
    assert np.allclose(Pv[:, 2], 0.0, atol=1e-5)
    assert np.isfinite(Pv).all()


def test_scene_with_tessellated_shapes_renders():
    import tempfile

    from statmc_tpu.driver import load

    text = (
        'Integrator "statpath" "integer maxdepth" [2] '
        '"integer iterations" [1] "bool denoiseimage" ["false"] '
        '"bool calcstats" ["false"]\n'
        'Sampler "random" "integer pixelsamples" [2]\n'
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]\n'
        "LookAt 0 2 -5  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" [60]\n'
        "WorldBegin\n"
        'Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
        # pbrt disks lie in the xy-plane at z=height; rotate for a floor.
        "AttributeBegin\nRotate -90 1 0 0\n"
        'Shape "disk" "float radius" [3] "float height" [1]\n'
        "AttributeEnd\n"
        'AttributeBegin\nRotate -90 1 0 0\n'
        'Shape "cylinder" "float radius" [0.5] "float zmin" [-1] '
        '"float zmax" [1]\nAttributeEnd\n'
        'AttributeBegin\nTranslate 1.5 -1 0\nRotate -90 1 0 0\n'
        'Shape "cone" "float radius" [0.5] "float height" [1]\n'
        "AttributeEnd\n"
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [10 10 10]\n'
        'Translate 0 4 0\nRotate 90 1 0 0\n'
        'Shape "disk" "float radius" [1]\n'
        "AttributeEnd\n"
        "WorldEnd\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".pbrt", delete=False) as f:
        f.write(text)
        path = f.name
    r = load(path)
    assert r.s.scene.tri_p0.shape[0] > 100  # tessellated geometry landed
    r.render(iterations=1, verbose=False)
    img = np.asarray(r.film_mean)
    assert np.isfinite(img).all()
    assert img.mean() > 0  # the disk area light illuminates the scene
