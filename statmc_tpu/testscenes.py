"""Procedural test scenes.

The reference's scene assets (PLY meshes, textures) are downloaded
separately (scripts/_download-scenes.sh) and are not part of the mounted
tree, so benchmarks and the graft entry use procedurally generated
pbrt-format scenes of comparable structure: the staircase proxy mimics
the paper's Fig.-1 scene shape (a room with a staircase of glossy boxes,
a glass sphere, metal rails and one bright area light panel).
"""
from __future__ import annotations

import numpy as np


def _box_tris(lo, hi):
    """12 triangles of an axis-aligned box; outward normals."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = [
        (x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
        (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
    ]
    f = [
        (0, 2, 1), (0, 3, 2),  # z0 face (normal -z)
        (4, 5, 6), (4, 6, 7),  # z1 face (+z)
        (0, 1, 5), (0, 5, 4),  # y0 (-y)
        (3, 6, 2), (3, 7, 6),  # y1 (+y)
        (0, 4, 7), (0, 7, 3),  # x0 (-x)
        (1, 2, 6), (1, 6, 5),  # x1 (+x)
    ]
    return v, f


def _mesh_stmt(verts, faces, indent="  "):
    idx = " ".join(str(i) for fc in faces for i in fc)
    pts = " ".join(f"{c:.4f}" for v in verts for c in v)
    return (
        f'{indent}Shape "trianglemesh" "integer indices" [ {idx} ] '
        f'"point P" [ {pts} ]\n'
    )


def staircase_proxy(n_steps: int = 24, clutter: int = 60,
                    seed: int = 7) -> str:
    """A staircase-like room scene, fully self-contained pbrt text.

    ~(12 * (n_steps + clutter + 6)) triangles + a few spheres; glossy
    substrate steps, matte walls, metal rail, glass sphere, one area
    light -- the material mix of the paper's staircase scene.
    """
    rng = np.random.default_rng(seed)
    out = []
    # Room shell: floor, back wall, side walls (inward-facing normals not
    # required; materials are two-sided for intersection purposes).
    room = [
        ((-8, -0.2, -8), (8, 0.0, 8)),  # floor
        ((-8, 0.0, 7.8), (8, 10.0, 8.0)),  # back wall
        ((-8.2, 0.0, -8), (-8.0, 10.0, 8)),  # left wall
        ((8.0, 0.0, -8), (8.2, 10.0, 8)),  # right wall
        ((-8, 9.8, -8), (8, 10.0, 8)),  # ceiling
    ]
    out.append('Material "matte" "rgb Kd" [0.58 0.57 0.55]\n')
    for lo, hi in room:
        v, f = _box_tris(lo, hi)
        out.append(_mesh_stmt(v, f))

    # Stairs: substrate (glossy wood-like).
    out.append(
        'Material "substrate" "rgb Kd" [0.45 0.30 0.18] '
        '"rgb Ks" [0.04 0.04 0.04] "float uroughness" [0.1] '
        '"float vroughness" [0.1] "bool remaproughness" ["false"]\n'
    )
    for i in range(n_steps):
        y = 0.35 * i
        z = -6.0 + 0.5 * i
        v, f = _box_tris((-3.0, y, z), (0.5, y + 0.35, z + 0.5))
        out.append(_mesh_stmt(v, f))

    # Metal rail spheres.
    out.append(
        'Material "metal" "rgb eta" [0.2 0.92 1.1] "rgb k" [3.9 2.45 2.14] '
        '"float roughness" [0.05] "bool remaproughness" ["false"]\n'
    )
    for i in range(0, n_steps, 3):
        y = 0.35 * i + 1.2
        z = -6.0 + 0.5 * i
        out.append("AttributeBegin\n")
        out.append(f"Translate 0.8 {y:.3f} {z:.3f}\n")
        out.append('Shape "sphere" "float radius" [0.18]\n')
        out.append("AttributeEnd\n")

    # Clutter boxes: matte random colors.
    for _ in range(clutter):
        c = rng.random(3) * 0.7 + 0.1
        p = rng.random(3) * np.array([12, 3, 12]) - np.array([6, 0, 6])
        s = rng.random(3) * 0.8 + 0.2
        out.append(
            f'Material "matte" "rgb Kd" [{c[0]:.3f} {c[1]:.3f} {c[2]:.3f}]\n'
        )
        v, f = _box_tris(tuple(p), tuple(p + s))
        out.append(_mesh_stmt(v, f))

    # Glass sphere.
    out.append('Material "glass" "float index" [1.5]\n')
    out.append("AttributeBegin\nTranslate -1.5 1.0 -3.0\n")
    out.append('Shape "sphere" "float radius" [1.0]\nAttributeEnd\n')

    # Area light panel on the ceiling (wound so the geometric normal
    # points DOWN into the room -- pbrt area lights emit one-sided).
    out.append(
        "AttributeBegin\n"
        'AreaLightSource "diffuse" "rgb L" [18 17 15]\n'
        'Material "matte" "rgb Kd" [0 0 0]\n'
        'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3] '
        '"point P" [-2 9.7 -2  2 9.7 -2  2 9.7 2  -2 9.7 2]\n'
        "AttributeEnd\n"
    )
    body = "".join(out)
    return body


def scene_text(width=512, height=512, spp=4, iterations=5, maxdepth=16,
               denoise=True, filtersd=10.0, filterradius=20,
               body: str | None = None, extra_integrator: str = "") -> str:
    body = body if body is not None else staircase_proxy()
    return (
        f'Integrator "statpath" "integer maxdepth" [{maxdepth}] '
        f'"integer iterations" [{iterations}] '
        f'"bool expiterations" ["true"] '
        f'"bool denoiseimage" ["{"true" if denoise else "false"}"] '
        f'"bool calcstats" ["true"] '
        f'"float filtersd" [{filtersd}] '
        f'"integer filterradius" [{filterradius}] '
        f'"string filterbuffers" ["albedo" "normal"] '
        f'"float filterbuffersds" [0.02 0.1] '
        f'{extra_integrator}\n'
        f'Sampler "random" "integer pixelsamples" [{spp}]\n'
        f'Film "image" "integer xresolution" [{width}] '
        f'"integer yresolution" [{height}] '
        f'"string filename" ["staircase-proxy.pfm"]\n'
        'LookAt 6.5 4.5 -7.5  -1 2.5 0  0 1 0\n'
        'Camera "perspective" "float fov" [55]\n'
        "WorldBegin\n" + body + "WorldEnd\n"
    )
