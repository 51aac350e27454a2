"""Stage reference scenes for rendering (parity anchor).

The reference distributes its benchmark scenes as
/root/reference/scenes/<name>/scene-stat.pbrt, each beginning with
`Include "../_active.pbrt"` — a symlink the user points at one of the
scenes/*.pbrt configuration files via scripts/activate-config.sh
(reference README "Activating a configuration").  The reference tree is
mounted read-only here, so we cannot create that symlink in place.

stage() reproduces the activation layout in a scratch directory:
  <tmp>/_active.pbrt          <- one of our configs/ files (same schema)
  <tmp>/<name>/               <- symlink to the read-only scene folder
and returns the path <tmp>/<name>/scene-stat.pbrt.  Opening the scene
through the symlinked path makes the parser resolve ../_active.pbrt to
our staged config while every scene asset (geometry includes, textures,
PLY files) resolves into the reference folder unchanged.

This module contains NO copied scene data; it only arranges paths.
"""
from __future__ import annotations

import os
import tempfile

REFERENCE_SCENES = "/root/reference/scenes"
_CONFIG_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "configs")


def reference_available(name: str = "veach-mis") -> bool:
    return os.path.isfile(os.path.join(REFERENCE_SCENES, name,
                                       "scene-stat.pbrt"))


def stage(name: str = "veach-mis", config: str = "render-denoise",
          overrides: dict | None = None, workdir: str | None = None) -> str:
    """Stage reference scene `name` with configs/<config>.pbrt active.

    overrides: optional {param_decl: value_string} appended to the staged
    _active.pbrt as an ExtraParams-visible Integrator/Sampler/Film line
    replacement.  Practical use: shrink resolution / spp for tests
    ("integer xresolution" etc. are read from the scene file itself, so
    resolution overrides are appended AFTER the scene include via the
    returned wrapper).
    """
    scene_dir = os.path.join(REFERENCE_SCENES, name)
    src = os.path.join(scene_dir, "scene-stat.pbrt")
    if not os.path.isfile(src):
        raise FileNotFoundError(src)

    root = workdir or tempfile.mkdtemp(prefix=f"statmc-{name}-")
    cfg = os.path.join(os.path.abspath(_CONFIG_DIR), config + ".pbrt")
    active = os.path.join(root, "_active.pbrt")
    with open(cfg) as f:
        text = f.read()
    if overrides:
        # Config files are flat directive lists; textual substitution on
        # quoted parameter declarations is exact for this schema.
        for decl, value in overrides.items():
            needle = f'"{decl}"'
            lines = []
            for ln in text.splitlines():
                if needle in ln:
                    head = ln.split(needle)[0]
                    lines.append(f'{head}"{decl}" [ {value} ]')
                else:
                    lines.append(ln)
            text = "\n".join(lines)
            if needle not in text:
                text += f'\nExtraParams "extras" "{decl}" [ {value} ]\n'
    with open(active, "w") as f:
        f.write(text)

    # A real directory with per-entry symlinks (NOT a dir symlink): the
    # kernel resolves `scene/../_active.pbrt` through a dir symlink into
    # the read-only reference tree, where _active.pbrt cannot exist.
    link = os.path.join(root, name)
    os.makedirs(link, exist_ok=True)
    for entry in os.listdir(scene_dir):
        dst = os.path.join(link, entry)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(scene_dir, entry), dst)
    return os.path.join(link, "scene-stat.pbrt")


def stage_resized(name: str, config: str, width: int, height: int,
                  spp: int, iterations: int = 1, maxdepth: int | None = None,
                  extra: str = "", workdir: str | None = None) -> str:
    """Stage `name` and wrap it so Film/Sampler sizes are overridden.

    Film/Sampler are last-wins directives (scene/api.py just overwrites
    desc.*_params), so the wrapper re-emits them AFTER the include;
    integrator-level knobs go through the ExtraParams channel, which
    wins over directive parameters in the reference's semantics
    (api.cpp:1433-1748; read at statpath.cpp:966,988).
    """
    path = stage(name, config, workdir=workdir)
    root = os.path.dirname(os.path.dirname(path))
    md = f'"integer integratormaxdepth" [ {maxdepth} ]' if maxdepth else ""
    wrapper = os.path.join(root, f"{name}-wrapped.pbrt")
    with open(wrapper, "w") as f:
        f.write(
            f'Include "{name}/scene-stat.pbrt"\n'
            f'Film "image" "integer xresolution" [ {width} ] '
            f'"integer yresolution" [ {height} ] '
            f'"string filename" [ "{name}.pfm" ]\n'
            f'Sampler "random" "integer pixelsamples" [ {spp} ]\n'
            f'ExtraParams "extras" '
            f'"integer integratoriterations" [ {iterations} ] '
            f"{md} {extra}\n"
        )
    return wrapper
