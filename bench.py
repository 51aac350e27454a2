"""Benchmark: staircase-proxy 64 spp render + statistical denoise.

Mirrors the reference's measurement protocol (BASELINE.md): per-iteration
wall-clock for rendering and for the denoise pass, with a warm-up run
(--warmup equivalent) before timing.  The reference's staircase assets
are not in the mounted tree, so a procedurally generated scene of
comparable structure stands in (statmc_tpu/testscenes.py).

Prints ONE JSON line:
  {"metric": ..., "value": rays/s/chip, "unit": "rays/s",
   "vs_baseline": value / 5e6, ...}

vs_baseline anchor: the reference repo publishes no numbers
(BASELINE.json "published": {}).  5 Mrays/s is our documented estimate of
pbrt-v3's CPU path-tracing throughput on the paper's 16-core Ryzen 9
5950X (pbrt-v3 typically traces 2-10 Mrays/s on interior scenes); the
anchor is fixed here so successive rounds are comparable.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

# Proxy configuration: the paper pipeline is staircase 512x512 @ 64 spp
# (BASELINE.md); the proxy runs 256x256 @ 16 spp so one bench iteration
# stays within the driver's time budget at the current rays/s -- the
# rays/s metric itself is resolution/spp independent.
WIDTH = HEIGHT = 256
SPP = 16
MAXDEPTH = 8
BASELINE_RAYS_PER_S = 5e6


def main():
    from statmc_tpu.driver import load
    from statmc_tpu.testscenes import scene_text

    text = scene_text(
        width=WIDTH, height=HEIGHT, spp=SPP, iterations=1,
        maxdepth=MAXDEPTH, denoise=True, filtersd=10.0, filterradius=20,
    )
    tmp = tempfile.mkdtemp()
    path = tmp + "/staircase-proxy.pbrt"
    with open(path, "w") as f:
        f.write(text)

    r = load(path)

    # Warm-up (compile + first run), then timed run.
    r.render(iterations=1, verbose=False)
    r.reset()
    logs = r.render(iterations=1, verbose=False)
    log = logs[0]

    rays = log["rays_total"]
    rays_per_s = rays / log["render_s"]
    mpix = WIDTH * HEIGHT / 1e6
    denoise_ms_per_mpix = log["denoise_s"] * 1e3 / mpix

    film = np.asarray(r.film_mean)
    ok = bool(np.isfinite(film).all() and film.mean() > 0)

    result = {
        "metric": f"staircase_proxy_{SPP}spp_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
        "denoise_ms_per_mpix": round(denoise_ms_per_mpix, 2),
        "render_s": round(log["render_s"], 3),
        "rays_total": int(rays),
        "spp": SPP,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "finite_film": ok,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
