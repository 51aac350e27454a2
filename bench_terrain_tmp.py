import time, json, sys
import jax, numpy as np
from statmc_tpu.testscenes import terrain_scene_text
from statmc_tpu.driver import load
import tempfile

text = terrain_scene_text(width=1280, height=720, spp=4, iterations=1, maxdepth=8)
tmp = tempfile.mkdtemp(); path = tmp + "/terrain-proxy.pbrt"
open(path, "w").write(text)
r = load(path)
print("bvh type:", type(r.s.bvh).__name__, "tris:", getattr(r.s.bvh, "n_tris", None), file=sys.stderr)
r.render(iterations=1, verbose=False)
r.reset()
logs = r.render(iterations=1, verbose=False)
log = logs[0]
rays = log["rays_total"]; rps = rays / log["render_s"]
print(json.dumps({"terrain_rays_per_s": round(rps,1), "render_s": round(log["render_s"],3), "rays": int(rays)}))
if len(sys.argv) > 1 and sys.argv[1] == "profile":
    r.reset()
    with jax.profiler.trace("/tmp/terrain_prof"):
        r.render(iterations=1, verbose=False)
