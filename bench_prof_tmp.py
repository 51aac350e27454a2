import tempfile, sys
import jax
from statmc_tpu.testscenes import terrain_scene_text
from statmc_tpu.driver import load

text = terrain_scene_text(width=1280, height=720, spp=4, iterations=1, maxdepth=8)
tmp = tempfile.mkdtemp(); path = tmp + "/terrain-proxy.pbrt"
open(path, "w").write(text)
r = load(path)
r.render(iterations=1, verbose=False)   # warm
r.reset()
with jax.profiler.trace("/tmp/terrain_prof"):
    r.render(iterations=1, verbose=False)
print("done")
