import time, sys, tempfile
import jax, jax.numpy as jnp, numpy as np
from statmc_tpu.testscenes import terrain_scene_text
from statmc_tpu.driver import load
from statmc_tpu.accel import twolevel as TL
from statmc_tpu.render import intersect as IX, camera as CAM

text = terrain_scene_text(width=1280, height=720, spp=4, iterations=1, maxdepth=8)
tmp = tempfile.mkdtemp(); path = tmp + "/terrain-proxy.pbrt"
open(path, "w").write(text)
r = load(path)
s = r.s
tl = s.bvh
print("ntt:", tl.table.shape[0], "tris:", tl.n_tris, file=sys.stderr)

R = 32768
# camera rays for the first block
ids = jnp.arange(R, dtype=jnp.int32)
px = (ids % 1280).astype(jnp.float32) + 0.5
py = (ids // 1280).astype(jnp.float32) + 0.5
o, d = CAM.generate_rays(s.cam, jnp.stack([px, py], -1))
t_max = jnp.full((R,), 1e30, jnp.float32)

# Also "bounce-like" rays: random origins in hall, random dirs (worst coherence)
rng = np.random.default_rng(0)
ob = jnp.asarray(rng.random((R,3), np.float32)*14-7)
db_ = rng.standard_normal((R,3)).astype(np.float32)
db = jnp.asarray(db_/np.linalg.norm(db_,axis=1,keepdims=True))

def timeit(fn, *a, n=20, **kw):
    out = fn(*a, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

full = jax.jit(lambda o,d,tm: TL.intersect_twolevel(tl, o, d, tm))
print("intersect_twolevel cam  ms:", round(timeit(full, o, d, t_max),3))
print("intersect_twolevel rand ms:", round(timeit(full, ob, db, t_max),3))

# components, camera rays
sortk = jax.jit(lambda o,d,tm: jnp.argsort(TL._ray_sort_keys(tl,o,d,tm)))
print("argsort keys ms:", round(timeit(sortk, o, d, t_max),3))

wl = jax.jit(lambda o,d,tm: TL._block_worklists(tl.tile_bounds, o, d, tm))
print("worklists cam ms:", round(timeit(wl, o, d, t_max),3))
print("worklists rand ms:", round(timeit(wl, ob, db, t_max),3))

# pallas kernel alone (on sorted camera rays)
from statmc_tpu.accel.fused import ray_features, RAY_TILE, _K
def prep(o,d,tm):
    key = TL._ray_sort_keys(tl,o,d,tm); perm = jnp.argsort(key)
    o2,d2,tm2 = o[perm], d[perm], tm[perm]
    raye, rayp, _ = ray_features(o2,d2)
    G = R//RAY_TILE
    order, tnear, count = TL._block_worklists(tl.tile_bounds, o2, d2, tm2)
    raye_t = raye.reshape(G,RAY_TILE,_K).transpose(0,2,1)
    rayp_t = rayp.reshape(G,RAY_TILE,_K).transpose(0,2,1)
    return order, tnear, count, raye_t, rayp_t, tm2.reshape(G,RAY_TILE)
args_cam = [jax.block_until_ready(x) for x in jax.jit(prep)(o,d,t_max)]
args_rnd = [jax.block_until_ready(x) for x in jax.jit(prep)(ob,db,t_max)]
print("worklist tiles/block cam: mean", float(args_cam[2].mean()), "max", int(args_cam[2].max()))
print("worklist tiles/block rnd: mean", float(args_rnd[2].mean()), "max", int(args_rnd[2].max()))
kern = lambda *a: TL._intersect_pallas2(tl.table, *a, any_hit=False)
print("pallas walk cam ms:", round(timeit(kern, *args_cam),3))
print("pallas walk rnd ms:", round(timeit(kern, *args_rnd),3))

# full intersect_scene incl assembly
isc = jax.jit(lambda o,d,tm: IX.intersect_scene(s.scene, o, d, tm, bvh=tl))
print("intersect_scene cam ms:", round(timeit(isc, o, d, t_max),3))
isl = jax.jit(lambda o,d,tm: IX.intersect_scene(s.scene, o, d, tm, bvh=tl, lean=True))
print("intersect_scene lean rnd ms:", round(timeit(isl, ob, db, t_max),3))
occ = jax.jit(lambda o,d,tm: IX.occluded_scene(s.scene, o, d, tm, bvh=tl))
print("occluded rnd ms:", round(timeit(occ, ob, db, t_max),3))
