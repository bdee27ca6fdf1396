import sys, time, math
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
def timeit(f, *a, n=10):
    r = f(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render import pathtracer as pt
from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.render.mesh import atrium_scene
from d3d12renderer_tpu.ops import raster_pallas as rp

w, h = 1920, 1080
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(albedo=jnp.full((6,3),0.6), emissive=jnp.zeros((6,3)),
                    roughness=jnp.full((6,),0.6), metallic=jnp.zeros((6,)))
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)

table = bvh_mod.build_shading_table(bvh, mats)
table = jax.block_until_ready(table)

def B():
    res = rp.closest_hit_raster(bvh, cam, w, h)
    return bvh_mod.hit_attributes_shaded(bvh, mats, res, table=table)

def C():
    res = rp.closest_hit_raster(bvh, cam, w, h)
    res = dict(zip(res.keys(), jax.lax.optimization_barrier(tuple(res.values()))))
    return bvh_mod.hit_attributes_shaded(bvh, mats, res, table=table)

for name, fn in (("B raster+attrs fused", B), ("C with res barrier", C)):
    f = jax.jit(fn)
    stamp(f"compile {name}...")
    out = f(); sync(out)
    stamp(f"{name}: {timeit(f):.1f} ms")
