import sys, time, math
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render import pathtracer as pt
from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.render.mesh import atrium_scene
from d3d12renderer_tpu.render.gbuffer import render_gbuffer

w, h = 1920, 1080
stamp("build")
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(albedo=jnp.full((6,3),0.6), emissive=jnp.zeros((6,3)),
                    roughness=jnp.full((6,),0.6), metallic=jnp.zeros((6,)))
scene = pt.Scene(bvh=bvh, materials=mats, sky=pt.default_sky()).with_shading_table()
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)
f = jax.jit(lambda k: render_gbuffer(scene, cam, w, h, prev_camera=cam,
                                     jitter_key=k, primary="raster"))
stamp("compile+run gbuffer raster...")
gb = f(jax.random.PRNGKey(0))
np.asarray(gb.depth.ravel()[:1])
stamp("gbuffer OK")
t0 = time.perf_counter()
for i in range(5):
    gb = f(jax.random.fold_in(jax.random.PRNGKey(0), i))
np.asarray(gb.depth.ravel()[:1])
stamp(f"steady {(time.perf_counter()-t0)/5*1e3:.1f} ms/frame")
print("hit frac", float(jnp.mean(gb.hit.astype(jnp.float32))),
      "depth mean", float(jnp.mean(jnp.where(gb.hit, gb.depth, 0.0))), flush=True)
