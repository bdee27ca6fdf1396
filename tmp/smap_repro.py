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
from d3d12renderer_tpu.render import pipeline as pl
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
stamp("built")
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=1920/1080)
sky = pt.default_sky()
maps = pl._fit_cascades_jit(cam.position, sky.sun_direction)
np.asarray(jax.tree_util.tree_leaves(maps)[0].ravel()[:1])
stamp("fit ok")
maps = pl._render_sun_shadow_maps_jit(bvh, maps, resolution=512)
np.asarray(jax.tree_util.tree_leaves(maps)[0].ravel()[:1])
stamp("shadow maps OK")
t0 = time.perf_counter()
for _ in range(5):
    m2 = pl._render_sun_shadow_maps_jit(bvh, maps, resolution=512)
np.asarray(jax.tree_util.tree_leaves(m2)[0].ravel()[:1])
stamp(f"steady {(time.perf_counter()-t0)/5*1e3:.1f} ms")
