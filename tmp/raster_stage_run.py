import sys, time, math, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np

def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render import pathtracer as pt
from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.render.mesh import atrium_scene
from d3d12renderer_tpu.render.pipeline import (
    RendererSettings, _fit_cascades_jit, _render_sun_shadow_maps_jit,
    initial_frame_state, render_frame,
)

w, h = 1920, 1080
stamp("building scene")
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(
    albedo=jnp.array([[0.55, 0.5, 0.45], [0.7, 0.66, 0.6],
                      [0.75, 0.72, 0.65], [0.6, 0.58, 0.52],
                      [0.9, 0.88, 0.85], [0.6, 0.15, 0.12]]),
    emissive=jnp.zeros((6, 3)),
    roughness=jnp.array([0.6, 0.7, 0.55, 0.65, 0.15, 0.8]),
    metallic=jnp.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
)
scene = pt.Scene(bvh=bvh, materials=mats, sky=pt.default_sky()).with_shading_table()
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)
stamp("shadow maps...")
try:
    maps = _fit_cascades_jit(cam.position, scene.sky.sun_direction)
    maps = _render_sun_shadow_maps_jit(scene.bvh, maps, resolution=512)
    jax.block_until_ready(maps)
    stamp("shadow maps done")
    settings = RendererSettings(primary="raster", half_res_effects=True)
except Exception as e:
    stamp(f"shadow maps failed ({type(e).__name__}); shadows disabled")
    maps = None
    settings = RendererSettings(primary="raster", half_res_effects=True,
                                enable_shadows=False)
fs = initial_frame_state(w, h)
key = jax.random.PRNGKey(0)

def frame(fs, i, profile=False):
    ldr, fs, aux = render_frame(
        scene, cam, w, h, settings, shadow_maps=maps,
        frame_state=fs, prev_camera=cam,
        key=jax.random.fold_in(key, i), dispatch="per_pass",
        profile_stages=profile)
    return ldr, fs, aux

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

stamp("first frame (compile)...")
ldr, fs, aux = frame(fs, 0, profile=True)
sync(ldr)
stamp("first frame done; stages: " + str({k: round(v*1e3,1) for k,v in aux.get("stage_seconds", {}).items()}))
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(5):
        ldr, fs, aux = frame(fs, rep*5+i+1)
    sync(ldr)
    stamp(f"rep {rep}: {(time.perf_counter()-t0)/5*1e3:.1f} ms/frame")
# profiled steady frame
ldr, fs, aux = frame(fs, 99, profile=True)
stamp("steady stages: " + str({k: round(v*1e3,1) for k,v in aux.get("stage_seconds", {}).items()}))
m = jnp.mean(ldr)          # device-side reduce; fetch 1 scalar
stamp("mean " + str(float(m)))
np.save("/root/repo/tmp/atrium_ldr_small.npy",
        np.asarray(ldr[::8, ::8]))
