import sys, time, math
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render import pathtracer as pt
from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.render.mesh import atrium_scene
from d3d12renderer_tpu.render import pipeline as pl
w, h = 1920, 1080
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(
    albedo=jnp.array([[0.55, 0.5, 0.45], [0.7, 0.66, 0.6],
                      [0.75, 0.72, 0.65], [0.6, 0.58, 0.52],
                      [0.9, 0.88, 0.85], [0.6, 0.15, 0.12]]),
    emissive=jnp.zeros((6, 3)),
    roughness=jnp.array([0.6, 0.7, 0.55, 0.65, 0.15, 0.8]),
    metallic=jnp.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0]))
scene = pt.Scene(bvh=bvh, materials=mats, sky=pt.default_sky()).with_shading_table()
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)
maps = pl._fit_cascades_jit(cam.position, scene.sky.sun_direction)
maps = pl._render_sun_shadow_maps_jit(scene.bvh, maps, resolution=512)
sync(maps); stamp("shadow maps ok")
settings = pl.RendererSettings(primary="raster", half_res_effects=True)
fs = pl.initial_frame_state(w, h)
key = jax.random.PRNGKey(0)
t_ = jnp.asarray(0.0, jnp.float32)

def T(name, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn._jit(*a, **kw)
    sync(out)
    stamp(f"{name}: {(time.perf_counter()-t0)*1e3:.0f} ms (incl compile on first)")
    return out

gb = T("gbuffer", pl._stage_gbuffer, scene, cam, cam, None, key,
       settings=settings, width=w, height=h)
lit, ao, hist = T("effects", pl._stage_effects, scene, cam, maps, gb, fs, key,
                  settings=settings, width=w, height=h)
color, ambient = T("opaque", pl._stage_opaque, scene, cam, gb, lit, ao,
                   None, None, None, None, None,
                   settings=settings, width=w, height=h)
color, rt_refl, hist2 = T("reflections", pl._stage_reflections, scene, cam,
                          color, gb, fs, settings=settings)
color = T("compose", pl._stage_compose, scene, cam, color, gb, None, None,
          t_, settings=settings, width=w, height=h)
hist = dict(hist); hist.update(hist2)
color, fs2 = T("taa", pl._stage_taa, color, gb, fs, hist, settings=settings)
ldr = T("post", pl._stage_post, color, settings=settings)
stamp("ALL STAGES OK; second pass timing:")
for name, fn, a, kw in (
    ("gbuffer", pl._stage_gbuffer, (scene, cam, cam, None, key), dict(settings=settings, width=w, height=h)),
    ("effects", pl._stage_effects, (scene, cam, maps, gb, fs, key), dict(settings=settings, width=w, height=h)),
):
    t0 = time.perf_counter()
    for _ in range(5): out = fn._jit(*a, **kw)
    sync(out)
    stamp(f"{name} steady: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
