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
from d3d12renderer_tpu.render.camera import look_at, generate_rays
from d3d12renderer_tpu.render.mesh import atrium_scene
from d3d12renderer_tpu.render.gbuffer import render_gbuffer, _world_to_view, _view_to_pixel
from d3d12renderer_tpu.core import maths as m_
from d3d12renderer_tpu.ops import raster_pallas as rp

w, h = 1920, 1080
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(albedo=jnp.full((6,3),0.6), emissive=jnp.zeros((6,3)),
                    roughness=jnp.full((6,),0.6), metallic=jnp.zeros((6,)))
scene = pt.Scene(bvh=bvh, materials=mats, sky=pt.default_sky()).with_shading_table()
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)
table = jax.block_until_ready(scene.attr_table)

def core(stage):
    res = rp.closest_hit_raster(bvh, cam, w, h)
    res = dict(zip(res.keys(), jax.lax.optimization_barrier(tuple(res.values()))))
    n, gn, uv, mat, albedo, rough, metal, emissive = \
        bvh_mod.hit_attributes_shaded(bvh, mats, res, table=table)
    if stage == 1:
        return n, albedo
    o, d = generate_rays(cam, w, h, offset=(0.5, 0.5))
    hit = res["hit"]
    wp_ = o + d * jnp.where(hit, res["t"], 1e6)[:, None]
    flip = jnp.sum(gn * d, -1) > 0
    gn2 = jnp.where(flip[:, None], -gn, gn)
    n2 = jnp.where((jnp.sum(n * gn2, -1) < 0)[:, None], -n, n)
    vp = _world_to_view(cam, wp_)
    vn = m_.quat_inv_rotate(cam.rotation[None], n2)
    if stage == 2:
        return vp, vn, albedo
    vp_prev = _world_to_view(cam, wp_)
    pix_prev = _view_to_pixel(cam, vp_prev, w, h)
    pix_now = _view_to_pixel(cam, vp, w, h)
    motion = pix_prev - pix_now
    if stage == 3:
        return vp, vn, albedo, motion
    return None

for s in (1, 2, 3):
    f = jax.jit(lambda s=s: core(s))
    stamp(f"compile V{s}...")
    out = f(); sync(out)
    stamp(f"V{s}: {timeit(f):.1f} ms")

f4 = jax.jit(lambda k: render_gbuffer(scene, cam, w, h, prev_camera=cam,
                                      jitter_key=k, primary="raster"))
stamp("compile V4 full render_gbuffer...")
gb = f4(jax.random.PRNGKey(0)); sync(gb)
stamp(f"V4: {timeit(f4, jax.random.PRNGKey(0)):.1f} ms")
