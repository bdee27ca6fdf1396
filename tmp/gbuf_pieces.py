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
from d3d12renderer_tpu.ops import raster_pallas as rp

w, h = 1920, 1080
bvh = bvh_mod.build_bvh(atrium_scene(1.4))
mats = pt.Materials(albedo=jnp.full((6,3),0.6), emissive=jnp.zeros((6,3)),
                    roughness=jnp.full((6,),0.6), metallic=jnp.zeros((6,)))
scene = pt.Scene(bvh=bvh, materials=mats, sky=pt.default_sky())
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=w / h)
stamp("1. closest_hit_raster")
f1 = jax.jit(lambda: rp.closest_hit_raster(bvh, cam, w, h))
res = f1(); sync(res["t"])
stamp(f"   {timeit(f1):.1f} ms")
res = {k: jax.device_put(v) for k, v in f1().items()}

stamp("2. hit_attributes")
f2 = jax.jit(lambda r: bvh_mod.hit_attributes(bvh, r))
out2 = f2(res); sync(out2)
stamp(f"   {timeit(f2, res):.1f} ms")
n_, gn, uv, mat = [jax.device_put(x) for x in f2(res)]

stamp("3. material lookups (albedo/rough/metal/emis)")
f3 = jax.jit(lambda m, u: (pt.sample_albedo(scene.materials, m, u),
                           scene.materials.roughness[m],
                           scene.materials.metallic[m],
                           scene.materials.emissive[m]))
out3 = f3(mat, uv); sync(out3)
stamp(f"   {timeit(f3, mat, uv):.1f} ms")

stamp("4. rays + wp + view transforms + motion")
from d3d12renderer_tpu.core import maths as m_
def rest(r, nn, gnn):
    o, d = generate_rays(cam, w, h, offset=(0.5, 0.5))
    hit = r["hit"]
    t = jnp.where(hit, r["t"], jnp.inf)
    wp_ = o + d * jnp.where(hit, r["t"], 1e6)[:, None]
    flip = jnp.sum(gnn * d, -1) > 0
    gn2 = jnp.where(flip[:, None], -gnn, gnn)
    n2 = jnp.where((jnp.sum(nn * gn2, -1) < 0)[:, None], -nn, nn)
    vp = m_.quat_inv_rotate(cam.rotation, wp_ - cam.position)
    vn = m_.quat_inv_rotate(cam.rotation[None], n2)
    return t, wp_, vp, vn
f4 = jax.jit(rest)
out4 = f4(res, n_, gn); sync(out4)
stamp(f"   {timeit(f4, res, n_, gn):.1f} ms")
