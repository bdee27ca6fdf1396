import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render.mesh import atrium_scene, sphere_grid_scene
from d3d12renderer_tpu.ops.ray_trace_pallas import closest_hit_pallas
b = bvh_mod.build_bvh(atrium_scene(1.4))
stamp("built atrium")
rng = np.random.default_rng(0)
for nrays in (65536, 1048576):
    o = jnp.asarray(rng.uniform(-8, 8, (nrays, 3)).astype(np.float32))
    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    f = jax.jit(lambda o, d: closest_hit_pallas(b.dense, o, d))
    r = f(o, jnp.asarray(d))
    np.asarray(r["t"].ravel()[:1])
    stamp(f"atrium {nrays} rays OK, hits {int(r['hit'].sum())}")
