"""Measure raster kernel fixed vs marginal cost on TPU at 1080p atrium."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
from d3d12renderer_tpu.render import mesh as mesh_mod
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render.camera import look_at
from d3d12renderer_tpu.ops import raster_pallas as rp
import math

W, H = 1920, 1080
scene = mesh_mod.atrium_scene(1.4)
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=W / H)
b = bvh_mod.build_bvh(scene)
print("tris:", b.tri_v0.shape, flush=True)

wp = W + ((-W) % rp.TILE_X)
hp = H + ((-H) % rp.TILE_Y)
mat, attr = rp.perspective_rows(cam, W, H)
tables = jax.jit(lambda: rp.build_frame_tables(
    b.tri_v0, b.tri_e1, b.tri_e2, b.tri_valid, mat, attr, wp, hp))()
jax.block_until_ready(tables)
n_tiles = (wp // rp.TILE_X) * (hp // rp.TILE_Y)
G = tables.qhi.shape[0]
print("groups:", G, "tiles:", n_tiles, flush=True)

geo = jax.jit(lambda t: rp.geometric_needed(t, wp, hp))(tables)
print("geometric visits:", int(geo.sum()), flush=True)


def timeit(f, *a, n=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


# 1. Full pass (geometric needed)
full = jax.jit(lambda t, nd: rp._rasterize_tiles(t, wp, hp, needed=nd))
ms_full = timeit(full, tables, geo)
print(f"full pass: {ms_full:.2f} ms", flush=True)

# 2. All-false needed: 1020 forced skip-visits only -> FIXED cost
none = jnp.zeros_like(geo)
ms_none = timeit(full, tables, none)
print(f"all-false needed (fixed cost): {ms_none:.2f} ms", flush=True)

# 3. Quarter visits: keep every 4th group column
quarter = geo & (jnp.arange(G)[None, :] % 4 == 0)
ms_q = timeit(full, tables, quarter)
print(f"quarter visits ({int(quarter.sum())}): {ms_q:.2f} ms", flush=True)

# 4. Feedback steady state (end-to-end closest_hit_raster)
chr_nofb = jax.jit(lambda: rp.closest_hit_raster(b, cam, W, H))
r0 = chr_nofb()
jax.block_until_ready(r0)
chr_fb = jax.jit(lambda qm: rp.closest_hit_raster(b, cam, W, H,
                                                  tile_qmin=qm))
ms_e2e0 = timeit(lambda: chr_nofb(), n=10)
ms_e2e1 = timeit(chr_fb, r0["tile_qmin"], n=10)
print(f"e2e closest_hit no-feedback: {ms_e2e0:.2f} ms", flush=True)
print(f"e2e closest_hit feedback(static): {ms_e2e1:.2f} ms", flush=True)
print("hit px:", int(r0["hit"].sum()), "overflow:", int(r0["overflow"]),
      flush=True)
