"""Profile closest_hit_raster tail stages at 1080p atrium on TPU."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
from d3d12renderer_tpu.render import mesh as mesh_mod
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render.camera import look_at, generate_rays
from d3d12renderer_tpu.ops import raster_pallas as rp
import math

W, H = 1920, 1080
scene = mesh_mod.atrium_scene(1.4)
cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
              v_fov=math.radians(60), aspect=W / H)
b = bvh_mod.build_bvh(scene)
wp = W + ((-W) % rp.TILE_X)
hp = H + ((-H) % rp.TILE_Y)


def timeit(f, *a, n=20):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


mat, attr = rp.perspective_rows(cam, W, H)
tables_fn = jax.jit(lambda: rp.build_frame_tables(
    b.tri_v0, b.tri_e1, b.tri_e2, b.tri_valid, mat, attr, wp, hp))
tables = jax.block_until_ready(tables_fn())
print(f"tables: {timeit(tables_fn):.2f} ms", flush=True)

ras = jax.jit(lambda t: rp.rasterize(t, wp, hp))
q, tri, ovf, qmin = jax.block_until_ready(ras(tables))
print(f"rasterize (incl plan+unscramble): {timeit(ras, tables):.2f} ms",
      flush=True)

# Tail pieces, each its own jit taking materialized inputs.
tri_c = tri.reshape(hp, wp)[:H, :W].reshape(-1)
q_c = q.reshape(hp, wp)[:H, :W].reshape(-1)

rays_fn = jax.jit(lambda: generate_rays(cam, W, H))
o, d = jax.block_until_ready(rays_fn())
print(f"generate_rays: {timeit(rays_fn):.2f} ms", flush=True)

th = math.tan(cam.v_fov * 0.5)


def t_from_q(qv, triv):
    hit = triv >= 0
    x = jnp.arange(W, dtype=jnp.float32) + 0.5
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    ndc_x = (x / W * 2.0 - 1.0) * th * cam.aspect
    ndc_y = (1.0 - y / H * 2.0) * th
    norm = jnp.sqrt(1.0 + ndc_x[None, :] ** 2
                    + ndc_y[:, None] ** 2).reshape(-1)
    return jnp.where(hit, norm / jnp.maximum(qv, 1e-30), jnp.inf), hit


tq = jax.jit(t_from_q)
t, hit = jax.block_until_ready(tq(q_c, tri_c))
print(f"t_from_q: {timeit(tq, q_c, tri_c):.2f} ms", flush=True)

dense = b.dense
table8 = jnp.concatenate([
    dense.e1p, dense.e1_off[:, None], dense.e2p, dense.e2_off[:, None]], -1)
table8 = jax.block_until_ready(table8)


def uv_fn(t, hit, triv, o, d, table8):
    p = o + jnp.where(hit, t, 0.0)[:, None] * d
    rows = table8[jnp.maximum(triv, 0)]
    u = jnp.sum(p * rows[:, 0:3], -1) + rows[:, 3]
    v = jnp.sum(p * rows[:, 4:7], -1) + rows[:, 7]
    return jnp.where(hit[:, None], jnp.stack([u, v], -1), 0.0)


uvj = jax.jit(uv_fn)
uv = jax.block_until_ready(uvj(t, hit, tri_c, o, d, table8))
print(f"uv gather+dot: {timeit(uvj, t, hit, tri_c, o, d, table8):.2f} ms",
      flush=True)

# And the whole closest_hit_raster again for reference.
chr_fn = jax.jit(lambda: rp.closest_hit_raster(b, cam, W, H))
r = jax.block_until_ready(chr_fn())
print(f"closest_hit_raster e2e: {timeit(chr_fn, n=10):.2f} ms", flush=True)

# Visit-size stats for the per-tri binning design.
geo = jax.jit(lambda t: rp.geometric_needed(t, wp, hp))(tables)
print("group visits:", int(geo.sum()), flush=True)
