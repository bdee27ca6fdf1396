"""Profile the per-tri pair rasterizer at 1080p atrium on TPU."""
import time
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
import numpy as np
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
wp = W + ((-W) % rp.TILE_X)
hp = H + ((-H) % rp.TILE_Y)


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(f, *a, n=20):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


mat, attr = rp.perspective_rows(cam, W, H)
args = (b.tri_v0, b.tri_e1, b.tri_e2, b.tri_valid)

# 1. plan alone
plan = jax.jit(lambda: rp.visit_plan_pairs(*args, mat, attr, wp, hp))
out = plan()
_sync(out)
print(f"visit_plan_pairs: {timeit(plan):.2f} ms", flush=True)
packed, counts, scale2, table, povf, vovf, _bits_traced = out
print("pairs_overflow:", int(povf), "visits_overflow:", int(vovf),
      "visits:", int(jnp.asarray(counts).sum()), flush=True)

# 2. kernel alone (plan outputs materialized).  bits must be STATIC ints
# (the jitted plan returns traced scalars) — recompute from shapes.
n_tiles = (wp // rp.TILE_X) * (hp // rp.TILE_Y)
ntx = wp // rp.TILE_X
nv = rp.PAIR_CAP // rp.GROUP + n_tiles
tile_bits = max(n_tiles - 1, 1).bit_length()
v_bits = max(nv - 1, 1).bit_length()
bits = dict(q_bits=31 - tile_bits - v_bits, group_bits=v_bits)
run = jax.jit(lambda p, c, s, t: rp._run_slabs(
    p, c, s, t, n_tiles=n_tiles, ntx=ntx, q_bits=bits["q_bits"],
    group_bits=bits["group_bits"], jitter=(0.5, 0.5), interpret=False,
    tri_rows=True))
r = run(packed, counts, scale2, table)
_sync(r)
print(f"_run_slabs kernel: {timeit(run, packed, counts, scale2, table):.2f}"
      " ms", flush=True)

# 3. whole rasterize_pairs
ras = jax.jit(lambda: rp.rasterize_pairs(*args, mat, attr, wp, hp))
r3 = ras()
_sync(r3)
print(f"rasterize_pairs: {timeit(ras):.2f} ms", flush=True)

# 4. e2e closest_hit (tri binning)
chr_fn = jax.jit(lambda: rp.closest_hit_raster(b, cam, W, H))
r4 = chr_fn()
_sync(r4)
print(f"closest_hit_raster(tri): {timeit(chr_fn, n=10):.2f} ms", flush=True)
print("hit px:", int(np.asarray(r4["hit"]).sum()),
      "overflow:", int(np.asarray(r4["overflow"])), flush=True)

# parity vs group path on TPU
chg = jax.jit(lambda: rp.closest_hit_raster(b, cam, W, H, binning="group"))
r5 = chg()
tri_a = np.asarray(r4["tri"])
tri_b = np.asarray(r5["tri"])
mism = (tri_a != tri_b).sum()
print(f"tri mismatch vs group path: {mism} / {tri_a.size}", flush=True)
ta, tb = np.asarray(r4["t"]), np.asarray(r5["t"])
hit = np.asarray(r4["hit"]) & np.asarray(r5["hit"])
if hit.any():
    print("max |t| diff on common hits:",
          float(np.abs(ta[hit] - tb[hit]).max()), flush=True)
