"""Profile the culled ray kernel on a 1080p atrium wavefront: visits,
cluster-cull time vs kernel time, and a RAY_BLOCK/TRI_CHUNK sweep.

Usage: python tools/ray_profile.py [--platform axon] [--width 1920]
       [--height 1088] [--scene atrium]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="axon")
parser.add_argument("--width", type=int, default=1920)
parser.add_argument("--height", type=int, default=1088)
parser.add_argument("--scene", default="atrium")
parser.add_argument("--ray-block", type=int, default=None)
parser.add_argument("--tri-chunk", type=int, default=None)
args = parser.parse_args()

if args.ray_block:
    os.environ["D3D12TPU_RAY_BLOCK"] = str(args.ray_block)
if args.tri_chunk:
    os.environ["D3D12TPU_RAY_CHUNK"] = str(args.tri_chunk)

import jax

jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.ops import ray_trace_pallas as rtp
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render import mesh as mesh_mod
from d3d12renderer_tpu.render.camera import generate_rays, look_at
from d3d12renderer_tpu.render.pathtracer import _tile_perm

if args.scene == "atrium":
    scene = mesh_mod.atrium_scene(1.4)
    eye, target = (10.0, 6.0, 14.0), (0.0, 3.0, 0.0)
else:
    scene = mesh_mod.sphere_grid_scene(16, 26)
    eye, target = (0.0, 1.5, -9.0), (0.0, 1.0, 0.0)

b = bvh_mod.build_bvh(scene)
tris = int(np.asarray(b.tri_valid).sum())
nc = (int(b.dense.n.shape[0]) + rtp.TRI_CHUNK - 1) // rtp.TRI_CHUNK
print(f"{tris} tris, {nc} chunks of {rtp.TRI_CHUNK}, RAY_BLOCK={rtp.RAY_BLOCK}")

import math

w, h = args.width, args.height
cam = look_at(eye, target, v_fov=math.radians(60), aspect=w / h)
o, d = generate_rays(cam, w, h)
perm, _ = _tile_perm(w, h)
o, d = o[perm], d[perm]
print(f"{w}x{h} = {w * h / 1e6:.2f}M primary rays")

# --- full culled call with stats
f = jax.jit(lambda o, d: rtp.closest_hit_pallas_culled(
    b.dense, o, d, stats=True))
res = f(o, d)
jax.block_until_ready(res)
t0 = time.perf_counter()
for _ in range(3):
    res = f(o, d)
jax.block_until_ready(res)
dt = (time.perf_counter() - t0) / 3
visits = int(res["visits"])
sb = rtp._slab_blocks_for(nc)
nblocks = (w * h + rtp.RAY_BLOCK - 1) // rtp.RAY_BLOCK
print(f"end-to-end: {dt * 1e3:.1f} ms  ({w * h / dt / 1e6:.2f} Mrays/s)")
print(f"visits: {visits} over {nblocks} ray blocks "
      f"({visits / nblocks:.1f}/block; slab={sb} blocks)")
print(f"hit rate: {float(jnp.mean(res['hit'])):.3f}")

# --- cluster-cull alone
def cull_only(o, d):
    tm = jnp.full((o.shape[0],), 1e30, jnp.float32)
    slab = sb * rtp.RAY_BLOCK
    pad_r = (-o.shape[0]) % slab
    o = jnp.pad(o, ((0, pad_r), (0, 0)))
    d = jnp.pad(d, ((0, pad_r), (0, 0)), constant_values=1.0)
    tm = jnp.pad(tm, (0, pad_r))
    nslabs = o.shape[0] // slab

    def one(args):
        o_s, d_s, tm_s = args
        needed, entry = rtp._cluster_cull(
            o_s.reshape(sb, rtp.RAY_BLOCK, 3),
            d_s.reshape(sb, rtp.RAY_BLOCK, 3),
            tm_s.reshape(sb, rtp.RAY_BLOCK),
            b.dense.cluster_lo, b.dense.cluster_hi, group=sb)
        packed, total, scale = rtp._flat_visits(needed, entry)
        return total

    totals = jax.lax.map(one, (o.reshape(nslabs, slab, 3),
                               d.reshape(nslabs, slab, 3),
                               tm.reshape(nslabs, slab)))
    return totals.sum()

fc = jax.jit(cull_only)
tot = fc(o, d)
jax.block_until_ready(tot)
t0 = time.perf_counter()
for _ in range(3):
    tot = fc(o, d)
jax.block_until_ready(tot)
dtc = (time.perf_counter() - t0) / 3
print(f"cluster-cull+sort alone: {dtc * 1e3:.1f} ms "
      f"({100 * dtc / dt:.0f}% of end-to-end)")
