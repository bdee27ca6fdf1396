"""Dissect the culled ray kernel's time on a big scene.

Splits one closest-hit call into its three stages — XLA cluster cull +
visit-list build, the Pallas intersection kernel, uv/t recompute — and
reports chunk-visit counts, so kernel work (visits x per-visit cost) and
host-side overheads are separately visible.  Use with D3D12TPU_RAY_CHUNK to
sweep chunk width.

Usage: python tools/ray_probe.py [--platform axon] [--grid 44] [--seg 88]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="axon")
parser.add_argument("--grid", type=int, default=44)
parser.add_argument("--seg", type=int, default=88)
parser.add_argument("--rays", type=int, default=65536)
parser.add_argument("--iters", type=int, default=20)
parser.add_argument("--incoherent", action="store_true")
args = parser.parse_args()

import jax

jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.ops import ray_trace_pallas as rtp
from d3d12renderer_tpu.render import bvh as bvh_mod
from d3d12renderer_tpu.render.mesh import sphere_grid_scene
from d3d12renderer_tpu.render.pathtracer import _tile_perm

b = bvh_mod.build_bvh(sphere_grid_scene(args.grid, args.seg))
ntris = int(np.asarray(b.tri_valid).sum())
nc = b.dense.cluster_lo.shape[0]
print(f"scene: {ntris} tris, {nc} chunks of {rtp.TRI_CHUNK}", flush=True)

nrays = args.rays
o = jnp.broadcast_to(jnp.array([0.0, 1.5, -9.0]), (nrays, 3))
if args.incoherent:
    rng = np.random.default_rng(1)
    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d[:, 2] += 1.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
else:
    side = int(np.sqrt(nrays))
    xs = (np.arange(side) + 0.5) / side * 2 - 1
    dc = np.stack(np.broadcast_arrays(
        xs[None, :] * 0.9, -xs[:, None] * 0.55, np.full((side, side), 1.0),
    ), -1).reshape(-1, 3)
    dc = (dc / np.linalg.norm(dc, axis=-1, keepdims=True)).astype(np.float32)
    perm, _ = _tile_perm(side, side)
    d = jnp.asarray(dc[perm])


def timeit(label, fn, *fa):
    out = jax.block_until_ready(fn(*fa))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*fa)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{label:44s} {dt * 1e3:8.3f} ms", flush=True)
    return out


regroup = args.incoherent
full = jax.jit(lambda o, d: rtp.closest_hit_pallas_culled(
    b.dense, o, d, regroup=regroup)["t"])
timeit("full closest hit", full, o, d)

# Stage 1 alone: cull + visit-list build (what precedes every pallas call).
sb = rtp._slab_blocks_for(nc)
slab = sb * rtp.RAY_BLOCK


def cull_only(o, d):
    tm = jnp.full((nrays,), 1e30, jnp.float32)
    outs = []
    for s0 in range(0, nrays, slab):
        needed, entry = rtp._cluster_cull(
            o[s0:s0 + slab].reshape(sb, rtp.RAY_BLOCK, 3),
            d[s0:s0 + slab].reshape(sb, rtp.RAY_BLOCK, 3),
            tm[s0:s0 + slab].reshape(sb, rtp.RAY_BLOCK),
            b.dense.cluster_lo, b.dense.cluster_hi, group=sb)
        outs.append(rtp._flat_visits(needed, entry)[0])
    return jnp.stack(outs)


timeit(f"cluster cull + visit build ({nrays // slab} slabs)",
       jax.jit(cull_only), o, d)

res = jax.jit(lambda o, d: rtp.closest_hit_pallas_culled(
    b.dense, o, d, regroup=regroup, stats=True))(o, d)
visits = int(res["visits"])
blocks = nrays // rtp.RAY_BLOCK
print(f"visits: {visits} ({visits / blocks:.1f}/block of {nc} chunks; "
      f"hit rate {float(jnp.mean(res['hit'])):.2f})", flush=True)
