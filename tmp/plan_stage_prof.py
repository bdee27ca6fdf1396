"""Stage-by-stage cost of visit_plan_pairs at 1080p atrium on TPU."""
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
wp = W + ((-W) % rp.TILE_X); hp = H + ((-H) % rp.TILE_Y)
mat, attr = rp.perspective_rows(cam, W, H)
ntx, nty = wp // rp.TILE_X, hp // rp.TILE_Y
n_tiles = ntx * nty
cap = rp.PAIR_CAP
t = b.tri_v0.shape[0]
G = rp.GROUP
i32 = jnp.int32


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


tile_bits = max(n_tiles - 1, 1).bit_length()
qp_bits = 30 - tile_bits
qmax_p = (1 << qp_bits) - 1


@jax.jit
def stage_a():
    e0, e1, e2, qp, x0, y0, x1, y1, q_tri = rp._project_planes(
        b.tri_v0, b.tri_e1, b.tri_e2, b.tri_valid, mat, attr, wp, hp)
    rows16 = jnp.stack(
        [e0[0], e0[1], e0[2], e1[0], e1[1], e1[2],
         e2[0], e2[1], e2[2], qp[0], qp[1], qp[2],
         jnp.arange(t, dtype=jnp.float32),
         jnp.zeros(t, jnp.float32), jnp.zeros(t, jnp.float32),
         jnp.zeros(t, jnp.float32)], axis=-1)
    rows16 = jnp.pad(rows16, ((0, 1), (0, 0)), constant_values=jnp.nan)
    fx0 = jnp.nan_to_num(jnp.clip(jnp.floor(x0 / rp.TILE_X), 0, ntx - 1))
    fy0 = jnp.nan_to_num(jnp.clip(jnp.floor(y0 / rp.TILE_Y), 0, nty - 1))
    fx1 = jnp.nan_to_num(jnp.clip(jnp.ceil(x1 / rp.TILE_X) - 1, 0, ntx - 1))
    fy1 = jnp.nan_to_num(jnp.clip(jnp.ceil(y1 / rp.TILE_Y) - 1, 0, nty - 1))
    vis = ((q_tri > 0.0) & (x1 > 0.0) & (x0 < wp)
           & (y1 > 0.0) & (y0 < hp))
    tx0i, ty0i = fx0.astype(i32), fy0.astype(i32)
    cx = jnp.maximum(fx1.astype(i32) - tx0i + 1, 1)
    cy = jnp.maximum(fy1.astype(i32) - ty0i + 1, 1)
    counts_tri = jnp.where(vis, cx * cy, 0)
    finite = jnp.isfinite(q_tri) & (q_tri > 0)
    scale = jnp.maximum(jnp.max(jnp.where(finite, q_tri, 0.0)), 1e-30) \
        / (qmax_p - 1)
    q_up = jnp.ceil(q_tri / scale)
    qq = jnp.where(jnp.isfinite(q_tri),
                   jnp.clip(qmax_p - q_up, 1, qmax_p - 1), 0).astype(i32)
    prect = tx0i | (ty0i << 10) | (cx << 20)
    return rows16, prect, counts_tri, qq, scale


out_a = stage_a()
_sync(out_a)
print(f"A project+rows+rects: {timeit(stage_a):.2f} ms", flush=True)
rows16, prect, counts_tri, qq, scale = out_a


@jax.jit
def stage_b(prect, counts_tri, qq):
    cum = jnp.cumsum(counts_tri)
    starts = cum - counts_tri
    total = cum[-1]
    write = (counts_tri > 0) & (starts < cap)
    mark = jnp.zeros(cap, i32).at[jnp.where(write, starts, 0)].max(
        jnp.where(write, jnp.arange(t, dtype=i32) + 1, 0))
    slots = jnp.arange(cap, dtype=i32)
    tri_of = jax.lax.associative_scan(jnp.maximum, mark) - 1
    live = slots < total
    tri_c = jnp.clip(tri_of, 0, t - 1)
    rect_g = prect[tri_c]
    local = slots - starts[tri_c]
    cx_g = jnp.maximum(rect_g >> 20, 1)
    tile = ((rect_g >> 10) & 1023) * ntx + (rect_g & 1023) \
        + (local // cx_g) * ntx + local % cx_g
    key = jnp.where(live, (tile << qp_bits) | qq[tri_c],
                    jnp.int32(0x7FFFFFFF))
    val = jnp.where(live, tri_c, -1)
    return key, val


out_b = stage_b(prect, counts_tri, qq)
_sync(out_b)
print(f"B expansion: {timeit(stage_b, prect, counts_tri, qq):.2f} ms",
      flush=True)
key, val = out_b

# B sub-pieces
@jax.jit
def b1(counts_tri):
    cum = jnp.cumsum(counts_tri)
    starts = cum - counts_tri
    write = (counts_tri > 0) & (starts < cap)
    mark = jnp.zeros(cap, i32).at[jnp.where(write, starts, 0)].max(
        jnp.where(write, jnp.arange(t, dtype=i32) + 1, 0))
    return mark, starts

mark, starts = b1(counts_tri)
_sync((mark, starts))
print(f"B1 cumsum+scatter-max: {timeit(b1, counts_tri):.2f} ms", flush=True)

@jax.jit
def b2(mark):
    return jax.lax.associative_scan(jnp.maximum, mark)

_sync(b2(mark))
print(f"B2 cummax: {timeit(b2, mark):.2f} ms", flush=True)


@jax.jit
def stage_c(key, val):
    return jax.lax.sort((key, val), num_keys=1, is_stable=True)


out_c = stage_c(key, val)
_sync(out_c)
print(f"C sort: {timeit(stage_c, key, val):.2f} ms", flush=True)
skey, sval = out_c

nv = cap // G + n_tiles
v_bits = max(nv - 1, 1).bit_length()
q2_bits = 31 - tile_bits - v_bits
qmax2 = (1 << q2_bits) - 1


@jax.jit
def stage_d(skey, sval, scale):
    stile = skey >> qp_bits
    bounds = jnp.searchsorted(stile, jnp.arange(n_tiles + 1)).astype(i32)
    cnt_t = bounds[1:] - bounds[:-1]
    nv_t = jnp.maximum((cnt_t + G - 1) // G, 1)
    vcum = jnp.cumsum(nv_t)
    vidx = jnp.arange(nv, dtype=i32)
    vtile = jnp.searchsorted(vcum, vidx, side="right").astype(i32)
    live_v = vidx < vcum[-1]
    vtile_c = jnp.clip(vtile, 0, n_tiles - 1)
    lv = vidx - (vcum - nv_t)[vtile_c]
    seg0 = bounds[:-1][vtile_c]
    seg1 = bounds[1:][vtile_c]
    src0 = seg0 + lv * G
    src = src0[:, None] + jnp.arange(G, dtype=i32)[None, :]
    pvalid = src < seg1[:, None]
    tri_aligned = jnp.where(pvalid, sval[jnp.minimum(src, cap - 1)], -1)
    has_pair = lv * G < cnt_t[vtile_c]
    kfirst = skey[jnp.minimum(src0, cap - 1)]
    vqq = jnp.where(has_pair, kfirst & ((1 << qp_bits) - 1), qmax_p)
    qq2 = jnp.where(vqq == 0, 0,
                    jnp.where(vqq >= qmax_p, qmax2,
                              jnp.clip((vqq * (qmax2 - 1)) // (qmax_p - 1),
                                       1, qmax2 - 1)))
    words = jnp.where(live_v,
                      (vtile << (q2_bits + v_bits)) | (qq2 << v_bits) | vidx,
                      jnp.int32(0x7FFFFFFF))
    keep = live_v & (lv < rp.VISIT_CAP)
    words = jnp.sort(jnp.where(keep, words, jnp.int32(0x7FFFFFFF)))
    counts = jnp.minimum(nv_t, rp.VISIT_CAP)
    return tri_aligned, words, counts


out_d = stage_d(skey, sval, scale)
_sync(out_d)
print(f"D alignment+words: {timeit(stage_d, skey, sval, scale):.2f} ms",
      flush=True)
tri_aligned = out_d[0]


@jax.jit
def stage_e(tri_aligned, rows16):
    tri_idx = jnp.where(tri_aligned >= 0, tri_aligned, t).reshape(-1)
    return rows16[tri_idx].reshape(nv, G, 16).transpose(0, 2, 1) \
        .reshape(nv * 16, G)


_sync(stage_e(tri_aligned, rows16))
print(f"E table gather+transpose: {timeit(stage_e, tri_aligned, rows16):.2f}"
      " ms", flush=True)
