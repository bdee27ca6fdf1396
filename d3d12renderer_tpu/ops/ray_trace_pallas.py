"""Pallas ray-triangle intersection kernel: the TPU answer to RT cores.

Pointer-chasing BVH traversal gathers ~60 values per ray-step and measures
0.01 Mrays/s on v5e (TPU gathers serialize).  The dense plane-test
formulation (render/bvh.py closest_hit_dense) lifts that to ~1.4 Mrays/s but
is HBM-bound: XLA materializes the (rays x tris) intermediates between scan
steps.  This kernel keeps everything resident in VMEM — a ray block and a
triangle chunk meet on-chip, compute t/u/v via small matmuls + VPU
elementwise, reduce to a per-ray running closest hit, and only the final
(rays,) results ever touch HBM.

Grid: (ray_blocks, tri_chunks) with the triangle axis innermost; the output
block revisits across tri chunks (standard accumulation pattern), giving a
sequential min-reduce per ray block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Ray-block height (env-tunable): per-visit VPU work scales with the block
# height, and a SMALLER block has a TIGHTER frustum (fewer chunk visits pass
# cluster culling) and an earlier occlusion exit (max over fewer rays) — so
# on big scenes and incoherent wavefronts shrinking the block trades a
# sub-linear rise in visit count against a linear drop in per-visit cost.
# Must be a multiple of 8 (f32 sublane tile).
RAY_BLOCK = int(_os.environ.get("D3D12TPU_RAY_BLOCK", "1024"))
if RAY_BLOCK % 8 != 0 or RAY_BLOCK <= 0:
    # Per-ray values travel as (rays, PRL=128) lane-replicated arrays with
    # (RAY_BLOCK, PRL) VMEM blocks — see the per_ray BlockSpec note.
    raise ValueError(f"D3D12TPU_RAY_BLOCK must be a positive multiple of 8, "
                     f"got {RAY_BLOCK}")
# Per-ray lane width.  Per-ray running state (t_best, winning tri) is
# logically one value per ray, but three constraints pick this layout:
#   * Mosaic (jax 0.9.0, lowering.py:681-697) rejects a (1, RAY_BLOCK) row
#     block over a multi-row (sb, RAY_BLOCK) array (sublane dim 1 != sb);
#   * an in-kernel (8, W)->(RB,) reshape is a lane<->sublane relayout
#     Mosaic cannot lower ("infer-vector-layout: unsupported shape cast");
#   * an (N, 1) column array tiles to T(8,128) — 128x lane padding — and
#     XLA's VMEM promotion counts LOGICAL bytes, so it stacks the padded
#     32 MB/64k-ray output in scoped VMEM and OOMs at compile time.
# A full (RAY_BLOCK, 128) lane-replicated tile sidesteps all three: the
# block is natively tiled, the kernel computes on the (RB, 1) lane-0 slice
# (which broadcasts against the (RB, C) intersection tiles for free), and
# logical size == padded size keeps XLA's promotion accounting honest.
# The 128x HBM footprint is noise next to the (RB, C) compute.
PRL = 128
# Triangle-chunk width (env-tunable): brute-force sweep on v5e said 512 ->
# 6.4, 1024 -> 6.7 Mrays/s @53k tris (>=2048 exceeds VMEM); on the CULLED
# path smaller chunks mean tighter per-chunk AABBs (fewer visits) but more
# grid steps — D3D12TPU_RAY_CHUNK lets big scenes pick the tradeoff.
# Note: the BVH disk cache keys on this (render/bvh.py _bvh_cache_key) and
# in-kernel sub-cluster culling requires 1024 (128-lane-aligned sub rows).
TRI_CHUNK = int(_os.environ.get("D3D12TPU_RAY_CHUNK", "1024"))
assert TRI_CHUNK & (TRI_CHUNK - 1) == 0 and TRI_CHUNK >= 128, TRI_CHUNK

# Escape hatch: D3D12TPU_RAY_EARLYOUT=0 disables the front-to-back visit
# ordering + in-kernel occlusion skip (falls back to chunk-ascending visits),
# in case a toolchain update rejects the SMEM scale input or the in-kernel
# reduce.  Applied at trace time.

EARLYOUT = _os.environ.get("D3D12TPU_RAY_EARLYOUT", "1") != "0"

# Packed-key winner selection (D3D12TPU_RAY_PACKSEL=0 disables): the per-visit
# one-hot argmin (iota/==/where/min chains + u/v select, ~9 VPU passes over
# the (RAY_BLOCK, TRI_CHUNK) tile) collapses to ONE int32 min-reduce over
# bitcast(t) & ~(C-1) | column — valid because t >= 0 makes its f32 bits
# order-preserving as int32.  The winning column steals the low 10 mantissa
# bits, so among triangles whose t agree to ~1.2e-4 relative the lower column
# wins; `t` itself stays the exact minimum (separate f32 reduce), and the
# winner's u/v are recomputed OUTSIDE the kernel from its plane row (the
# kernel no longer carries per-ray u/v at all).
PACKSEL = _os.environ.get("D3D12TPU_RAY_PACKSEL", "1") != "0"

# Sub-cluster culling (a third, in-kernel 128-tri-sub-AABB culling level)
# was tried and REMOVED (round 5): measured on v5e at 64k rays it lost on
# every scene — 4.48 vs 3.26 ms @53k tris, 17.5 vs 10.6 ms @495k tris —
# because a whole (RB, 128) sub-tile only skips when EVERY ray in the
# block agrees, which the lax.cond-free masked form cannot exploit
# per-lane.  The two shipping culling levels (per-ray-block cluster
# shortlists + front-to-back entry early-out) are the ones that win; see
# docs/PERF.md for the ablation.

# Scoped-VMEM budget for the ray kernels.  The (RAY_BLOCK, TRI_CHUNK)
# intersection intermediates (~4 MB each at the 1024x1024 default) plus the
# lane-replicated per-ray windows total ~18 MB at peak liveness — just over
# Mosaic's default 16 MB scoped-vmem limit.  v5e has 128 MB of VMEM; raise
# the per-kernel limit rather than shrinking the tiles (smaller tiles
# measured slower: TRI_CHUNK sweep at the top of this file).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _best_in_chunk(o, d, tri, t_best):
    """Closest accepted hit of a ray block against one triangle chunk.

    o/d (RB, 3); tri (16, C) plane table rows; t_best (RB, 1) current best
    (per-ray values are columns — see the RAY_BLOCK layout note).  Returns
    (t_min, win, uk, vk), all (RB, 1): t_min exact min accepted t (inf where
    none), win winning chunk-local column, uk/vk the winner's barycentrics
    on the one-hot path or None on the PACKSEL path (caller recomputes u/v
    outside the kernel from the winner's plane row)."""
    # Table rows: n(3), n_off, e1p(3), e1_off, e2p(3), e2_off, valid, pad(3).
    # The three plane OFFSETS ride the matmuls as a homogeneous origin
    # column (K=3 -> 4, free on the MXU's padded contraction) instead of
    # separate (RB, C) VPU adds:
    #   dot([-o, 1], [n; n_off])   = n_off - o.n   (the t numerator)
    #   dot([ o, 1], [e1p; e1_off]) = o.e1p + e1_off  (ditto v)
    one = jnp.ones_like(o[:, :1])
    no1 = jnp.concatenate([-o, one], -1)                       # (RB, 4)
    o1 = jnp.concatenate([o, one], -1)
    f32 = jnp.float32
    num = jnp.dot(no1, tri[0:4], preferred_element_type=f32)   # (RB, C)
    nd = jnp.dot(d, tri[0:3], preferred_element_type=f32)
    # No guard on nd == 0 — IEEE does the rejection for free: padding rows
    # (all-zero planes) give 0/0 = NaN, parallel rays give +-inf; NaN fails
    # every compare below and inf fails t <= t_best.
    t = num / nd
    u = (jnp.dot(o1, tri[4:8], preferred_element_type=f32)
         + t * jnp.dot(d, tri[4:7], preferred_element_type=f32))
    v = (jnp.dot(o1, tri[8:12], preferred_element_type=f32)
         + t * jnp.dot(d, tri[8:11], preferred_element_type=f32))

    # One accept min-tree: inside (u, v, 1-u-v >= 0) AND the t window
    # collapse to a single >= 0 compare (NaN propagates to rejection).
    inside = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v))
    window = jnp.minimum(t - 1e-4, t_best - t)
    ok = jnp.minimum(inside, window) >= 0
    t_m = jnp.where(ok, t, jnp.inf)
    c = t_m.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
    t_min = jnp.min(t_m, axis=-1, keepdims=True)                  # (RB, 1)
    if PACKSEL:
        # One int32 reduce replaces the iota/==/where/min one-hot chain:
        # t_m >= 0, so its f32 bits are order-preserving as int32; the
        # winning column rides the low log2(C) mantissa bits (see PACKSEL).
        assert c & (c - 1) == 0, c
        key = ((jax.lax.bitcast_convert_type(t_m, jnp.int32)
                & jnp.int32(~(c - 1))) | cols)
        win = jnp.min(key, axis=-1, keepdims=True) & (c - 1)      # (RB, 1)
        return t_min, win, None, None
    is_min = t_m == t_min
    first = jnp.min(jnp.where(is_min, cols, c), -1, keepdims=True)
    sel = cols == first
    uk = jnp.sum(jnp.where(sel, u, 0.0), -1, keepdims=True)
    vk = jnp.sum(jnp.where(sel, v, 0.0), -1, keepdims=True)
    return t_min, first, uk, vk


def _kernel(o_ref, d_ref, tmax_ref, tri_ref, t_ref, tri_id_ref,
            u_ref=None, v_ref=None):
    tc = pl.program_id(1)

    @pl.when(tc == 0)
    def _init():
        t_ref[:] = jnp.broadcast_to(tmax_ref[:], t_ref.shape)
        tri_id_ref[:] = jnp.full_like(tri_id_ref, -1)
        if not PACKSEL:
            u_ref[:] = jnp.zeros_like(u_ref)
            v_ref[:] = jnp.zeros_like(v_ref)

    # Per-ray refs are (RAY_BLOCK, PRL) lane-replicated tiles; compute on
    # the lane-0 column, store broadcast (see the PRL layout note).
    t_best = t_ref[:, 0:1]
    t_min, win, uk, vk = _best_in_chunk(o_ref[:], d_ref[:], tri_ref[:],
                                        t_best)
    better = t_min < t_best
    base = tc * tri_ref.shape[1]
    rep = t_ref.shape
    t_ref[:] = jnp.broadcast_to(jnp.where(better, t_min, t_best), rep)
    tri_id_ref[:] = jnp.broadcast_to(
        jnp.where(better, base + win, tri_id_ref[:, 0:1]), rep)
    if not PACKSEL:
        u_ref[:] = jnp.broadcast_to(
            jnp.where(better, uk, u_ref[:, 0:1]), rep)
        v_ref[:] = jnp.broadcast_to(
            jnp.where(better, vk, v_ref[:, 0:1]), rep)


def pack_tris(dense) -> jnp.ndarray:
    """(16, T) row-major plane+validity table (transposed so kernel
    slices are contiguous rows and the dots need no in-kernel transpose).

    Rows 13/14 carry the sub-cluster AABBs when the table has them:
    sub-cluster j's lo sits at row 13, lanes [128j, 128j+3), its hi at
    row 14 (128-aligned so in-kernel loads stay lane-aligned).  Empty
    (all-padding) sub-clusters store NaN bounds — every slab comparison
    is then false, so the kernel never visits them."""
    t = dense.n.shape[0]
    pad = (-t) % TRI_CHUNK
    tbl = jnp.concatenate([
        dense.n, dense.n_off[:, None],
        dense.e1p, dense.e1_off[:, None],
        dense.e2p, dense.e2_off[:, None],
        dense.valid.astype(jnp.float32)[:, None],
        jnp.zeros((t, 3), jnp.float32),
    ], axis=-1)
    tbl = jnp.pad(tbl, ((0, pad), (0, 0))).T
    return tbl


def _cluster_cull(origin, direction, t_max, lo, hi, group=64):
    """Per-(ray block, cluster) need mask + entry distance.

    origin/direction (nb, RAY_BLOCK, 3); t_max (nb, RAY_BLOCK); lo/hi (C', 3)
    cluster AABBs.  Returns (needed, entry): needed (nb, C') bool — block rb
    must visit chunk c; entry (nb, C') f32 — the smallest AABB entry distance
    over the block's rays that can hit it (+inf where not needed).  Processed
    `group` ray blocks at a time to bound the (group, RAY_BLOCK, C')
    intermediate.

    This is the TPU replacement for per-ray BVH descent (reference DXR TLAS
    walk): a coarse top level evaluated densely + compaction, instead of a
    per-ray pointer chase."""
    nb = origin.shape[0]
    nc = lo.shape[0]
    pad_b = (-nb) % group
    o = jnp.pad(origin, ((0, pad_b), (0, 0), (0, 0)))
    d = jnp.pad(direction, ((0, pad_b), (0, 0), (0, 0)), constant_values=1.0)
    tm = jnp.pad(t_max, ((0, pad_b), (0, 0)))

    def one_group(args):
        o, d, tm = args                       # (G, RB, 3), (G, RB)
        inv_d = 1.0 / jnp.where(
            jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
        # (G, RB, C', 3) slab intervals.
        t0 = (lo[None, None] - o[:, :, None]) * inv_d[:, :, None]
        t1 = (hi[None, None] - o[:, :, None]) * inv_d[:, :, None]
        tmin = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
        tmax = jnp.maximum(t0, t1).min(-1)
        hit = (tmax >= tmin) & (tmin <= tm[:, :, None])
        entry = jnp.min(jnp.where(hit, tmin, jnp.inf), axis=1)  # (G, C')
        return jnp.any(hit, axis=1), entry

    needed, entry = jax.lax.map(
        one_group,
        (o.reshape(-1, group, RAY_BLOCK, 3),
         d.reshape(-1, group, RAY_BLOCK, 3),
         tm.reshape(-1, group, RAY_BLOCK)),
    )
    return (needed.reshape(-1, nc)[:nb], entry.reshape(-1, nc)[:nb])


def _visit_bits(sb: int, nc: int) -> Tuple[int, int, int]:
    """Bit layout of a packed visit word: (blk_bits, entry_bits, chunk_bits).

    blk | entry_q | chunk from high to low, so one jnp.sort orders visits by
    ray block, then front-to-back by quantized chunk-entry distance."""
    blk_bits = max(sb - 1, 0).bit_length()
    chunk_bits = max(max(nc - 1, 0).bit_length(), 1)
    entry_bits = 31 - blk_bits - chunk_bits
    assert entry_bits >= 8, (sb, nc)
    return blk_bits, entry_bits, chunk_bits


def _flat_visits(needed, entry):
    """Compact the (block, chunk) visit mask into ONE sorted visit list.

    needed/entry (sb, nc) from _cluster_cull -> (packed, total, scale):
    packed (sb*nc,) int32 where entry v of the first `total` is
    blk << (eb+cb) | entry_q << cb | chunk — sorted ascending, i.e. by ray
    block, then FRONT-TO-BACK by conservative (rounded-down) quantized entry
    distance; the tail is a 0x7fffffff sentinel (never visited — the kernel
    grid is `total`).  scale (1,) f32 dequantizes entry_q to a lower bound
    on the true entry distance, which the kernel compares against the
    block's worst current hit to SKIP occluded chunks entirely.

    The dynamic grid is what lets the kernel run the NUMBER OF REAL VISITS
    instead of sb*nc steps; the front-to-back order is what makes the
    in-kernel early-out effective (deep scenes: most visits are occluded
    by the time they come up)."""
    sb, nc = needed.shape
    blk_bits, entry_bits, chunk_bits = _visit_bits(sb, nc)
    qmax = (1 << entry_bits) - 1
    # Blocks with no needed chunk get one forced chunk-0 visit so the
    # kernel's per-block output init always runs.
    none = ~jnp.any(needed, axis=-1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (sb, nc), 1) == 0
    needed = needed | (none[:, None] & col0)
    entry = jnp.where(none[:, None] & col0, 0.0, entry)

    if EARLYOUT:
        emax = jnp.max(jnp.where(jnp.isfinite(entry) & needed, entry, 0.0))
        scale = jnp.maximum(emax, 1e-6) / qmax
        q = jnp.clip(entry / scale, 0.0, float(qmax)).astype(jnp.int32)
    else:
        scale = jnp.ones(())
        q = jnp.zeros(entry.shape, jnp.int32)  # chunk-ascending visit order

    cid = jax.lax.broadcasted_iota(jnp.int32, (sb, nc), 1)
    blk = jax.lax.broadcasted_iota(jnp.int32, (sb, nc), 0)
    word = ((blk << (entry_bits + chunk_bits)) | (q << chunk_bits) | cid)
    packed = jnp.where(needed, word, jnp.int32(0x7FFFFFFF))
    return (jnp.sort(packed.ravel()), jnp.sum(needed),
            scale.reshape(1).astype(jnp.float32))


def regroup_perm(o, d, lo, hi, obits=4, dbits=4):
    """Coherence-restoring ray order: a 6-axis MSB-first Morton interleave
    of the DIRECTION cell (dbits/axis over [-1,1]) and the ORIGIN cell
    (obits/axis inside the scene AABB).  Rays in the same cell land in the
    same RAY_BLOCK kernel block, so per-block cluster culling prunes like
    it does for primary tiles.  (This replaces per-ray traversal divergence
    handling in the reference's DXR path, raytracing.h:41-53 — on TPU
    coherence is a BLOCK property.)

    Direction bits lead at every level (the top 3 ARE the old octant key),
    which measured 1.8x better than the former octant+origin-Morton key on
    single-origin random-direction wavefronts (23.0 -> 13.0 ms, 64k rays,
    53k tris — within 5% of fully coherent tiles); random-origin AND
    random-direction wavefronts are unchanged (~3x coherent, the residual
    cliff is geometric: such blocks genuinely span the scene)."""
    oq = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6) * (1 << obits),
                  0.0, float((1 << obits) - 1)).astype(jnp.uint32)
    dq = jnp.clip((d * 0.5 + 0.5) * (1 << dbits),
                  0.0, float((1 << dbits) - 1)).astype(jnp.uint32)
    key = jnp.zeros(o.shape[0], jnp.uint32)
    for bit in range(max(obits, dbits) - 1, -1, -1):
        for arr, bits in ((dq, dbits), (oq, obits)):
            if bit < bits:
                for ax in range(3):
                    key = (key << 1) | ((arr[:, ax] >> bit) & 1)
    return jnp.argsort(key)


def _culled_kernel(packed_ref, scale_ref, o_ref, d_ref, tmax_ref, tri_ref,
                   t_ref, tri_id_ref, u_ref=None, v_ref=None, *, entry_bits,
                   chunk_bits, any_hit=False):
    """Same math as _kernel, but grid step v processes the visit
    packed[v] = blk | entry_q | chunk (see _flat_visits): the BlockSpecs
    route the right ray block and triangle chunk in, and outputs re-init
    whenever the ray block changes (visits are sorted by block, so output
    blocks are revisited consecutively).

    Early termination: visits arrive front-to-back per block, and entry_q
    dequantizes (via scale) to a LOWER bound on the chunk's AABB entry
    distance for every ray in the block.  Once every ray's current best hit
    is nearer than that bound the chunk cannot improve any ray — skip the
    whole visit.  This is the block-level analogue of a per-ray BVH
    traversal's ordered descent + t-max pruning (reference DXR,
    raytracing.h:41-53)."""
    v_id = pl.program_id(0)
    word = packed_ref[v_id]
    blk = word >> (entry_bits + chunk_bits)
    prev = packed_ref[jnp.maximum(v_id, 1) - 1] >> (entry_bits + chunk_bits)

    @pl.when((v_id == 0) | (blk != prev))
    def _init():
        t_ref[:] = jnp.broadcast_to(tmax_ref[:], t_ref.shape)
        tri_id_ref[:] = jnp.full_like(tri_id_ref, -1)
        if not PACKSEL:
            u_ref[:] = jnp.zeros_like(u_ref)
            v_ref[:] = jnp.zeros_like(v_ref)

    chunk = word & ((1 << chunk_bits) - 1)

    # Per-ray refs are (RAY_BLOCK, PRL) lane-replicated tiles; compute on
    # the lane-0 column, store broadcast (see the PRL layout note).
    def _do_tile(col0, width):
        t_best = t_ref[:, 0:1]
        tile = (tri_ref[:] if width == tri_ref.shape[1]
                else tri_ref[:, col0:col0 + width])
        t_min, win, uk, vk = _best_in_chunk(o_ref[:], d_ref[:], tile, t_best)
        better = t_min < t_best
        base = chunk * tri_ref.shape[1] + col0
        t_new = jnp.where(better, t_min, t_best)
        if any_hit:
            # Occlusion query: any hit below t_max settles the ray.  Collapse
            # its t so (a) no further triangle can pass t < t_best and (b) the
            # block's entry-distance early-out fires as soon as EVERY ray is
            # occluded — remaining visits skip entirely.
            t_new = jnp.where((tri_id_ref[:, 0:1] >= 0) | better,
                              jnp.float32(1.01e-4), t_new)
        rep = t_ref.shape
        t_ref[:] = jnp.broadcast_to(t_new, rep)
        tri_id_ref[:] = jnp.broadcast_to(
            jnp.where(better, base + win, tri_id_ref[:, 0:1]), rep)
        if not PACKSEL:
            u_ref[:] = jnp.broadcast_to(
                jnp.where(better, uk, u_ref[:, 0:1]), rep)
            v_ref[:] = jnp.broadcast_to(
                jnp.where(better, vk, v_ref[:, 0:1]), rep)

    def _visit():
        _do_tile(0, tri_ref.shape[1])

    if EARLYOUT:
        entry_lo = ((word >> chunk_bits) & ((1 << entry_bits) - 1)
                    ).astype(jnp.float32) * scale_ref[0]
        pl.when(jnp.max(t_ref[:, 0:1]) >= entry_lo)(_visit)
    else:
        _visit()


def _uv_outside(dense, origin, direction, t, tri, hit, any_hit):
    """Winner barycentrics recomputed from the hit triangle's plane row
    (PACKSEL path: the kernel no longer carries per-ray u/v).  R-sized
    gathers + dots in XLA — negligible next to the kernel."""
    if any_hit:  # occlusion queries never consume uv
        return jnp.zeros(t.shape + (2,), jnp.float32)
    ti = jnp.maximum(tri, 0)
    p = origin + t[:, None] * direction
    u = jnp.sum(p * dense.e1p[ti], -1) + dense.e1_off[ti]
    v = jnp.sum(p * dense.e2p[ti], -1) + dense.e2_off[ti]
    uv = jnp.stack([u, v], -1)
    return jnp.where(hit[:, None], uv, 0.0)


SLAB_BLOCKS = 64  # ray blocks per pallas_call at small chunk counts


def _slab_blocks_for(nc: int) -> int:
    """Ray blocks per pallas_call, shrunk for big scenes so the prefetched
    (slab_blocks x nc) int32 chunk-id table stays within SMEM budget
    (~16 KB = 4096 int32)."""
    return max(1, min(SLAB_BLOCKS, 4096 // max(nc, 1)))


def closest_hit_pallas_culled(dense, origin, direction, t_max=1e30,
                              interpret=False, regroup=False, any_hit=False,
                              stats=False):
    """Two-level closest hit: cluster-AABB culling + ordered chunk visits.

    Scales past the brute-force kernel's rays x ALL-tris cost: each ray block
    only DMAs and intersects the triangle chunks whose cluster AABB it can
    hit, front-to-back with an in-kernel occlusion early-out (see
    _culled_kernel).  Exact — culling only skips chunks that cannot improve
    any ray's current hit.  Rays run in SLAB_BLOCKS-block slabs so the
    scalar-prefetched visit table stays within SMEM.

    regroup=True sorts the rays by (direction octant, origin Morton cell)
    first and inverse-scatters the outputs — an exact permutation that
    restores block coherence for scattered (bounce-like) rays.

    any_hit=True answers occlusion queries: `hit` is exact (something lies
    in (0, t_max)) but `t`/`uv` are NOT the closest hit — rays stop at the
    first intersected chunk, letting fully-occluded blocks skip the rest of
    their visit list."""
    if regroup:
        lo = jnp.min(dense.cluster_lo, axis=0)
        hi = jnp.max(dense.cluster_hi, axis=0)
        perm = regroup_perm(origin, direction, lo, hi)
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              (origin.shape[0],))
        res = closest_hit_pallas_culled(
            dense, origin[perm], direction[perm], t_max=tm[perm],
            interpret=interpret, regroup=False, any_hit=any_hit, stats=stats)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        return {k: (v if k == "visits" else v[inv]) for k, v in res.items()}

    tbl = pack_tris(dense)
    t_count = tbl.shape[1]
    nc = t_count // TRI_CHUNK
    # Even at one ray block per slab, the prefetched (1 x nc) chunk-id table
    # must fit the ~16 KB SMEM budget.
    assert nc <= 4096, (
        f"{nc} chunks ({t_count} padded tris) exceeds the SMEM chunk-id "
        f"budget; split the scene or raise TRI_CHUNK")
    sb = _slab_blocks_for(nc)

    r = origin.shape[0]
    slab = sb * RAY_BLOCK
    pad_r = (-r) % slab
    o = jnp.pad(origin, ((0, pad_r), (0, 0)))
    d = jnp.pad(direction, ((0, pad_r), (0, 0)), constant_values=1.0)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tmax = jnp.pad(tmax, (0, pad_r))
    nslabs = o.shape[0] // slab

    _, entry_bits, chunk_bits = _visit_bits(sb, nc)
    bshift = entry_bits + chunk_bits
    cmask = (1 << chunk_bits) - 1
    ray_spec = pl.BlockSpec((RAY_BLOCK, 3),
                            lambda v, pk: (pk[v] >> bshift, 0),
                            memory_space=pltpu.VMEM)
    # Per-ray OUTPUTS travel as (sb*RAY_BLOCK, PRL) lane-replicated arrays
    # (see the PRL layout note at the top: the (1, RAY_BLOCK) row block is
    # Mosaic-illegal, in-kernel row<->column relayouts don't lower, and a
    # (N, 1) column output gets VMEM-promoted by XLA on its LOGICAL size
    # while its T(8,128)-padded size OOMs the scoped-vmem stack).  The tmax
    # INPUT stays a cheap (N, 1) column — inputs aren't stack-allocated.
    per_ray = pl.BlockSpec((RAY_BLOCK, PRL),
                           lambda v, pk: (pk[v] >> bshift, 0),
                           memory_space=pltpu.VMEM)
    tmax_spec = pl.BlockSpec((RAY_BLOCK, 1),
                             lambda v, pk: (pk[v] >> bshift, 0),
                             memory_space=pltpu.VMEM)
    n_out = 2 if PACKSEL else 4
    out_shapes = (
        jax.ShapeDtypeStruct((sb * RAY_BLOCK, PRL), jnp.float32),
        jax.ShapeDtypeStruct((sb * RAY_BLOCK, PRL), jnp.int32),
        jax.ShapeDtypeStruct((sb * RAY_BLOCK, PRL), jnp.float32),
        jax.ShapeDtypeStruct((sb * RAY_BLOCK, PRL), jnp.float32),
    )[:n_out]

    def one_slab(args):
        o_s, d_s, tm_s = args  # (slab, 3), (slab, 3), (slab,)
        needed, entry = _cluster_cull(
            o_s.reshape(sb, RAY_BLOCK, 3),
            d_s.reshape(sb, RAY_BLOCK, 3),
            tm_s.reshape(sb, RAY_BLOCK),
            dense.cluster_lo, dense.cluster_hi,
            group=sb,
        )
        packed, total, scale = _flat_visits(needed, entry)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),  # DYNAMIC: exactly the real visits, no skipped steps
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dequant scale (1,)
                ray_spec, ray_spec, tmax_spec,
                pl.BlockSpec((16, TRI_CHUNK),
                             lambda v, pk: (0, pk[v] & cmask),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(per_ray, per_ray, per_ray, per_ray)[:n_out],
        )
        kouts = pl.pallas_call(
            functools.partial(_culled_kernel, entry_bits=entry_bits,
                              chunk_bits=chunk_bits, any_hit=any_hit),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(packed, scale, o_s, d_s, tm_s.reshape(-1, 1), tbl)
        # Drop the lane-replication INSIDE the mapped function: lax.map then
        # stacks (slab,) columns instead of (slab, PRL) tiles — the full
        # tiles otherwise get VMEM-placed around the while body and blow the
        # scoped-vmem budget (measured: 21.2 MB vs a 19.3 MB limit @53k
        # tris), and the stacked copies would cost PRL x the HBM.
        return tuple(x[:, 0] for x in kouts) + (total,)

    if nslabs == 1:
        *outs, visits = one_slab((o, d, tmax))
    else:
        *outs, visits = jax.lax.map(
            one_slab,
            (o.reshape(nslabs, slab, 3), d.reshape(nslabs, slab, 3),
             tmax.reshape(nslabs, slab)),
        )
        outs = tuple(x.reshape(-1) for x in outs)
        visits = visits.sum()

    t = outs[0][:r]
    tri = outs[1][:r]
    hit = tri >= 0
    if PACKSEL:
        uv = _uv_outside(dense, origin, direction, t, tri, hit, any_hit)
    else:
        uv = jnp.stack([outs[2][:r], outs[3][:r]], -1)
    res = {"t": t, "tri": tri, "uv": uv, "hit": hit}
    if stats:
        # Chunk-visit count (post cluster-cull, pre early-out): the kernel
        # grid size — the direct "how much did culling prune" observable.
        res["visits"] = visits
    return res


def closest_hit_pallas(dense, origin, direction, t_max=1e30,
                       interpret=False, regroup=False, any_hit=False):
    """Drop-in closest hit over a DenseTris table.

    origin/direction (R, 3); returns {t, tri, uv, hit} like closest_hit.
    Routes through the two-level culled kernel when the table spans more
    than one chunk and cluster AABBs exist; `regroup` restores block
    coherence for scattered rays there (no-op on the single-chunk path);
    `any_hit` relaxes to an occlusion query there (exact `hit`, t not
    necessarily closest)."""
    if (getattr(dense, "cluster_lo", None) is not None
            and dense.n.shape[0] > TRI_CHUNK):
        return closest_hit_pallas_culled(dense, origin, direction,
                                         t_max=t_max, interpret=interpret,
                                         regroup=regroup, any_hit=any_hit)
    tbl = pack_tris(dense)
    t_count = tbl.shape[1]

    r = origin.shape[0]
    pad_r = (-r) % RAY_BLOCK
    o = jnp.pad(origin, ((0, pad_r), (0, 0)))
    d = jnp.pad(direction, ((0, pad_r), (0, 0)), constant_values=1.0)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tmax = jnp.pad(tmax, (0, pad_r))
    rp = o.shape[0]

    grid = (rp // RAY_BLOCK, t_count // TRI_CHUNK)

    n_out = 2 if PACKSEL else 4
    nrb = rp // RAY_BLOCK
    # (rp, PRL) lane-replicated per-ray outputs, (rp, 1) tmax input — see
    # the PRL layout note at the top of the module.
    out_shapes = (
        jax.ShapeDtypeStruct((rp, PRL), jnp.float32),
        jax.ShapeDtypeStruct((rp, PRL), jnp.int32),
        jax.ShapeDtypeStruct((rp, PRL), jnp.float32),
        jax.ShapeDtypeStruct((rp, PRL), jnp.float32),
    )[:n_out]
    ray_spec = pl.BlockSpec((RAY_BLOCK, 3), lambda rb, tc: (rb, 0),
                            memory_space=pltpu.VMEM)
    per_ray = pl.BlockSpec((RAY_BLOCK, PRL), lambda rb, tc: (rb, 0),
                           memory_space=pltpu.VMEM)
    tmax_spec = pl.BlockSpec((RAY_BLOCK, 1), lambda rb, tc: (rb, 0),
                             memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            ray_spec, ray_spec, tmax_spec,
            pl.BlockSpec((16, TRI_CHUNK), lambda rb, tc: (0, tc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(per_ray, per_ray, per_ray, per_ray)[:n_out],
        out_shape=out_shapes,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(o, d, tmax.reshape(-1, 1), tbl)
    outs = tuple(x[:, 0] for x in outs)

    t = outs[0][:r]
    tri = outs[1][:r]
    hit = tri >= 0
    if PACKSEL:
        uv = _uv_outside(dense, origin, direction, t, tri, hit, any_hit)
    else:
        uv = jnp.stack([outs[2][:r], outs[3][:r]], -1)
    return {"t": t, "tri": tri, "uv": uv, "hit": hit}
