"""Pallas tile-binned rasterizer: TPU primary visibility at content scale.

The ray kernel (ops/ray_trace_pallas.py) answers primary visibility by
intersecting every screen-tile ray block against every triangle chunk whose
3D cluster AABB its frustum can reach — ~15 chunk visits/block on the 260k-tri
atrium at 1080p, i.e. ~32 G ray-tri tests/frame (measured 287 ms).  Primary
visibility has far more structure than that: it is a single projective
transform, so binning TRIANGLES to SCREEN tiles replaces the 3D frustum/AABB
test with an exact 2D rectangle overlap, and the per-pair test drops from a
full ray-triangle intersection (~17 VPU passes incl. a divide) to three edge
evaluations and an interpolated-depth compare (no divide at all).

This is the TPU equivalent of the reference's hardware rasterizer geometry
pass (reference: src/rendering/main_renderer.cpp depth prepass + opaque pass
at 1920x1080, src/main.cpp:121): a tile-binned software rasterizer in
2D homogeneous coordinates [Olano & Greer 1997] — NO near-plane clipping,
triangles crossing w=0 are handled exactly by the sign rules below.

Formulation (per frame, all XLA until the kernel):
  * Each vertex maps to homogeneous PIXEL coordinates V = (X, Y, W) with
    X/W = pixel x, Y/W = pixel y, W = view depth (matching
    render/camera.py generate_rays pixel conventions exactly).
  * Edge planes E0 = cross(V1,V2)/D, E1 = cross(V2,V0)/D, E2 = cross(V0,V1)/D
    with D = det[V0;V1;V2].  For screen point p = (px, py, 1):
    the camera ray through p hits the triangle plane with perspective-correct
    barycentrics li = Ei.p / q and interpolated attribute-over-depth
    q(p) = sum_i a_i Ei.p (a_i = 1 gives q = 1/view-depth).
    Covered AND in front  <=>  min(E0.p, E1.p, E2.p) >= 0 AND q(p) > 0 —
    exact for any triangle, including near-plane-crossing ones (mixed W
    signs flip through the 1/D normalization) and back-facing ones (D < 0
    likewise; visibility is two-sided, matching the ray path).
  * Depth resolve: the winner per pixel MAXIMIZES q (nearest surface).  The
    kernel carries q per pixel plus a packed-key winner id, exactly like the
    ray kernel's PACKSEL min-reduce but as a max.
  * Triangles keep BVH leaf order in GROUPs of 128 (no per-frame gathers —
    a 2M-row gather measures ~22 ms on v5e; binning metadata is reduced per
    group instead).  Per 64x32-pixel tile, the visit list is the top
    VISIT_CAP groups by conservative max-q (front-to-back), selected with
    one jax.lax.top_k — the raster analogue of the ray kernel's
    front-to-back sorted chunk visits, with the same in-kernel early-out:
    once every pixel's current q exceeds a group's max possible q, the
    visit is skipped.

Outputs match render/bvh.closest_hit's contract ({t, tri, uv, hit}) so the
G-buffer (render/gbuffer.py) is produced by the same downstream math —
t and barycentrics are recomputed OUTSIDE from the winner exactly like the
ray kernel's PACKSEL path.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Screen tile (pixels). 64x32 measured the best pair count on the atrium
# (5.97 G pixel-tri tests geometric vs 32 G for the ray path).
TILE_X = int(_os.environ.get("D3D12TPU_RASTER_TILE_X", "64"))
TILE_Y = int(_os.environ.get("D3D12TPU_RASTER_TILE_Y", "32"))
PX = TILE_X * TILE_Y                  # pixels per tile = kernel rows
assert PX % 8 == 0
# Triangles per group: 128 = one lane tile, the finest granularity whose
# table slice stays lane-aligned (the same constraint that pins the ray
# kernel's sub-clusters at 128).
GROUP = 128
# Visit-list cap per tile (top-K nearest groups).  Mean geometric
# visits/tile on the atrium is ~22; overflow beyond the cap drops the
# FARTHEST groups only (they are sorted front-to-back) and is counted.
VISIT_CAP = int(_os.environ.get("D3D12TPU_RASTER_CAP", "128"))
# Tiles per pallas_call: SLAB_TILES * VISIT_CAP prefetched visit words must
# fit the ~16 KB SMEM budget (4096 int32), like the ray kernel's slabs.
SLAB_TILES = max(1, 4096 // VISIT_CAP)

PRL = 128   # lane replication of per-pixel outputs (see ray kernel note)
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_W_EPS = 1e-6


class FrameTables(NamedTuple):
    """Per-(frame, view) rasterization tables (all device arrays)."""
    planes: jnp.ndarray     # (8, 4*Tp) f32: lanes [(g*4+p)*128+j], rows x/y/w
    rect: jnp.ndarray       # (4, G) group screen rects, rows x0/y0/x1/y1
    qhi: jnp.ndarray        # (G,) conservative max q per group
    n_tris: int             # unpadded triangle count


def perspective_rows(camera, width: int, height: int):
    """(3, 4) homogeneous-pixel transform M and (1, 4) depth-attribute row.

    [X; Y; W] = M @ [p; 1] reproduces render/camera.py generate_rays:
    X/W = (ndc_x*0.5 + 0.5)*width, Y/W = (1 - ndc_y)*0.5*height, W = -z_view.
    The depth attribute a = 1 makes q = interpolated 1/W."""
    from ..core import maths as m
    q = camera.rotation
    ex = m.quat_rotate(q[None], jnp.array([[1.0, 0.0, 0.0]]))[0]
    ey = m.quat_rotate(q[None], jnp.array([[0.0, 1.0, 0.0]]))[0]
    ez = m.quat_rotate(q[None], jnp.array([[0.0, 0.0, 1.0]]))[0]
    c = camera.position
    th = math.tan(camera.v_fov * 0.5)
    # view rows: vx = ex.(p - c), vy = ey.(p - c), w = -ez.(p - c)
    row_vx = jnp.concatenate([ex, -jnp.dot(ex, c)[None]])
    row_vy = jnp.concatenate([ey, -jnp.dot(ey, c)[None]])
    row_w = jnp.concatenate([-ez, jnp.dot(ez, c)[None]])
    row_x = 0.5 * width * (row_vx / (th * camera.aspect) + row_w)
    row_y = 0.5 * height * (row_w - row_vy / th)
    mat = jnp.stack([row_x, row_y, row_w])
    attr = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return mat.astype(jnp.float32), attr


def ortho_rows(right, down, forward, origin, width, height, extent_x,
               extent_y, z_far):
    """Orthographic variant (shadow views): W = 1, depth attribute
    a = z_far - depth so the winner max still selects the nearest surface."""
    right = jnp.asarray(right, jnp.float32)
    down = jnp.asarray(down, jnp.float32)
    forward = jnp.asarray(forward, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    row_x = jnp.concatenate(
        [right, -jnp.dot(right, origin)[None]]) * (width / extent_x)
    row_y = jnp.concatenate(
        [down, -jnp.dot(down, origin)[None]]) * (height / extent_y)
    row_w = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    depth = jnp.concatenate([forward, -jnp.dot(forward, origin)[None]])
    attr = (row_w * z_far - depth)[None]
    return jnp.stack([row_x, row_y, row_w]).astype(jnp.float32), \
        attr.astype(jnp.float32)


def _project_planes(tri_v0, tri_e1, tri_e2, tri_valid, mat, attr,
                    width: int, height: int):
    """Shared per-tri projection: plane components + screen rect + max-q.

    Pure XLA, ~40 flops/tri.  All math runs in component-ROW layout (every
    array is (T,) with triangles on lanes): (T, 3)-shaped intermediates tile
    as (8, 128) with 42x lane padding on TPU and measured ~25 ms/frame for
    this function — rows cost nothing.  Degenerate or edge-on triangles
    produce NaN/inf planes which fail every in-kernel compare (the same
    IEEE trick the ray kernel uses for padding rows).

    Returns (e0, e1, e2, qp, x0, y0, x1, y1, q_tri): e*/qp are 3-lists of
    (T,) plane components; rect/max-q are (T,) with invalid tris pushed to
    empty rects (+inf/-inf) and q_tri = -inf."""
    f32 = jnp.float32
    v0 = tri_v0.astype(f32).T                                  # (3, T) rows
    v1 = v0 + tri_e1.astype(f32).T
    v2 = v0 + tri_e2.astype(f32).T

    def proj(v):  # (3, T) world rows -> (X, Y, W) pixel rows
        return [mat[r, 0] * v[0] + mat[r, 1] * v[1] + mat[r, 2] * v[2]
                + mat[r, 3] for r in range(3)]

    def attr_of(v):
        return (attr[0, 0] * v[0] + attr[0, 1] * v[1] + attr[0, 2] * v[2]
                + attr[0, 3])

    h0, h1, h2 = proj(v0), proj(v1), proj(v2)                  # [X, Y, W]
    a0, a1, a2 = attr_of(v0), attr_of(v1), attr_of(v2)

    def cross(u, w):
        return [u[1] * w[2] - u[2] * w[1],
                u[2] * w[0] - u[0] * w[2],
                u[0] * w[1] - u[1] * w[0]]

    c12, c20, c01 = cross(h1, h2), cross(h2, h0), cross(h0, h1)
    det = h0[0] * c12[0] + h0[1] * c12[1] + h0[2] * c12[2]
    inv_d = 1.0 / det
    nan = jnp.float32(jnp.nan)
    vrow = tri_valid

    def plane(c):
        return [jnp.where(vrow, x * inv_d, nan) for x in c]

    e0, e1, e2 = plane(c12), plane(c20), plane(c01)
    qp = [a0 * e0[i] + a1 * e1[i] + a2 * e2[i] for i in range(3)]

    # Conservative per-tri screen rect + max-q; any vertex at/behind the
    # camera plane makes the footprint unbounded -> full screen, q cap inf.
    ws = [h[2] for h in (h0, h1, h2)]
    safe = [jnp.maximum(w, _W_EPS) for w in ws]
    sx = [h[0] / s for h, s in zip((h0, h1, h2), safe)]
    sy = [h[1] / s for h, s in zip((h0, h1, h2), safe)]
    qs = [a / s for a, s in zip((a0, a1, a2), safe)]
    unb = (ws[0] <= _W_EPS) | (ws[1] <= _W_EPS) | (ws[2] <= _W_EPS)

    def min3(v):
        return jnp.minimum(jnp.minimum(v[0], v[1]), v[2])

    def max3(v):
        return jnp.maximum(jnp.maximum(v[0], v[1]), v[2])

    x0 = jnp.where(unb, 0.0, min3(sx))
    x1 = jnp.where(unb, float(width), max3(sx))
    y0 = jnp.where(unb, 0.0, min3(sy))
    y1 = jnp.where(unb, float(height), max3(sy))
    q_tri = jnp.where(unb, jnp.inf, max3(qs))
    x0 = jnp.where(vrow, x0, jnp.inf)
    y0 = jnp.where(vrow, y0, jnp.inf)
    x1 = jnp.where(vrow, x1, -jnp.inf)
    y1 = jnp.where(vrow, y1, -jnp.inf)
    q_tri = jnp.where(vrow, q_tri, -jnp.inf)
    return e0, e1, e2, qp, x0, y0, x1, y1, q_tri


def build_frame_tables(tri_v0, tri_e1, tri_e2, tri_valid, mat, attr,
                       width: int, height: int) -> FrameTables:
    """Project all triangles and build the per-frame plane + binning tables
    at GROUP (128-tri) granularity (see build_pair_tables for the exact
    per-tri binning used at content scale)."""
    t = tri_v0.shape[0]
    pad = (-t) % GROUP
    e0, e1, e2, qp, x0, y0, x1, y1, q_tri = _project_planes(
        tri_v0, tri_e1, tri_e2, tri_valid, mat, attr, width, height)

    # Pack to (8, 4*Tp): lane (g*4 + p)*128 + j, component rows 0..2.
    tp = t + pad

    def pack_comp(i):
        rows = jnp.stack([e0[i], e1[i], e2[i], qp[i]])         # (4, T)
        rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=jnp.nan)
        return rows.reshape(4, tp // GROUP, GROUP).transpose(1, 0, 2).ravel()

    tbl = jnp.stack([pack_comp(i) for i in range(3)])
    tbl = jnp.pad(tbl, ((0, 5), (0, 0)))                       # (8, 4*Tp)

    def gmin(x, cv):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(
            -1, GROUP).min(-1)

    def gmax(x, cv):
        return jnp.pad(x, (0, pad), constant_values=cv).reshape(
            -1, GROUP).max(-1)

    rect = jnp.stack([gmin(x0, jnp.inf), gmin(y0, jnp.inf),
                      gmax(x1, -jnp.inf), gmax(y1, -jnp.inf)])
    qhi = gmax(q_tri, -jnp.inf)
    return FrameTables(planes=tbl, rect=rect, qhi=qhi, n_tris=t)


def _visit_bits(n_tiles: int, n_groups: int) -> Tuple[int, int, int]:
    tile_bits = max(n_tiles - 1, 1).bit_length()
    group_bits = max(n_groups - 1, 1).bit_length()
    q_bits = 31 - tile_bits - group_bits
    assert q_bits >= 6, (n_tiles, n_groups)
    return tile_bits, q_bits, group_bits


def geometric_needed(tables: FrameTables, width: int, height: int):
    """(n_tiles, G) bool: group's screen rect overlaps the tile."""
    ntx, nty = width // TILE_X, height // TILE_Y
    tx = jnp.arange(ntx, dtype=jnp.float32) * TILE_X
    ty = jnp.arange(nty, dtype=jnp.float32) * TILE_Y
    tx0 = jnp.tile(tx, nty)[:, None]                    # (n_tiles, 1)
    ty0 = jnp.repeat(ty, ntx)[:, None]
    r = tables.rect                                     # (4, G) rows
    return ((r[0][None, :] < tx0 + TILE_X) & (r[2][None, :] > tx0)
            & (r[1][None, :] < ty0 + TILE_Y) & (r[3][None, :] > ty0)
            & (tables.qhi[None, :] > 0.0))              # (n_tiles, G)


# Safety margin on occlusion-feedback culling: a group is skipped only when
# its conservative max q is BELOW the tile's min resolved q by this factor
# (guards the qhi == qmin equality case in f32).
_FB_MARGIN = 1.0 - 1e-5


def visit_plan(tables: FrameTables, width: int, height: int,
               needed=None):
    """Per-tile front-to-back visit lists.

    Returns (packed, counts, scale, overflow): packed (n_tiles*VISIT_CAP +
    SLAB_TILES*VISIT_CAP,) int32 sorted words tile|qq|group (ascending =
    per tile, nearest-possible group first; tail is sentinel), counts
    (n_tiles,) visits per tile (>= 1 — empty tiles get one skip-only visit
    so the kernel initializes their outputs), scale (1,) f32 dequantizing
    qq to an upper bound on the group's q, overflow () int32 visits dropped
    by the per-tile cap (farthest-first)."""
    ntx, nty = width // TILE_X, height // TILE_Y
    n_tiles = ntx * nty
    n_groups = tables.qhi.shape[0]
    _, q_bits, group_bits = _visit_bits(n_tiles, n_groups)
    qmax_q = (1 << q_bits) - 1

    if needed is None:
        needed = geometric_needed(tables, width, height)

    finite = jnp.isfinite(tables.qhi) & (tables.qhi > 0)
    scale = jnp.maximum(jnp.max(jnp.where(finite, tables.qhi, 0.0)), 1e-30) \
        / (qmax_q - 1)
    # qq ascending == conservative q bound descending; qq == 0 (unbounded
    # q, near-crossing groups) is never skipped by the kernel.
    q_up = jnp.ceil(tables.qhi / scale)
    qq = jnp.where(jnp.isfinite(tables.qhi),
                   jnp.clip(qmax_q - q_up, 1, qmax_q - 1), 0)
    key = jnp.where(needed, -qq[None, :].astype(jnp.float32), -jnp.inf)
    cap = min(VISIT_CAP, n_groups)
    vals, gidx = jax.lax.top_k(key, cap)                # (n_tiles, cap)
    valid = vals > -jnp.inf
    counts = valid.sum(-1)
    overflow = needed.sum() - counts.sum()

    tiles = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
    words = ((tiles << (q_bits + group_bits))
             | ((-vals).astype(jnp.int32) << group_bits)
             | gidx)
    # Tiles with no visits: one skip-only word (qq = qmax_q -> bound 0,
    # the kernel inits the tile's outputs and skips the intersection).
    forced = ((tiles << (q_bits + group_bits)) | (qmax_q << group_bits))
    none = counts == 0
    words = jnp.where(valid, words,
                      jnp.where(none[:, None]
                                & (jax.lax.broadcasted_iota(
                                    jnp.int32, vals.shape, 1) == 0),
                                forced, jnp.int32(0x7FFFFFFF)))
    counts = jnp.maximum(counts, 1)
    packed = jnp.sort(words.ravel())
    packed = jnp.pad(packed, (0, SLAB_TILES * VISIT_CAP),
                     constant_values=0x7FFFFFFF)
    return packed, counts, scale.reshape(1).astype(jnp.float32), overflow


def _raster_kernel(packed_ref, base_ref, scale_ref, jitter_ref, tbl_ref,
                   q_ref, win_ref, *uv_ref, ntx, q_bits, group_bits,
                   tri_rows: bool = False, with_uv: bool = False):
    """One (tile, 128-tri batch) visit.

    `tri_rows=False` (group path): tbl block is (8, 512) — rows x/y/w,
    lanes [comp*128 + j] for comps (e0, e1, e2, q).
    `tri_rows=True` (pair path): tbl block is (16, 128) — per-tri rows
    [e0x e0y e0w  e1x e1y e1w  e2x e2y e2w  qx qy qw  pad*4], lanes = the
    visit's 128 gathered pairs.

    `with_uv` (tri_rows only) adds a (PX, PRL) output carrying the
    winner's PERSPECTIVE-CORRECT barycentrics: with the q attribute == 1/w
    (perspective_rows), lambda_i(p) = e_i(p)/q(p), so u rides lanes
    [0, PRL/2) and v rides [PRL/2, PRL) of the same replicated block."""
    v = pl.program_id(0)
    word = packed_ref[v]
    tile = word >> (q_bits + group_bits)
    prev = packed_ref[jnp.maximum(v, 1) - 1] >> (q_bits + group_bits)

    @pl.when((v == 0) | (tile != prev))
    def _init():
        q_ref[:] = jnp.zeros_like(q_ref)
        win_ref[:] = jnp.full_like(win_ref, -1)
        if with_uv:
            uv_ref[0][:] = jnp.zeros_like(uv_ref[0])

    qq = (word >> group_bits) & ((1 << q_bits) - 1)
    group = word & ((1 << group_bits) - 1)
    qmax_q = (1 << q_bits) - 1
    bound = (qmax_q - qq).astype(jnp.float32) * scale_ref[0]

    def _visit():
        rows = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
        tx0 = (tile % ntx) * TILE_X
        ty0 = (tile // ntx) * TILE_Y
        fx = (tx0 + rows % TILE_X).astype(jnp.float32) + jitter_ref[0]
        fy = (ty0 + rows // TILE_X).astype(jnp.float32) + jitter_ref[1]
        one = jnp.ones_like(fx)
        p = jnp.concatenate([fx, fy, one], -1)                # (PX, 3)
        c = GROUP
        if tri_rows:
            dot = lambda a: jnp.dot(p, tbl_ref[a:a + 3],       # noqa: E731
                                    preferred_element_type=jnp.float32)
            e0, e1, e2, q = dot(0), dot(3), dot(6), dot(9)     # (PX, 128)
        else:
            es = jnp.dot(p, tbl_ref[0:3],
                         preferred_element_type=jnp.float32)
            e0, e1, e2 = es[:, 0:c], es[:, c:2 * c], es[:, 2 * c:3 * c]
            q = es[:, 3 * c:4 * c]
        covered = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0
        ok = covered & (q > 0.0) & (q < jnp.inf)
        qm = jnp.where(ok, q, -1.0)                           # (PX, C)
        # Packed winner key (ray kernel PACKSEL, as a max): qm is -1 or a
        # positive real, so its f32 bits order as int32; the low lane bits
        # carry (C-1 - column) so ties prefer the LOWER triangle id.
        cols = jax.lax.broadcasted_iota(jnp.int32, qm.shape, 1)
        key = ((jax.lax.bitcast_convert_type(qm, jnp.int32)
                & jnp.int32(~(c - 1))) | (c - 1 - cols))
        kbest = jnp.max(key, axis=-1, keepdims=True)
        q_new = jnp.max(qm, axis=-1, keepdims=True)           # exact max q
        q_best = q_ref[:, 0:1]
        better = q_new > q_best
        if tri_rows:
            # The real triangle id rides table row 12 (f32, exact to
            # 2^24); select the winning lane's id by masked sum (the
            # packed key is unique per row, exactly one lane matches).
            win = jnp.sum(jnp.where(key == kbest, tbl_ref[12:13], 0.0),
                          axis=-1, keepdims=True).astype(jnp.int32)
        else:
            win = group * c + ((c - 1) - (kbest & (c - 1)))
        rep = q_ref.shape
        q_ref[:] = jnp.broadcast_to(jnp.where(better, q_new, q_best), rep)
        win_ref[:] = jnp.broadcast_to(
            jnp.where(better, win, win_ref[:, 0:1]), rep)
        if with_uv:
            qs = jnp.maximum(q_new, 1e-30)
            e1s = jnp.sum(jnp.where(key == kbest, e1, 0.0), -1,
                          keepdims=True) / qs
            e2s = jnp.sum(jnp.where(key == kbest, e2, 0.0), -1,
                          keepdims=True) / qs
            lanes = jax.lax.broadcasted_iota(jnp.int32, rep, 1)
            uv_new = jnp.where(lanes < (PRL // 2), e1s, e2s)
            uv_ref[0][:] = jnp.where(jnp.broadcast_to(better, rep), uv_new,
                                     uv_ref[0][:])

    # Early-out: bound >= max q any triangle in this group can produce; if
    # every pixel already has a nearer hit the visit cannot win anywhere.
    # qq == 0 marks unbounded groups (never skipped).
    pl.when((qq == 0) | (jnp.min(q_ref[:, 0:1]) < bound))(_visit)


# Pair capacity for exact per-tri binning (multiple of GROUP).  The 260k-tri
# atrium at 1080p measures ~170k exact (tri, tile) pairs; 512k gives 3x
# headroom.  When a frame exceeds the cap the excess pairs are DROPPED
# (arbitrary tris, counted in `pairs_overflow`) — callers needing
# exactness-or-bust should check the counter and re-render via the group
# path (closest_hit_raster(binning="group")).
PAIR_CAP = int(_os.environ.get("D3D12TPU_RASTER_PAIR_CAP", str(512 * 1024)))
assert PAIR_CAP % GROUP == 0


def visit_plan_pairs(tri_v0, tri_e1, tri_e2, tri_valid, mat, attr,
                     width: int, height: int, pair_cap: int = None):
    """EXACT per-triangle tile binning (vs the conservative GROUP-rect
    binning of visit_plan): each triangle is expanded to the tiles its own
    screen rect overlaps, pairs are sorted front-to-back per tile, and the
    per-visit plane tables are GATHERED in sorted order so the kernel's
    visit blocks stay lane-aligned.  The atrium at 1080p measures ~170k
    exact pairs vs 24k group visits x 128 tris = 3.1M pair-equivalents —
    a ~10x reduction in kernel work (the per-visit MXU cost is fixed by
    (pixels x lanes), independent of the K=3 contraction).

    Primitive choices are TPU-measured: the slot->tri map is a scatter-max
    at segment starts + cummax (searchsorted at this size lowers to ~18
    chained gathers, 72 ms); visit alignment happens POST-sort with
    per-visit index math (no pad injection, no (pairs)-sized scatter); the
    table carries the triangle ID as row 12 so the kernel emits real tri
    ids (no 2M-pixel remap gather).

    Returns (packed_words, counts, scale2, table, pairs_overflow,
    visits_overflow, bits):
      packed_words (NV + SLAB_TILES*VISIT_CAP,) int32 visit words
        tile | qq2 | block sorted per tile front-to-back;
      counts (n_tiles,) visits per tile (>= 1, <= VISIT_CAP);
      scale2 (1,) f32 dequantizer for qq2;
      table (16*NV, GROUP) f32 per-visit plane rows (row 12 = tri id)."""
    assert width % TILE_X == 0 and height % TILE_Y == 0, (width, height)
    ntx, nty = width // TILE_X, height // TILE_Y
    n_tiles = ntx * nty
    cap = pair_cap or PAIR_CAP
    t = tri_v0.shape[0]
    i32 = jnp.int32

    e0, e1, e2, qp, x0, y0, x1, y1, q_tri = _project_planes(
        tri_v0, tri_e1, tri_e2, tri_valid, mat, attr, width, height)

    # Per-tri plane rows (T+1, 16); row 12 carries the triangle id (f32 is
    # exact to 2^24); trailing row serves pad pairs (NaN planes fail every
    # kernel compare).
    rows16 = jnp.stack(
        [e0[0], e0[1], e0[2], e1[0], e1[1], e1[2],
         e2[0], e2[1], e2[2], qp[0], qp[1], qp[2],
         jnp.arange(t, dtype=jnp.float32),
         jnp.zeros(t, jnp.float32), jnp.zeros(t, jnp.float32),
         jnp.zeros(t, jnp.float32)], axis=-1)                   # (T, 16)
    rows16 = jnp.pad(rows16, ((0, 1), (0, 0)),
                     constant_values=jnp.nan)                   # (T+1, 16)

    # Exact tile ranges; NaN rects (degenerate tris) fail `vis` and the
    # nan_to_num keeps the int casts defined.
    fx0 = jnp.nan_to_num(jnp.clip(jnp.floor(x0 / TILE_X), 0, ntx - 1))
    fy0 = jnp.nan_to_num(jnp.clip(jnp.floor(y0 / TILE_Y), 0, nty - 1))
    fx1 = jnp.nan_to_num(jnp.clip(jnp.ceil(x1 / TILE_X) - 1, 0, ntx - 1))
    fy1 = jnp.nan_to_num(jnp.clip(jnp.ceil(y1 / TILE_Y) - 1, 0, nty - 1))
    vis = ((q_tri > 0.0) & (x1 > 0.0) & (x0 < width)
           & (y1 > 0.0) & (y0 < height))
    tx0i, ty0i = fx0.astype(i32), fy0.astype(i32)
    cx = jnp.maximum(fx1.astype(i32) - tx0i + 1, 1)
    cy = jnp.maximum(fy1.astype(i32) - ty0i + 1, 1)
    counts_tri = jnp.where(vis, cx * cy, 0)

    # Pair sort key: tile | qq (30 bits; bit 30 spare so no real key can
    # reach the 0x7FFFFFFF invalid sentinel).
    tile_bits = max(n_tiles - 1, 1).bit_length()
    qp_bits = 30 - tile_bits
    qmax_p = (1 << qp_bits) - 1
    finite = jnp.isfinite(q_tri) & (q_tri > 0)
    scale = jnp.maximum(jnp.max(jnp.where(finite, q_tri, 0.0)), 1e-30) \
        / (qmax_p - 1)
    q_up = jnp.ceil(q_tri / scale)
    qq = jnp.where(jnp.isfinite(q_tri),
                   jnp.clip(qmax_p - q_up, 1, qmax_p - 1), 0).astype(i32)

    # Expansion slot -> tri: scatter each visible tri's id at its segment
    # start, cummax fills the segment.  All per-tri payloads ride ONE
    # (T, 4)-row gather — TPU scalar gathers cost ~4.7 ms each at 512k
    # where a 4-wide row gather is ~1 pass (measured tmp/divmod_prof.py).
    cum = jnp.cumsum(counts_tri)
    starts = cum - counts_tri
    total = cum[-1]
    pairs_overflow = jnp.maximum(total - cap, 0)
    write = (counts_tri > 0) & (starts < cap)
    mark = jnp.zeros(cap, i32).at[jnp.where(write, starts, 0)].max(
        jnp.where(write, jnp.arange(t, dtype=i32) + 1, 0))
    slots = jnp.arange(cap, dtype=i32)
    tri_of = jax.lax.associative_scan(jnp.maximum, mark) - 1
    live = slots < total
    tri_c = jnp.clip(tri_of, 0, t - 1)
    assert ntx <= 1024 and nty <= 1024
    prect = tx0i | (ty0i << 10) | (cx << 20)
    payload = jnp.stack([prect, starts, qq, jnp.zeros_like(qq)], -1)
    pay_g = payload[tri_c]                                      # (cap, 4)
    rect_g, local = pay_g[:, 0], slots - pay_g[:, 1]
    cx_g = jnp.maximum(rect_g >> 20, 1)
    tile = ((rect_g >> 10) & 1023) * ntx + (rect_g & 1023) \
        + (local // cx_g) * ntx + local % cx_g
    key = jnp.where(live, (tile << qp_bits) | pay_g[:, 2],
                    jnp.int32(0x7FFFFFFF))
    val = jnp.where(live, tri_c, -1)
    skey, sval = jax.lax.sort((key, val), num_keys=1, is_stable=True)

    # Post-sort visit alignment, all at visit granularity (NV ~ 5k): tile
    # segment boundaries via n_tiles-sized searchsorted, ceil-div visit
    # counts, per-visit source windows into the sorted pair list.  Lanes
    # past a segment's end become pad pairs (tri -1 -> NaN row).
    stile = skey >> qp_bits                          # ascending; invalid big
    bounds = jnp.searchsorted(stile, jnp.arange(n_tiles + 1)).astype(i32)
    cnt_t = bounds[1:] - bounds[:-1]
    nv_t = jnp.maximum((cnt_t + GROUP - 1) // GROUP, 1)
    vcum = jnp.cumsum(nv_t)
    nv = cap // GROUP + n_tiles                      # static visit capacity
    v_bits = max(nv - 1, 1).bit_length()
    q2_bits = 31 - tile_bits - v_bits
    assert q2_bits >= 4, (n_tiles, nv)
    qmax2 = (1 << q2_bits) - 1
    vidx = jnp.arange(nv, dtype=i32)
    vtile = jnp.searchsorted(vcum, vidx, side="right").astype(i32)
    live_v = vidx < vcum[-1]
    vtile_c = jnp.clip(vtile, 0, n_tiles - 1)
    lv = vidx - (vcum - nv_t)[vtile_c]               # visit rank in tile
    seg0 = bounds[:-1][vtile_c]
    seg1 = bounds[1:][vtile_c]
    src0 = seg0 + lv * GROUP
    src = src0[:, None] + jnp.arange(GROUP, dtype=i32)[None, :]
    pvalid = src < seg1[:, None]
    tri_aligned = jnp.where(pvalid, sval[jnp.minimum(src, cap - 1)], -1)

    # Visit words: bound = the first (nearest) member pair's quantized q,
    # conservatively requantized to q2_bits (floor keeps bound2 >= bound);
    # qq==0 stays 0 (unbounded, never skipped); empty tiles' forced visit
    # gets qmax2 (bound 0 -> skipped, but still inits the tile).
    has_pair = lv * GROUP < cnt_t[vtile_c]
    kfirst = skey[jnp.minimum(src0, cap - 1)]
    vqq = jnp.where(has_pair, kfirst & ((1 << qp_bits) - 1), qmax_p)
    qq2 = jnp.where(vqq == 0, 0,
                    jnp.where(vqq >= qmax_p, qmax2,
                              jnp.clip((vqq * (qmax2 - 1)) // (qmax_p - 1),
                                       1, qmax2 - 1)))
    scale2 = scale * (qmax_p - 1) / (qmax2 - 1)
    words = jnp.where(live_v,
                      (vtile << (q2_bits + v_bits)) | (qq2 << v_bits) | vidx,
                      jnp.int32(0x7FFFFFFF))

    # Clamp per-tile visits at VISIT_CAP (slab SMEM invariant); over-cap
    # visits (the FARTHEST blocks — per-tile order is front-to-back) are
    # dropped and the tiny word list re-sorted compact.
    keep = live_v & (lv < VISIT_CAP)
    visits_overflow = (live_v & ~keep).sum()
    words = jnp.sort(jnp.where(keep, words, jnp.int32(0x7FFFFFFF)))
    counts = jnp.minimum(nv_t, VISIT_CAP)
    packed = jnp.pad(words, (0, SLAB_TILES * VISIT_CAP),
                     constant_values=0x7FFFFFFF)

    # Gather the per-visit plane tables in aligned order:
    # (NV*G, 16) rows -> (NV, 16, GROUP) -> (16*NV, GROUP) blocks.
    tri_idx = jnp.where(tri_aligned >= 0, tri_aligned, t).reshape(-1)
    table = rows16[tri_idx].reshape(nv, GROUP, 16).transpose(0, 2, 1) \
        .reshape(nv * 16, GROUP)
    return (packed, counts, scale2.reshape(1).astype(jnp.float32), table,
            pairs_overflow, visits_overflow,
            dict(q_bits=q2_bits, group_bits=v_bits))


def rasterize_pairs(tri_v0, tri_e1, tri_e2, tri_valid, mat, attr,
                    width: int, height: int, jitter=(0.5, 0.5),
                    interpret: bool = False, pair_cap: int = None,
                    with_uv: bool = False):
    """Exact per-tri binned rasterization -> ROW-MAJOR (q, tri, overflow).

    Same output contract as rasterize() (group binning) but ~10x fewer
    kernel pair tests at content scale; `overflow` counts dropped pairs
    plus dropped visits (0 in correct frames — callers needing
    exactness-or-bust check it and fall back to binning="group").

    `with_uv` appends ROW-MAJOR (u, v) perspective-correct winner
    barycentrics computed IN the kernel (requires the perspective attr
    row, q == 1/w) — replacing a 2M-row table gather that measures ~39 ms
    at 1080p with ~2 ms of extra kernel writes."""
    ntx, nty = width // TILE_X, height // TILE_Y
    n_tiles = ntx * nty
    (packed, counts, scale2, table, povf, vovf,
     bits) = visit_plan_pairs(tri_v0, tri_e1, tri_e2, tri_valid, mat, attr,
                              width, height, pair_cap)
    out = _run_slabs(packed, counts, scale2, table,
                     n_tiles=n_tiles, ntx=ntx, q_bits=bits["q_bits"],
                     group_bits=bits["group_bits"], jitter=jitter,
                     interpret=interpret, tri_rows=True, with_uv=with_uv)
    q, win = out[0], out[1]
    qmin = q.reshape(n_tiles, PX).min(-1)
    res = (_unscramble(q, width, height),
           _unscramble(win, width, height), povf + vovf, qmin)
    if with_uv:
        res = res + (_unscramble(out[2], width, height),
                     _unscramble(out[3], width, height))
    return res


def _run_slabs(packed, counts, scale, table, *, n_tiles, ntx, q_bits,
               group_bits, jitter, interpret, tri_rows,
               with_uv: bool = False):
    """Shared slab loop: run the raster kernel over the per-tile visit
    lists.  `table` is (8, 4*GROUP*n_blocks) (group path) or
    (16*n_blocks, 128) (pair path); each visit word's low `group_bits`
    select its block.  Returns TILE-MAJOR (q, win[, u, v])."""
    pad_t = (-n_tiles) % SLAB_TILES
    counts_p = jnp.pad(counts, (0, pad_t))
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts_p)])
    # The slab loop below consumes these in every iteration; without a
    # barrier XLA rematerializes the table pack/plan work INTO the loop
    # body (measured ~25 ms/frame of repeated transposes).
    table, packed, starts, scale = jax.lax.optimization_barrier(
        (table, packed, starts, scale))
    n_slabs = (n_tiles + pad_t) // SLAB_TILES
    jit2 = jnp.asarray(jitter, jnp.float32).reshape(2)

    shift = q_bits + group_bits
    gmask = (1 << group_bits) - 1
    per_px = pl.BlockSpec((PX, PRL),
                          lambda v, pk, base: ((pk[v] >> shift) - base[0], 0),
                          memory_space=pltpu.VMEM)
    if tri_rows:
        tbl_spec = pl.BlockSpec((16, GROUP),
                                lambda v, pk, base: (pk[v] & gmask, 0),
                                memory_space=pltpu.VMEM)
    else:
        tbl_spec = pl.BlockSpec((8, 4 * GROUP),
                                lambda v, pk, base: (0, pk[v] & gmask),
                                memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((SLAB_TILES * PX, PRL), jnp.float32),
        jax.ShapeDtypeStruct((SLAB_TILES * PX, PRL), jnp.int32),
    ) + ((jax.ShapeDtypeStruct((SLAB_TILES * PX, PRL), jnp.float32),)
         if with_uv else ())

    def one_slab(s):
        base = s * SLAB_TILES
        start = starts[base]
        total = starts[jnp.minimum(base + SLAB_TILES, n_tiles + pad_t)] - start
        words = jax.lax.dynamic_slice(
            packed, (start,), (SLAB_TILES * VISIT_CAP,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # scale (1,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # jitter (2,)
                tbl_spec,
            ],
            out_specs=(per_px,) * len(out_shapes),
        )
        out = pl.pallas_call(
            functools.partial(_raster_kernel, ntx=ntx, q_bits=q_bits,
                              group_bits=group_bits, tri_rows=tri_rows,
                              with_uv=with_uv),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(words, jnp.full((1,), base, jnp.int32), scale, jit2, table)
        if with_uv:
            q, win, uv = out
            return q[:, 0], win[:, 0], uv[:, 0], uv[:, PRL // 2]
        q, win = out
        return q[:, 0], win[:, 0]

    outs = jax.lax.map(one_slab, jnp.arange(n_slabs))
    outs = [x.reshape(-1)[:n_tiles * PX] for x in outs]
    if with_uv:
        q, win, u, v = outs
        return q, win, u, v
    q, win = outs
    return q, win


def _rasterize_tiles(tables: FrameTables, width: int, height: int,
                     jitter=(0.5, 0.5), interpret: bool = False,
                     needed=None):
    """One rasterization pass -> TILE-MAJOR per-pixel (q, win, overflow).

    `needed` optionally restricts the (tile, group) visit mask (occlusion
    feedback); None means the full geometric mask."""
    assert width % TILE_X == 0 and height % TILE_Y == 0, (width, height)
    ntx, nty = width // TILE_X, height // TILE_Y
    n_tiles = ntx * nty
    n_groups = tables.qhi.shape[0]
    _, q_bits, group_bits = _visit_bits(n_tiles, n_groups)
    packed, counts, scale, overflow = visit_plan(tables, width, height,
                                                 needed=needed)
    q, win = _run_slabs(packed, counts, scale, tables.planes,
                        n_tiles=n_tiles, ntx=ntx, q_bits=q_bits,
                        group_bits=group_bits, jitter=jitter,
                        interpret=interpret, tri_rows=False)
    return q, win, overflow


def _unscramble(x, width, height):
    """Tile-major (ty, tx, y_in, x_in) -> row-major, as pure reshapes."""
    ntx, nty = width // TILE_X, height // TILE_Y
    return (x.reshape(nty, ntx, TILE_Y, TILE_X)
            .transpose(0, 2, 1, 3).reshape(height * width))


def rasterize(tables: FrameTables, width: int, height: int,
              jitter=(0.5, 0.5), interpret: bool = False,
              tile_qmin=None):
    """Rasterize the frame tables -> per-pixel (q, winning tri id).

    Returns (q, tri, overflow, tile_qmin_out): q/tri (height*width,) in
    ROW-MAJOR pixel order (q = the winner's interpolated depth attribute, 0
    where no triangle covers the pixel; tri = -1 there); tile_qmin_out
    (n_tiles,) is the per-tile min resolved q, the occlusion-feedback input
    for the NEXT frame.  width/height must be TILE multiples (callers pad).

    `tile_qmin` (previous frame's tile_qmin_out, or None) enables
    occlusion-culled visiting with an EXACT repair pass: phase 1 skips
    groups whose conservative max q lies below the previous tile minimum;
    phase 2 re-rasterizes any tile where a skipped group could still beat
    the phase-1 result (the test uses phase-1 depths, so the combined
    result is exact for ANY camera/scene motion — with a static view,
    phase 2 is empty and the frame costs only the visible visits).  This
    is the TPU analogue of GPU two-phase HiZ occlusion culling; the
    reference renders Sponza brute-force (hardware raster), so this is a
    strict capability add."""
    ntx, nty = width // TILE_X, height // TILE_Y
    n_tiles = ntx * nty
    needed_geo = geometric_needed(tables, width, height)
    if tile_qmin is None:
        q, win, overflow = _rasterize_tiles(tables, width, height, jitter,
                                            interpret, needed=needed_geo)
        qmin = q.reshape(n_tiles, PX).min(-1)
        return (_unscramble(q, width, height),
                _unscramble(win, width, height), overflow, qmin)

    qhi = tables.qhi[None, :]
    cull1 = qhi <= tile_qmin[:, None] * _FB_MARGIN
    q1, win1, ovf1 = _rasterize_tiles(tables, width, height, jitter,
                                      interpret,
                                      needed=needed_geo & ~cull1)
    qmin1 = q1.reshape(n_tiles, PX).min(-1)
    # Exactness repair: any culled group that could still beat the tile's
    # CURRENT min resolved depth forces a from-scratch re-raster of that
    # tile against every group passing the current bound.
    residual = needed_geo & cull1 & (qhi > qmin1[:, None] * _FB_MARGIN)
    dirty = jnp.any(residual, axis=1)
    needed2 = (needed_geo & (qhi > qmin1[:, None] * _FB_MARGIN)
               & dirty[:, None])
    q2, win2, ovf2 = _rasterize_tiles(tables, width, height, jitter,
                                      interpret, needed=needed2)
    sel = jnp.repeat(dirty, PX)
    q = jnp.where(sel, q2, q1)
    win = jnp.where(sel, win2, win1)
    qmin = q.reshape(n_tiles, PX).min(-1)
    return (_unscramble(q, width, height),
            _unscramble(win, width, height), ovf1 + ovf2, qmin)


def closest_hit_raster(bvh, camera, width: int, height: int,
                       jitter=(0.5, 0.5), interpret: Optional[bool] = None,
                       tables: Optional[FrameTables] = None,
                       tile_qmin=None, binning: str = "tri",
                       pair_cap: int = None):
    """Primary-visibility drop-in for render/bvh.closest_hit on pinhole
    cameras: returns {t, tri, uv, hit} (row-major pixels) computed by the
    tile-binned rasterizer.  t and barycentrics are recomputed from the
    winner's plane row / closed form so the G-buffer math downstream is
    identical to the ray path's.

    `binning`: "tri" (default) bins EXACT per-tri screen rects (~10x fewer
    kernel pair tests at content scale; drops pairs past `pair_cap`, see
    visit_plan_pairs); "group" bins conservative 128-tri group rects (no
    cap losses, supports occlusion feedback).

    `tile_qmin`: previous frame's res["tile_qmin"] enables exact two-phase
    occlusion-culled visiting (group binning only, see rasterize).

    `interpret`: None auto-selects Mosaic on TPU, interpret elsewhere."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    wp = width + ((-width) % TILE_X)
    hp = height + ((-height) % TILE_Y)
    kernel_uv = None
    if binning == "tri" and tables is None and tile_qmin is None:
        mat, attr = perspective_rows(camera, width, height)
        q, tri, overflow, qmin_out, ku, kv = rasterize_pairs(
            bvh.tri_v0, bvh.tri_e1, bvh.tri_e2, bvh.tri_valid, mat, attr,
            wp, hp, jitter=jitter, interpret=interpret, pair_cap=pair_cap,
            with_uv=True)
        kernel_uv = (ku, kv)
    else:
        if tables is None:
            # The projection maps to UNPADDED pixel coordinates (identical
            # to generate_rays); padded tiles just evaluate the linear edge
            # functions beyond x = width, which is exact extrapolation.
            mat, attr = perspective_rows(camera, width, height)
            tables = build_frame_tables(bvh.tri_v0, bvh.tri_e1, bvh.tri_e2,
                                        bvh.tri_valid, mat, attr, wp, hp)
        q, tri, overflow, qmin_out = rasterize(tables, wp, hp, jitter=jitter,
                                               interpret=interpret,
                                               tile_qmin=tile_qmin)
    if wp != width or hp != height:
        def crop(x):
            return x.reshape(hp, wp)[:height, :width].reshape(-1)
        q, tri = crop(q), crop(tri)
        if kernel_uv is not None:
            kernel_uv = (crop(kernel_uv[0]), crop(kernel_uv[1]))
    hit = tri >= 0

    # t from q in closed form: q = 1/w (view depth); the pixel's unit ray
    # direction has view-space -z component w/t  =>  t = |dir_cam| * w.
    th = math.tan(camera.v_fov * 0.5)
    jit2 = jnp.asarray(jitter, jnp.float32)     # traceable (TAA per-frame)
    x = jnp.arange(width, dtype=jnp.float32) + jit2[0]
    y = jnp.arange(height, dtype=jnp.float32) + jit2[1]
    ndc_x = (x / width * 2.0 - 1.0) * th * camera.aspect
    ndc_y = (1.0 - y / height * 2.0) * th
    norm = jnp.sqrt(1.0 + ndc_x[None, :] ** 2 + ndc_y[:, None] ** 2).reshape(-1)
    t = jnp.where(hit, norm / jnp.maximum(q, 1e-30), jnp.inf)

    if kernel_uv is not None:
        # Pair path: the kernel emitted the winner's perspective-correct
        # barycentrics directly (see rasterize_pairs with_uv).
        uv = jnp.where(hit[:, None],
                       jnp.stack([kernel_uv[0], kernel_uv[1]], -1), 0.0)
        return {"t": t, "tri": tri, "uv": uv, "hit": hit,
                "overflow": overflow, "tile_qmin": qmin_out}

    # Group path: barycentrics from the winner's Moller plane rows (same
    # recompute as the ray kernel's PACKSEL path, render/bvh.py
    # hit_attributes contract), via one packed (T, 8) row gather.
    from ..render.camera import generate_rays
    o, d = generate_rays(camera, width, height)
    p = o + jnp.where(hit, t, 0.0)[:, None] * d
    dense = bvh.dense
    table8 = jnp.concatenate([
        dense.e1p, dense.e1_off[:, None],
        dense.e2p, dense.e2_off[:, None],
    ], -1)
    # Barrier: fused with its producers, XLA lowers this gather slower —
    # force materialized inputs.
    table8, ti = jax.lax.optimization_barrier(
        (table8, jnp.maximum(tri, 0)))
    rows = table8[ti]                                        # (R, 8)
    u = jnp.sum(p * rows[:, 0:3], -1) + rows[:, 3]
    v = jnp.sum(p * rows[:, 4:7], -1) + rows[:, 7]
    uv = jnp.where(hit[:, None], jnp.stack([u, v], -1), 0.0)
    return {"t": t, "tri": tri, "uv": uv, "hit": hit,
            "overflow": overflow, "tile_qmin": qmin_out}
