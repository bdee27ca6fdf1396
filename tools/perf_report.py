"""Per-kernel device-time + roofline report — the profiler-panel analog.

Reference: the per-pass GPU timestamp bars (dx_profiling.h:25, dx_query.h).
Each headline kernel is compiled, timed steady-state (dispatch-floor
corrected), and combined with XLA's cost analysis into achieved GFLOP/s,
GB/s, and utilization of the chip's peaks (core/profiling.kernel_report).

Usage: python tools/perf_report.py [--platform cpu|axon] [--out docs/PERF.md]
"""

import argparse
import os
import sys

# Allow `python examples/x.py` / `python tools/x.py` without installing
# the package (the repo root is the import root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu")
parser.add_argument("--out", default=None)
parser.add_argument("--iters", type=int, default=10)
args = parser.parse_args()

import jax

jax.config.update("jax_platforms", args.platform)

import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.core.profiling import kernel_report


def rows():
    # --- physics: one full locomotion env step, batch 1024 ----------------
    from d3d12renderer_tpu.learning.loco_env import ACTION_SIZE, LocoEnv

    env = LocoEnv()
    batch = 1024 if args.platform == "axon" else 64
    obs, st = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(0), batch))
    act = jnp.zeros((batch, ACTION_SIZE))
    yield (f"loco env step (batch {batch})",
           lambda s, a: jax.vmap(env.step)(s, a)[1], (st, act))

    # --- rendering: primary-visibility ray block over a 53k-tri scene -----
    from d3d12renderer_tpu.ops.ray_trace_pallas import closest_hit_pallas
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render.mesh import sphere_grid_scene

    b = bvh_mod.build_bvh(sphere_grid_scene(16, 26))
    nrays = 65536
    o = jnp.broadcast_to(jnp.array([0.0, 1.5, -9.0]), (nrays, 3))
    # Coherent camera rays, tile-ordered like the path tracer (the culled
    # kernel's design point)...
    from d3d12renderer_tpu.render.pathtracer import _tile_perm

    w_, h_ = 256, 256
    xs = (np.arange(w_) + 0.5) / w_ * 2 - 1
    ys = (np.arange(h_) + 0.5) / h_ * 2 - 1
    dc = np.stack(np.broadcast_arrays(
        xs[None, :] * 0.9, -ys[:, None] * 0.55, np.full((h_, w_), 1.0),
    ), -1).reshape(-1, 3)
    dc = (dc / np.linalg.norm(dc, axis=-1, keepdims=True)).astype(np.float32)
    perm, _ = _tile_perm(w_, h_)
    dc = jnp.asarray(dc[perm])
    # ...and incoherent random rays (bounce-like; shows why the path tracer
    # re-sorts secondary rays by octant+Morton cell).
    rng = np.random.default_rng(0)
    di = rng.normal(size=(nrays, 3)).astype(np.float32)
    di[:, 2] += 1.5
    di /= np.linalg.norm(di, axis=-1, keepdims=True)
    di = jnp.asarray(di)
    if args.platform == "axon":
        from d3d12renderer_tpu.ops import ray_trace_pallas as rtp

        def with_flags(fn, **flags):
            """Trace-time flag toggle: PACKSEL/EARLYOUT etc. are read when
            the kernel traces, so setting them inside the jitted fn body
            bakes them into that row's compile only."""
            def wrapped(*a):
                old = {k: getattr(rtp, k) for k in flags}
                for k, v in flags.items():
                    setattr(rtp, k, v)
                try:
                    return fn(*a)
                finally:
                    for k, v in old.items():
                        setattr(rtp, k, v)
            return wrapped

        hit_t = lambda o, d: closest_hit_pallas(b.dense, o, d)["t"]  # noqa: E731
        yield ("pallas culled rays, coherent tiles (64k rays, 53k tris)",
               hit_t, (o, dc))
        yield ("  ablation: packed-key select OFF",
               with_flags(hit_t, PACKSEL=False), (o, dc))
        yield ("  ablation: occlusion early-out OFF",
               with_flags(hit_t, EARLYOUT=False), (o, dc))
        yield ("pallas culled rays, incoherent (64k rays, 53k tris)",
               lambda o, d: closest_hit_pallas(b.dense, o, d)["t"], (o, di))
        yield ("pallas culled rays, incoherent + in-call regroup",
               lambda o, d: closest_hit_pallas(b.dense, o, d,
                                               regroup=True)["t"], (o, di))
        yield ("pallas culled rays, any-hit shadow (64k rays)",
               lambda o, d: closest_hit_pallas(b.dense, o, d,
                                               any_hit=True)["hit"], (o, dc))

        # --- big scene: ~495k tris, 1080p-class coherent wavefront --------
        # Guarded: a failure here (OOM, cache-dir error) must not kill the
        # remaining report rows below.
        try:
            bb = bvh_mod.build_bvh(sphere_grid_scene(44, 88))
            ntb = int(np.asarray(bb.tri_valid).sum())
            rng2 = np.random.default_rng(1)
            db = rng2.normal(size=(nrays, 3)).astype(np.float32)
            db[:, 2] += 1.5
            db /= np.linalg.norm(db, axis=-1, keepdims=True)
            db = jnp.asarray(db)
            big_t = lambda o, d: closest_hit_pallas(bb.dense, o, d)["t"]  # noqa: E731
            big_rows = [
                (f"pallas culled rays, coherent (64k rays, {ntb // 1000}k tris)",
                 big_t, (o, dc)),
                (f"pallas culled rays, incoherent + regroup ({ntb // 1000}k tris)",
                 lambda o, d: closest_hit_pallas(bb.dense, o, d,
                                                 regroup=True)["t"], (o, db)),
            ]
        except Exception as e:
            print(f"big-scene rows skipped: {e}", flush=True)
            big_rows = []
        yield from big_rows
    yield ("dense MXU rays, coherent (64k rays, 53k tris)",
           lambda o, d: bvh_mod.closest_hit_dense(b.dense, o, d)["t"],
           (o, dc))

    # --- post: gaussian blur both ways at 1080p ---------------------------
    from d3d12renderer_tpu.render import post

    img = jax.random.uniform(jax.random.PRNGKey(1), (1088, 1920, 3))
    yield ("gaussian blur 1080p (shift-chain)",
           lambda x: post.gaussian_blur(x, 2.0, method="shifts"), (img,))
    yield ("gaussian blur 1080p (MXU banded matmul)",
           lambda x: post.gaussian_blur_matmul(x, 2.0), (img,))

    # --- post: fused tonemap+sharpen at 1080p -----------------------------
    yield ("tonemap+sharpen 1080p",
           lambda x: post.sharpen(post.tonemap_uncharted2(x)), (img,))

    # --- cloth: 128^2 step -------------------------------------------------
    from d3d12renderer_tpu.physics.cloth import create_cloth, simulate

    params, cst = create_cloth(2.0, 2.0, 128, 128, total_mass=1.0)
    yield ("cloth 128^2 step",
           lambda s: simulate(params, s, 1 / 240.0), (cst,))


lines = [
    f"# Kernel roofline report — platform `{args.platform}`",
    "",
    "Generated by `tools/perf_report.py` via `core.profiling.kernel_report`",
    "(steady-state device time, dispatch-floor corrected, x XLA cost",
    "analysis; peaks: v5e 197 bf16 TFLOP/s, 819 GB/s HBM).",
    "",
    "Caveats: XLA's `bytes accessed` counts traffic of fused intermediates",
    "that never leave VMEM, so HBM util can read >100% for well-fused",
    "elementwise chains — treat it as an upper bound on true HBM traffic.",
    "Pallas kernels report no cost analysis (dashes).",
    "",
    "| kernel | device ms | GFLOP/s | GB/s | FLOP util | HBM util |",
    "|---|---|---|---|---|---|",
]
for name, fn, fargs in rows():
    try:
        r = kernel_report(fn, *fargs, iters=args.iters)
        # Pallas calls report no cost analysis (flops 0) — show dashes.
        if r["flops"] > 0:
            flop_cols = (f"| {r['achieved_gflops']:.1f} "
                         f"| {r['achieved_gbps']:.1f} "
                         f"| {r['flops_utilization'] * 100:.1f}% "
                         f"| {r['hbm_utilization'] * 100:.1f}% |")
        else:
            flop_cols = "| — | — | — | — |"
        lines.append(
            f"| {name} | {r['device_s_per_call'] * 1e3:.3f} {flop_cols}")
        print(lines[-1], flush=True)
    except Exception as e:  # pragma: no cover - report partial results
        lines.append(f"| {name} | error: {str(e)[:80]} | | | | |")
        print(lines[-1], flush=True)

out = "\n".join(lines) + "\n"
if args.out:
    with open(args.out, "w") as f:
        f.write(out)
    print(f"wrote {args.out}")
