"""Headline benchmark: ragdoll-locomotion env throughput (env-steps/sec).

Steps a batch of full locomotion environments (14-body ragdoll, 13 motored
joints, contacts vs ground, reward + auto-reset) with a random policy and
reports steady-state env-steps/sec.  Baseline target: 1M env-steps/sec at 4096
parallel scenes on v5e-8 (BASELINE.json); `vs_baseline` is measured/1e6.

Usage: python bench.py [--smoke] [--batch N] [--steps N] [--platform cpu|axon]
"""

import argparse
import json
import os
import sys
import time


def _axon_tunnel_down() -> bool:
    """True when the axon plugin is registered but its local relay is not
    accepting connections (a fast check; PJRT init itself retries ~30 min)."""
    import os
    import socket

    if os.environ.get("JAX_PLATFORMS") != "axon":
        return False
    host = os.environ.get("AXON_POOL_SVC_OVERRIDE",
                          os.environ.get("PALLAS_AXON_POOL_IPS", ""))
    if not host:
        return False
    for port in (8083, 8082):
        try:
            with socket.create_connection((host.split(",")[0], port),
                                          timeout=2):
                return False
        except OSError:
            continue
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny fast run")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--chunk", type=int, default=None,
                        help="step the batch as sequential sub-batches of "
                             "this size inside one jit (VMEM pressure at "
                             "4096 whole-batch costs ~8%%; 2048 chunks "
                             "recover it)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "axon"])
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif _axon_tunnel_down():
        # The axon TPU plugin dials a local relay; when the relay is down,
        # backend init retries for ~30 min before failing.  Probe the relay
        # port first so the bench still emits its JSON line (on CPU, with
        # the platform recorded) instead of hanging.
        print("warning: axon relay unreachable, falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from d3d12renderer_tpu.learning.loco_env import (
        ACTION_SIZE, LocoEnv, make_vec_env,
    )

    platform = jax.devices()[0].platform
    if args.batch is None:
        # The BASELINE config itself: 4096 parallel scenes on one chip,
        # stepped as two sequential 2048-env sub-batches inside one jit
        # (whole-batch 4096 costs ~8% to VMEM pressure; 2048 is the
        # measured sweet spot on v5e).
        args.batch = 64 if args.smoke else (4096 if platform == "tpu" else 256)
    if args.chunk is None:
        args.chunk = 2048 if (platform == "tpu" and not args.smoke) else args.batch
    args.chunk = min(args.chunk, args.batch)
    if args.steps is None:
        args.steps = 20 if args.smoke else 200
    n_sub = max(args.batch // args.chunk, 1)

    env = LocoEnv()
    reset, _ = make_vec_env(env, args.batch)

    @jax.jit
    def run_chunk(env_state, key):
        """`steps_per_chunk` env steps under one dispatch (scan)."""
        def body(carry, _):
            env_state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(
                k, (args.batch, ACTION_SIZE), minval=-0.5, maxval=0.5
            )
            if n_sub > 1:
                st = jax.tree_util.tree_map(
                    lambda x: x.reshape((n_sub, args.chunk) + x.shape[1:]),
                    env_state)
                act = actions.reshape(n_sub, args.chunk, ACTION_SIZE)
                st, rew = jax.lax.map(
                    lambda c: (lambda o, s, r, d: (s, r))(
                        *jax.vmap(env.step)(c[0], c[1])),
                    (st, act))
                env_state = jax.tree_util.tree_map(
                    lambda x: x.reshape((args.batch,) + x.shape[2:]), st)
                reward = rew.reshape(args.batch)
            else:
                obs, env_state, reward, done = jax.vmap(env.step)(
                    env_state, actions)
            return (env_state, key), reward.mean()

        (env_state, key), rewards = jax.lax.scan(
            body, (env_state, key), None, length=steps_per_chunk
        )
        return env_state, key, rewards.mean()

    steps_per_chunk = min(args.steps, 50)
    num_chunks = max(1, args.steps // steps_per_chunk)

    key = jax.random.PRNGKey(0)
    obs, env_state = reset(key)

    # Warmup / compile.
    env_state_w, key_w, r = run_chunk(env_state, key)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(num_chunks):
        env_state, key, r = run_chunk(env_state, key)
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0

    total_steps = num_chunks * steps_per_chunk * args.batch
    steps_per_sec = total_steps / elapsed

    parity = {} if args.smoke else bench_fused_parity(platform)
    ray = {} if args.smoke else bench_rays()
    phys = {} if args.smoke else bench_physics_scale(platform)
    pt_e2e = {} if args.smoke else _leg_in_subprocess("bench_pt_e2e", 2100)
    raster = {} if args.smoke else _leg_in_subprocess(
        "bench_raster_frame", 2100)

    print(json.dumps({
        "metric": "loco_env_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / 1_000_000.0, 4),
        "batch": args.batch,
        "chunk": args.chunk,
        "platform": platform,
        "mean_reward": float(r),
        **parity,
        **ray,
        **phys,
        **pt_e2e,
        **raster,
    }))


def bench_fused_parity(platform):
    """On-TPU fused-vs-regular env-step parity (VERDICT r4 weak #4b): the
    headline number runs the whole-env-step fused kernel, so the bench
    itself asserts the kernel still computes the physics it claims to —
    N identical-action steps on both paths, max state divergence bounded.
    Reference analogue: physics VALIDATE sweeps
    (/root/reference/src/physics/physics.cpp:805-905)."""
    if platform != "tpu":
        return {}
    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3d12renderer_tpu.learning.loco_env import (
        ACTION_SIZE, LocoEnv, make_vec_env,
    )
    from d3d12renderer_tpu.physics.types import PhysicsSettings

    try:
        batch, steps = 256, 5
        rng = np.random.default_rng(7)
        acts = jnp.asarray(
            rng.uniform(-0.5, 0.5, (steps, batch, ACTION_SIZE)), jnp.float32)

        def run(fused):
            env = LocoEnv(settings=PhysicsSettings(
                frame_rate=60, fused_substep=fused))
            reset, step = make_vec_env(env, batch)
            _, st = reset(jax.random.PRNGKey(0))
            for i in range(steps):
                obs, st, reward, done = step(st, acts[i])
            return jax.device_get(st.bodies), np.asarray(reward)

        fused_b, fused_r = run("auto")   # fused kernel on TPU
        ref_b, ref_r = run("off")        # regular XLA path
        err = max(
            float(np.max(np.abs(fused_b.pos - ref_b.pos))),
            float(np.max(np.abs(fused_b.vel - ref_b.vel))),
            float(np.max(np.abs(fused_r - ref_r))),
        )
        return {"fused_parity_max_err": round(err, 8),
                "fused_parity_ok": bool(err < 1e-3),
                "fused_parity_steps": steps}
    except Exception as e:
        return {"fused_parity_error": str(e)[:200]}


def _leg_in_subprocess(fn_name: str, timeout_s: int) -> dict:
    """Run `bench.<fn_name>()` in a fresh process, return its JSON dict.

    The heavy renderer legs compile multi-minute programs and can hit
    TPU-side faults that wedge the client; isolation means a fault or hang
    costs ONE leg (an `<leg>_error`/`<leg>_timeout` key), never the whole
    bench run."""
    import json as _json
    import subprocess
    import sys as _sys

    code = (
        "import sys, json; sys.path.insert(0, %r); sys.argv=['bench'];\n"
        "import jax; jax.config.update('jax_platforms', 'axon')\n"
        "import bench\n"
        "print('LEGJSON ' + json.dumps(getattr(bench, %r)()))\n"
        % (os.path.dirname(os.path.abspath(__file__)), fn_name)
    )
    try:
        p = subprocess.run([_sys.executable, "-u", "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        for line in p.stdout.splitlines():
            if line.startswith("LEGJSON "):
                return _json.loads(line[len("LEGJSON "):])
        return {fn_name + "_error":
                (p.stderr.strip().splitlines() or ["no output"])[-1][:200]}
    except subprocess.TimeoutExpired:
        return {fn_name + "_timeout_s": timeout_s}
    except Exception as e:
        return {fn_name + "_error": str(e)[:200]}


def bench_raster_frame():
    """Full raster pipeline on the 260k-tri atrium at 1920x1080 (VERDICT r4
    next #1): raster primary visibility + CSM sun shadows + HBAO + SSR +
    TAA + bloom + tonemap + sharpen, grouped dispatch, steady state.
    Shadow maps render once up front (static scene + sun: the shelf-atlas
    movement-hash cache keeps them; reference renders Sponza interactively
    at 1920x1080, /root/reference/src/application.cpp:106 + main.cpp:121)."""
    import math
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import pathtracer as pt
    from d3d12renderer_tpu.render.camera import look_at
    from d3d12renderer_tpu.render.mesh import atrium_scene
    from d3d12renderer_tpu.render.pipeline import (
        RendererSettings, _fit_cascades_jit, _render_sun_shadow_maps_jit,
        initial_frame_state, render_frame,
    )

    try:
        w, h = 1920, 1080
        bvh = bvh_mod.build_bvh(atrium_scene(1.4))
        mats = pt.Materials(
            albedo=jnp.array([[0.55, 0.5, 0.45], [0.7, 0.66, 0.6],
                              [0.75, 0.72, 0.65], [0.6, 0.58, 0.52],
                              [0.9, 0.88, 0.85], [0.6, 0.15, 0.12]]),
            emissive=jnp.zeros((6, 3)),
            roughness=jnp.array([0.6, 0.7, 0.55, 0.65, 0.15, 0.8]),
            metallic=jnp.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
        )
        scene = pt.Scene(bvh=bvh, materials=mats,
                         sky=pt.default_sky()).with_shading_table()
        cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
                      v_fov=math.radians(60), aspect=w / h)
        settings = RendererSettings(primary="raster", half_res_effects=True)
        # The 786k-ray cascade render intermittently crashes the tunneled
        # TPU worker (~50% observed); retry once, then measure the frame
        # with shadows disabled rather than losing the whole leg.
        maps, shadow_note = None, "cached"
        for attempt in range(2):
            try:
                maps = _fit_cascades_jit(cam.position,
                                         scene.sky.sun_direction)
                maps = _render_sun_shadow_maps_jit(scene.bvh, maps,
                                                   resolution=512)
                jax.block_until_ready(maps)
                break
            except Exception:
                maps = None
                shadow_note = "disabled (shadow render crashed the worker)"
                time.sleep(120)
        if maps is None:
            settings = RendererSettings(primary="raster",
                                        half_res_effects=True,
                                        enable_shadows=False)

        fs = initial_frame_state(w, h)
        key = jax.random.PRNGKey(0)

        def frame(fs, i):
            ldr, fs, _ = render_frame(
                scene, cam, w, h, settings, shadow_maps=maps,
                frame_state=fs, prev_camera=cam,
                key=jax.random.fold_in(key, i), dispatch="per_pass")
            return ldr, fs

        ldr, fs = frame(fs, 0)
        jax.block_until_ready(ldr)
        best = np.inf
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(5):
                ldr, fs = frame(fs, rep * 5 + i + 1)
            jax.block_until_ready(ldr)
            best = min(best, (time.perf_counter() - t0) / 5)
        ms = best * 1e3
        return {
            "raster_1080p_atrium_ms": round(ms, 2),
            "raster_atrium_fps": round(1000.0 / ms, 1),
            "raster_atrium_tris": int(np.asarray(bvh.tri_valid).sum()),
            # round-5 target: <= 33 ms/frame on one chip.
            "raster_atrium_vs_target": round(33.0 / ms, 3),
            "raster_frame_mean": round(float(jnp.mean(ldr)), 4),
            "raster_shadows": shadow_note,
        }
    except Exception as e:
        return {"raster_atrium_error": str(e)[:300]}


def bench_pt_e2e():
    """End-to-end path-tracing throughput (VERDICT r4 next #2): depth-3
    progressive path trace of the 260k-tri atrium at 1080p with sun NEE +
    MIS, counting every useful ray the frame dispatches (primary + bounce
    closest-hit + NEE shadow; dead rows suppressed AND excluded).
    BASELINE target: >=50 Mrays/s path tracing @1080p on v5e-8 =>
    >=6.25 Mrays/s e2e per chip.  Reference feature set:
    /root/reference/src/rendering/path_tracing.h:28."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import pathtracer as pt
    from d3d12renderer_tpu.render.camera import look_at
    from d3d12renderer_tpu.render.mesh import atrium_scene
    import math

    try:
        w, h = 1920, 1080
        bvh = bvh_mod.build_bvh(atrium_scene(1.4))
        mats = pt.Materials(
            albedo=jnp.array([[0.55, 0.5, 0.45], [0.7, 0.66, 0.6],
                              [0.75, 0.72, 0.65], [0.6, 0.58, 0.52],
                              [0.9, 0.88, 0.85], [0.6, 0.15, 0.12]]),
            emissive=jnp.zeros((6, 3)),
            roughness=jnp.array([0.6, 0.7, 0.55, 0.65, 0.15, 0.8]),
            metallic=jnp.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
        )
        scene = pt.Scene(bvh=bvh, materials=mats,
                         sky=pt.default_sky()).with_shading_table()
        cam = look_at((8.0, 6.0, -14.0), (0.0, 3.0, 0.0),
                      v_fov=math.radians(60), aspect=w / h)
        settings = pt.PathTracerSettings(recursion_depth=3)
        f = jax.jit(lambda k: pt.render(scene, cam, w, h, settings,
                                        spp=1, key=k, with_stats=True))
        img, nrays = f(jax.random.PRNGKey(0))
        jax.block_until_ready(img)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            img, nrays = f(jax.random.PRNGKey(i + 1))
            jax.block_until_ready(img)
            best = min(best, time.perf_counter() - t0)
        mrays = float(nrays) / best / 1e6
        return {
            "pt_mrays_e2e": round(mrays, 2),
            "pt_e2e_rays_per_frame": int(nrays),
            "pt_e2e_frame_ms": round(best * 1e3, 1),
            "pt_e2e_vs_baseline": round(mrays / 6.25, 4),
        }
    except Exception as e:
        return {"pt_e2e_error": str(e)[:300]}


def bench_physics_scale(platform):
    """Runtime-physics perf legs (VERDICT r4 next #6).

    stack: B x 1k-body stack drops (BASELINE config 1 batched — the TPU
    story is parallel scenes; reference broadphase
    /root/reference/src/physics/collision_broad.cpp:297).  Reports
    aggregate scene-steps/s and body-steps/s at batch 8.

    vehicle: the 16-part gear-train vehicle driving on a plane (BASELINE
    config 4, the GJK/EPA hot path; reference
    /root/reference/src/physics/vehicle.cpp:303), batched x8."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3d12renderer_tpu.physics.step import physics_step
    from d3d12renderer_tpu.physics.types import PhysicsSettings

    out = {}

    def timed_batched(arch, state0, settings, batch, steps, dt,
                      overrides=None):
        st = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)

        @jax.jit
        def run_chunk(st):
            def body(st, _):
                st = jax.vmap(lambda s: physics_step(
                    arch, s, settings, dt,
                    motor_overrides=overrides)[0])(st)
                return st, None
            return jax.lax.scan(body, st, None, length=chunk)[0]

        chunk = 25
        st = run_chunk(st)
        jax.block_until_ready(st.pos)
        t0 = time.perf_counter()
        done = 0
        while done < steps:
            st = run_chunk(st)
            done += chunk
        jax.block_until_ready(st.pos)
        return st, done * batch / (time.perf_counter() - t0)

    try:
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "examples"))
        from stack_drop_1k import build_scene

        arch, state0 = build_scene(1000)
        settings = PhysicsSettings(frame_rate=120, solver_iterations=30,
                                   contact_mode="split_jacobi")
        batch = 8 if platform == "tpu" else 2
        st, sps = timed_batched(arch, state0, settings, batch, 100,
                                1.0 / 60.0)
        ymin = float(st.pos[..., 1].min())
        out.update({
            "stack_scene_steps_per_sec": round(sps, 1),
            "stack_body_steps_per_sec": round(sps * 1000, 0),
            "stack_batch": batch,
            # 10x real-time aggregate at this batch = batch * 600 steps/s.
            "stack_vs_realtime": round(sps / (batch * 60.0), 2),
            "stack_ok": bool(ymin > -0.2),
        })
    except Exception as e:
        out["stack_error"] = str(e)[:200]

    try:
        from d3d12renderer_tpu.models.vehicle import (
            build_vehicle, drive_overrides,
        )
        from d3d12renderer_tpu.physics.builder import SceneBuilder

        b = SceneBuilder()
        b.add_static_plane((0.0, 1.0, 0.0), 0.0, friction=1.0)
        info = build_vehicle(b, position=(0.0, 0.85, 0.0))
        arch, state0 = b.finalize()
        overrides = drive_overrides(arch, info, throttle_velocity=10.0,
                                    steering_angle=0.0)
        settings = PhysicsSettings(frame_rate=60,
                                   contact_mode="split_jacobi")
        batch = 8 if platform == "tpu" else 2
        st, sps = timed_batched(arch, state0, settings, batch, 100,
                                1.0 / 60.0, overrides=overrides)
        motor = info.bodies["motor"]
        dist = float(jnp.linalg.norm(
            (st.pos[0, motor] - state0.pos[motor])[jnp.array([0, 2])]))
        out.update({
            "vehicle_steps_per_sec": round(sps, 1),
            "vehicle_batch": batch,
            "vehicle_vs_realtime": round(sps / (batch * 60.0), 2),
            "vehicle_drove_m": round(dist, 2),
        })
    except Exception as e:
        out["vehicle_error"] = str(e)[:200]
    return out


def bench_rays():
    """Second metric (VERDICT r1 item 4): ray throughput at 1080p on a
    >=50k-triangle scene, via the two-level culled Pallas kernel with
    tile-ordered rays.  Baseline target: >=50 Mrays/s path trace @1080p on
    v5e-8 => >=6.25 Mrays/s per chip; `ray_vs_baseline` is per-chip
    measured / 6.25."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3d12renderer_tpu.ops.ray_trace_pallas import closest_hit_pallas
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render.mesh import sphere_grid_scene
    from d3d12renderer_tpu.render.pathtracer import _tile_perm

    try:
        b = bvh_mod.build_bvh(sphere_grid_scene(16, 26))
        tris = int(np.asarray(b.tri_valid).sum())

        w, h = 1920, 1088  # 32-divisible 1080p-class framebuffer
        xs = (np.arange(w) + 0.5) / w * 2 - 1
        ys = (np.arange(h) + 0.5) / h * 2 - 1
        d = np.stack(np.broadcast_arrays(
            xs[None, :] * 0.9, -ys[:, None] * 0.55, np.full((h, w), 1.0),
        ), -1).reshape(-1, 3)
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        perm, _ = _tile_perm(w, h)
        d = d[perm]
        o = np.broadcast_to(
            np.array([0, 1.5, -9.0], np.float32), d.shape).copy()
        o_j, d_j = jnp.asarray(o), jnp.asarray(d)

        def timed(dense):
            f = jax.jit(lambda o, d: closest_hit_pallas(dense, o, d))
            res = f(o_j, d_j)
            jax.block_until_ready(res)
            # Dispatch a small batch and block ONCE: per-call
            # block_until_ready pays a device->host result fetch (~35 MB of
            # t/tri/uv/hit per frame) that is runtime-transport overhead,
            # not kernel time — on a tunneled chip it dominated (777 ms
            # blocked vs 171 ms/frame sustained, 53k-tri scene).
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [f(o_j, d_j) for _ in range(3)]
                jax.block_until_ready(rs)
                best = min(best, (time.perf_counter() - t0) / 3)
            return w * h / best / 1e6

        def timed_with_fallback(dense):
            """Fallback ladder so the bench can never lose the ray metric to
            a single kernel configuration (round 3 lost it to a Mosaic
            BlockSpec rule; VERDICT r3 weak #1).  Rungs move from the full
            feature set through feature-flag drops down to a SHAPE-level
            safe rung — sb=1 slabs + small ray blocks — because flag drops
            alone cannot fix a block-shape legality failure."""
            from d3d12renderer_tpu.ops import ray_trace_pallas as rtp

            rungs = [
                ({}, []),
                ({}, ["PACKSEL"]),
                ({}, ["PACKSEL", "EARLYOUT"]),
                # Shape rung: one ray block per slab, conservative tiles.
                ({"SLAB_BLOCKS": 1, "RAY_BLOCK": 256},
                 ["PACKSEL", "EARLYOUT"]),
            ]
            for shapes, drop in rungs:
                over = dict(shapes, **{k: False for k in drop})
                old = {k: getattr(rtp, k) for k in over}
                for k, v in over.items():
                    setattr(rtp, k, v)
                try:
                    return timed(dense), drop + sorted(shapes)
                except Exception:
                    if (shapes, drop) == rungs[-1]:
                        raise
                finally:
                    for k, v in old.items():
                        setattr(rtp, k, v)

        mrays, dropped = timed_with_fallback(b.dense)
        out = {
            "ray_mrays_per_sec": round(mrays, 2),
            "ray_scene_tris": tris,
            "ray_vs_baseline": round(mrays / 6.25, 4),
        }
        if dropped:
            out["ray_flags_dropped"] = ",".join(dropped)

        try:
            # Big-scene leg: ~495k triangles (VERDICT r2 target: >=10
            # Mrays/s at 500k tris on one chip).  Same coherent wavefront.
            bb = bvh_mod.build_bvh(sphere_grid_scene(44, 88))
            mrays_b, dropped_b = timed_with_fallback(bb.dense)
            out["ray_mrays_per_sec_500k"] = round(mrays_b, 2)
            out["ray_scene_tris_500k"] = int(np.asarray(bb.tri_valid).sum())
            if dropped_b:
                out["ray_flags_dropped_500k"] = ",".join(dropped_b)
        except Exception as e:  # keep the 53k numbers if the big leg dies
            out["ray_500k_error"] = str(e)[:200]

        try:
            # Architectural leg: ~260k-tri procedural atrium (Sponza-class
            # occluded interior — the reference's default editor content,
            # src/application.cpp:106; VERDICT r3 missing #6).
            from d3d12renderer_tpu.render.mesh import atrium_scene
            ba = bvh_mod.build_bvh(atrium_scene(1.4))
            mrays_a, dropped_a = timed_with_fallback(ba.dense)
            out["ray_mrays_per_sec_atrium"] = round(mrays_a, 2)
            out["ray_scene_tris_atrium"] = int(np.asarray(ba.tri_valid).sum())
            if dropped_a:
                out["ray_flags_dropped_atrium"] = ",".join(dropped_a)
        except Exception as e:
            out["ray_atrium_error"] = str(e)[:200]
        return out
    except Exception as e:  # never let the ray leg kill the headline metric
        return {"ray_error": str(e)[:300]}


if __name__ == "__main__":
    main()
