"""Headline benchmark: ragdoll-locomotion env throughput (env-steps/sec).

Steps a batch of full locomotion environments (14-body ragdoll, 13 motored
joints, contacts vs ground, reward + auto-reset) with a random policy and
reports steady-state env-steps/sec.  Baseline target: 1M env-steps/sec at 4096
parallel scenes on v5e-8 (BASELINE.json); `vs_baseline` is measured/1e6.

Usage: python bench.py [--smoke] [--batch N] [--steps N] [--platform cpu|axon]
"""

import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny fast run")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "axon"])
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from d3d12renderer_tpu.learning.loco_env import (
        ACTION_SIZE, LocoEnv, make_vec_env,
    )

    platform = jax.devices()[0].platform
    if args.batch is None:
        # 1024 envs/chip is the measured throughput sweet spot on v5e
        # (4096 regresses ~20%, likely VMEM pressure); the 4096-scene
        # BASELINE config maps to 512/chip on a v5e-8 data-parallel mesh.
        args.batch = 64 if args.smoke else (1024 if platform == "tpu" else 256)
    if args.steps is None:
        args.steps = 20 if args.smoke else 200

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
            obs, env_state, reward, done = jax.vmap(env.step)(env_state, actions)
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

    print(json.dumps({
        "metric": "loco_env_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / 1_000_000.0, 4),
        "batch": args.batch,
        "platform": platform,
        "mean_reward": float(r),
    }))


if __name__ == "__main__":
    main()
