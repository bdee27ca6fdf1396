"""d3d12renderer_tpu — a TPU-native physics + rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pkurth/D3D12Renderer: batched rigid-body physics (6 collider types, sequential
impulse solver, 6 joint types with limits/motors, cloth, ragdolls, vehicles),
a physically based renderer with a Pallas path tracer, an SoA-pytree scene
system, and an on-TPU reinforcement-learning loop for ragdoll locomotion.

Everything carries a leading scene-batch axis; `parallel/` shards that axis over
an ICI-connected device mesh with `shard_map`.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """Opt-out persistent XLA compilation cache (the analog of the
    reference's pipeline-state/shader caches, dx_pipeline.cpp:412): frame
    pipelines contain several multi-minute traversal compiles on current TPU
    toolchains; caching makes every run after the first start in seconds.

    Disable with D3DTPU_NO_COMPILATION_CACHE=1 or by pre-setting
    JAX_COMPILATION_CACHE_DIR."""
    import os

    if os.environ.get("D3DTPU_NO_COMPILATION_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it
    try:
        import jax

        path = os.path.expanduser("~/.cache/d3d12renderer_tpu/xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # never let cache setup break imports
        pass


_enable_persistent_compilation_cache()
