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
