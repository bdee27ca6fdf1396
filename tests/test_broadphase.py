"""Runtime dense-AABB broadphase (physics/broadphase.py).

Device-kernel-vs-host-reference pattern (reference self-test model:
src/rendering/bitonic_sort.cpp:215-281): candidate pairs are checked against a
brute-force NumPy enumeration, and SAP-mode dynamics against the compile-time
bucket path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3d12renderer_tpu.physics import broadphase, collide
from d3d12renderer_tpu.physics.builder import SceneBuilder
from d3d12renderer_tpu.physics.step import physics_step
from d3d12renderer_tpu.physics.types import PhysicsSettings


def _random_pile(num_bodies, seed=0, broadphase_mode="sap", neighbors=16):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    b.add_static_plane((0.0, 1.0, 0.0), 0.0, friction=0.5, restitution=0.0)
    side = int(np.ceil(num_bodies ** (1 / 3)))
    count = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if count >= num_bodies:
                    break
                pos = ((ix - side / 2) * 1.2 + rng.uniform(-0.05, 0.05),
                       0.8 + iy * 1.2,
                       (iz - side / 2) * 1.2 + rng.uniform(-0.05, 0.05))
                body = b.add_body(position=pos, mass=1.0)
                if count % 2 == 0:
                    b.add_box_collider(body, (0.4, 0.4, 0.4), friction=0.5)
                else:
                    b.add_sphere_collider(body, 0.4, friction=0.5)
                count += 1
    if broadphase_mode == "sap":
        return b.finalize(broadphase="sap", sap_neighbors=neighbors)
    return b.finalize()


def test_candidate_pairs_match_bruteforce():
    arch, state = _random_pile(27, seed=3)
    # Scatter bodies into a noisy cloud so overlaps are nontrivial.
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-2.0, 2.0, state.pos.shape).astype(np.float32))
    state = state.replace(pos=pos)

    wpos, wrot = collide.collider_world_poses(arch, state)
    amin, amax = broadphase.world_aabbs(arch, wpos, wrot)
    j_idx, valid, overflow = broadphase.candidate_pairs(arch, amin, amax)

    got = set()
    C = amin.shape[0]
    for i in range(C):
        for k in range(j_idx.shape[1]):
            if bool(valid[i, k]):
                got.add((i, int(j_idx[i, k])))

    amin_np, amax_np = np.asarray(amin), np.asarray(amax)
    coll = np.asarray(arch.sap_collidable)
    expect = set()
    for i in range(C):
        for j in range(i + 1, C):
            if not coll[i, j]:
                continue
            if np.all(amin_np[i] <= amax_np[j]) and np.all(amin_np[j] <= amax_np[i]):
                expect.add((i, j))

    assert int(overflow) == 0
    assert got == expect


def test_overflow_detected_when_neighbors_exceed_k():
    arch, state = _random_pile(27, seed=3, neighbors=2)
    # All bodies at the same spot: every pair overlaps -> rows overflow K=2.
    state = state.replace(pos=jnp.zeros_like(state.pos))
    assert int(broadphase.overflow_count(arch, state)) > 0


@pytest.mark.slow
def test_sap_pile_settles_like_static_buckets():
    settings = PhysicsSettings(frame_rate=60, solver_iterations=20,
                               contact_mode="split_jacobi")
    heights = {}
    for mode in ("sap", "static"):
        arch, state = _random_pile(27, seed=5, broadphase_mode=mode)
        step = jax.jit(lambda s, arch=arch: physics_step(
            arch, s, settings, 1.0 / 60.0)[0])
        for _ in range(150):
            state = step(state)
        ys = np.asarray(state.pos[:, 1])
        assert ys.min() > -0.1, f"{mode}: sank through floor"
        assert np.abs(np.asarray(state.pos)).max() < 50.0, f"{mode}: explosion"
        heights[mode] = np.sort(ys)

    # Same pile, same solver: settled height distributions agree loosely
    # (row order differs, so trajectories diverge at float level).
    assert np.abs(heights["sap"].mean() - heights["static"].mean()) < 0.15


def test_sap_requires_split_jacobi():
    arch, state = _random_pile(8)
    with pytest.raises(ValueError):
        physics_step(arch, state, PhysicsSettings(contact_mode="colored"),
                     1.0 / 60.0)
