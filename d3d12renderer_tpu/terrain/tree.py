"""Trees: wind-bend vertex animation + mesh-weld import helper.

Reference: src/terrain/tree.h:13-27 (wind-bend vertex shader
shaders/tree/tree.hlsli) and tree.cpp:5 (kNN vertex welding on import via
nanoflann).  Welding here uses scipy cKDTree; the bend is a pure function
applied to vertex positions (device-side when animating).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wind_bend(positions, time, trunk_height=3.0, strength=0.15,
              frequency=0.9):
    """Displace vertices by height-weighted sway (reference: tree.hlsli —
    bend grows quadratically with normalized height)."""
    y01 = jnp.clip(positions[..., 1] / trunk_height, 0.0, 1.0)
    phase = positions[..., 0] * 0.31 + positions[..., 2] * 0.47
    sway = jnp.sin(time * frequency + phase) + 0.4 * jnp.sin(
        time * frequency * 2.33 + phase * 1.3
    )
    amp = strength * y01 * y01
    off = jnp.stack([sway * amp, jnp.zeros_like(amp), 0.6 * sway * amp], -1)
    return positions + off


def weld_vertices(positions: np.ndarray, indices: np.ndarray,
                  tolerance: float = 1e-4):
    """Merge vertices closer than `tolerance` (reference: tree.cpp kNN weld).

    Returns (positions', indices', remap)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(positions)
    pairs = tree.query_pairs(tolerance, output_type="ndarray")
    # Union-find with path halving (near-O(pairs)); roots end up at the
    # component-minimum index, matching the old per-pair relabel exactly
    # without its O(pairs x N) rescan.
    parent = np.arange(len(positions))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap = np.array([find(i) for i in range(len(positions))],
                     dtype=np.int64)
    used, inverse = np.unique(remap, return_inverse=True)
    new_pos = positions[used]
    new_idx = inverse[remap[indices]]
    return new_pos, new_idx.astype(np.int32), inverse[remap]
