"""Placement / grass / water / tree tests."""

import jax
import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.terrain.grass import (
    blade_lod, blade_triangles, generate_grass_blades,
)
from d3d12renderer_tpu.terrain.heightmap import generate_heightmap
from d3d12renderer_tpu.terrain.placement import generate_placement_points
from d3d12renderer_tpu.terrain.tree import weld_vertices, wind_bend
from d3d12renderer_tpu.terrain.water import water_color, water_normal


def test_placement_respects_slope_and_density():
    h = generate_heightmap(resolution=64, world_size=32.0, amplitude=6.0, seed=2)
    origin = jnp.array([-16.0, 0.0, -16.0])
    pts = generate_placement_points(
        h, origin, 32.0 / 63, 32.0, jax.random.PRNGKey(0),
        points_per_side=32, max_slope_y=0.9, density=0.5,
    )
    n_total = 32 * 32
    count = int(pts["count"])
    assert 0 < count < n_total  # both masks bite
    # Valid points sit on the terrain surface.
    valid = np.asarray(pts["valid"])
    pos = np.asarray(pts["position"])[valid]
    assert np.isfinite(pos).all()
    assert (pos[:, 1] >= -0.01).all() and (pos[:, 1] <= 6.01).all()
    # Order lists valid rows first.
    order = np.asarray(pts["order"])
    assert valid[order[:count]].all()


def test_grass_blades_and_wind():
    h = generate_heightmap(resolution=64, world_size=32.0, amplitude=2.0, seed=4)
    origin = jnp.array([-16.0, 0.0, -16.0])
    blades = generate_grass_blades(h, origin, 32.0 / 63, 32.0,
                                   jax.random.PRNGKey(1), blades_per_side=16)
    v0, t0 = blade_triangles(blades, time=0.0)
    v1, t1 = blade_triangles(blades, time=1.0)
    assert v0.shape == v1.shape and t0.shape == t1.shape
    assert int(t0.max()) < v0.shape[0]
    # Wind moves blade tips over time.
    assert float(jnp.abs(v1 - v0).max()) > 1e-3
    # Blade roots stay put.
    lod = blade_lod(blades["position"], jnp.array([0.0, 0.0, 0.0]))
    assert set(np.unique(np.asarray(lod))) <= {0, 1}


def test_water_normal_and_color():
    x = jnp.linspace(-5, 5, 32)
    n0 = water_normal(x, x, time=0.0)
    n1 = water_normal(x, x, time=2.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n0), axis=-1), 1.0,
                               atol=1e-5)
    assert float(jnp.abs(n1 - n0).max()) > 1e-3  # animated
    c_shallow = water_color(jnp.array(0.1))
    c_deep = water_color(jnp.array(10.0))
    assert float(c_shallow[1]) > float(c_deep[1])  # shallow greener


def test_tree_wind_and_weld():
    pos = jnp.array([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    bent0 = wind_bend(pos, 0.3)
    # Root does not move; crown does.
    np.testing.assert_allclose(np.asarray(bent0[0]), [0, 0, 0], atol=1e-6)
    assert abs(float(bent0[1, 0])) > 1e-3

    p = np.array([[0, 0, 0], [1, 0, 0], [1.00001, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 3], [2, 3, 0]], np.int32)
    new_p, new_i, _ = weld_vertices(p, idx, tolerance=1e-3)
    assert len(new_p) == 3
    assert new_i.max() < 3
