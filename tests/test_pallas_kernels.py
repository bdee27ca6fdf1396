"""Pallas kernel tests (interpret mode on CPU) vs jnp references."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from d3d12renderer_tpu.ops.pallas_kernels import (
    gaussian_blur_pallas, gaussian_blur_reference, tonemap_srgb,
    tonemap_srgb_reference,
)


def test_tonemap_srgb_matches_reference():
    img = jax.random.uniform(jax.random.PRNGKey(0), (96, 200, 3)) * 8.0
    out = tonemap_srgb(img, exposure=0.2, interpret=True)
    ref = tonemap_srgb_reference(img, exposure=0.2)
    assert out.shape == img.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_gaussian_blur_matches_reference():
    img = jax.random.uniform(jax.random.PRNGKey(1), (64, 180, 3))
    out = gaussian_blur_pallas(img, sigma=2.0, interpret=True)
    ref = gaussian_blur_reference(img, sigma=2.0)
    assert out.shape == img.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_gaussian_blur_single_channel():
    img = jax.random.uniform(jax.random.PRNGKey(2), (40, 70))
    out = gaussian_blur_pallas(img, sigma=1.5, interpret=True)
    ref = gaussian_blur_reference(img, sigma=1.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ray_trace_pallas_matches_dense():
    from d3d12renderer_tpu.ops.ray_trace_pallas import closest_hit_pallas
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    ground = mesh_mod.quad(half=5.0)
    sphere = mesh_mod.ico_sphere(1.0, 2).transformed(translate=(0, 1.0, 0))
    b = bvh_mod.build_bvh([(ground, 0), (sphere, 1)])

    rng = np.random.default_rng(3)
    o = np.tile([[0.0, 3.0, 5.0]], (777, 1)).astype(np.float32)
    d = rng.normal(size=(777, 3)).astype(np.float32)
    d[:, 1] -= 0.6
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    r_pal = closest_hit_pallas(b.dense, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
    r_ref = bvh_mod.closest_hit_dense(b.dense, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(r_pal["hit"]),
                                  np.asarray(r_ref["hit"]))
    m = np.asarray(r_pal["hit"])
    np.testing.assert_allclose(np.asarray(r_pal["t"])[m],
                               np.asarray(r_ref["t"])[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(r_pal["tri"])[m],
                                  np.asarray(r_ref["tri"])[m])


def test_ray_trace_culled_matches_dense():
    """Two-level (cluster-AABB culled) kernel parity on a multi-chunk scene."""
    from d3d12renderer_tpu.ops.ray_trace_pallas import (
        TRI_CHUNK, closest_hit_pallas_culled,
    )
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    rng = np.random.default_rng(0)
    meshes = []
    for i in range(6):
        s = mesh_mod.uv_sphere(0.5 + 0.1 * i, 16, 24).transformed(
            translate=tuple(rng.uniform(-3, 3, 3)))
        meshes.append((s, i))
    b = bvh_mod.build_bvh(meshes)
    assert b.dense.n.shape[0] > TRI_CHUNK, "need a multi-chunk scene"
    assert b.dense.cluster_lo.shape[0] == -(-b.dense.n.shape[0] // TRI_CHUNK)

    R = 3000
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ref = bvh_mod.closest_hit_dense(b.dense, jnp.asarray(o), jnp.asarray(d))
    got = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]),
                                  np.asarray(ref["hit"]))
    m = np.asarray(ref["hit"])
    assert m.sum() > 50, "degenerate test: almost no hits"
    np.testing.assert_allclose(np.asarray(got["t"])[m],
                               np.asarray(ref["t"])[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["tri"])[m],
                                  np.asarray(ref["tri"])[m])


def test_ray_trace_culled_regroup_parity():
    """regroup=True (octant+Morton in-call resort) is an exact permutation:
    results equal the unsorted call for scattered rays."""
    from d3d12renderer_tpu.ops.ray_trace_pallas import (
        TRI_CHUNK, closest_hit_pallas_culled,
    )
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    rng = np.random.default_rng(11)
    meshes = []
    for i in range(6):
        s = mesh_mod.uv_sphere(0.5 + 0.1 * i, 16, 24).transformed(
            translate=tuple(rng.uniform(-3, 3, 3)))
        meshes.append((s, i))
    b = bvh_mod.build_bvh(meshes)
    assert b.dense.n.shape[0] > TRI_CHUNK

    R = 2048
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # Per-ray t_max exercises the t_max permutation path too.
    tm = jnp.asarray(rng.uniform(2.0, 30.0, (R,)).astype(np.float32))

    base = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                     t_max=tm, interpret=True)
    rg = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                   t_max=tm, interpret=True, regroup=True)
    for k in ("t", "tri", "hit"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(rg[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(np.asarray(base["uv"]),
                                  np.asarray(rg["uv"]))


@pytest.mark.slow
def test_ray_trace_culled_adaptive_slab_big_scene():
    """Big-scene path: >64 chunks shrinks the per-call slab so the
    prefetched chunk-id table stays in SMEM (_slab_blocks_for).  Parity vs
    the dense reference on a ~80k-triangle scene."""
    from d3d12renderer_tpu.ops.ray_trace_pallas import (
        _slab_blocks_for, closest_hit_pallas_culled,
    )
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    meshes = []
    for ix in range(5):
        for iz in range(5):
            s = mesh_mod.uv_sphere(0.45, 30, 58).transformed(
                translate=(ix * 1.2 - 2.4, 0.5, iz * 1.2 - 2.4))
            meshes.append((s, (ix + iz) % 3))
    b = bvh_mod.build_bvh(meshes)
    nc = b.dense.cluster_lo.shape[0]
    assert nc > 64, f"need >64 chunks to exercise the adaptive path, got {nc}"
    assert _slab_blocks_for(nc) < 64

    rng = np.random.default_rng(7)
    R = 256
    o = np.tile([[0.0, 2.0, -6.0]], (R, 1)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d[:, 2] += 1.2
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ref = bvh_mod.closest_hit_dense(b.dense, jnp.asarray(o), jnp.asarray(d))
    got = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]),
                                  np.asarray(ref["hit"]))
    m = np.asarray(ref["hit"])
    assert m.sum() > 20
    np.testing.assert_allclose(np.asarray(got["t"])[m],
                               np.asarray(ref["t"])[m], rtol=1e-5)


def test_ray_trace_culled_any_hit_occlusion():
    """any_hit mode: exact occlusion booleans under finite segment t_max,
    even though rays settle at their first intersected chunk (the early-out
    path of bvh.any_hit on the pallas backend)."""
    from d3d12renderer_tpu.ops.ray_trace_pallas import (
        TRI_CHUNK, closest_hit_pallas_culled,
    )
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    rng = np.random.default_rng(7)
    meshes = []
    for i in range(6):
        s = mesh_mod.uv_sphere(0.5 + 0.1 * i, 16, 24).transformed(
            translate=tuple(rng.uniform(-3, 3, 3)))
        meshes.append((s, i))
    b = bvh_mod.build_bvh(meshes)
    assert b.dense.n.shape[0] > TRI_CHUNK

    R = 2000
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tm = rng.uniform(0.5, 10.0, (R,)).astype(np.float32)

    ref = bvh_mod.closest_hit_dense(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    t_max=jnp.asarray(tm))
    want = np.asarray(ref["hit"]) & (np.asarray(ref["t"]) < tm)
    got = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    t_max=jnp.asarray(tm), interpret=True,
                                    any_hit=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]), want)
    assert want.sum() > 20, "degenerate test: almost no occluded rays"


def test_ray_trace_culled_any_hit_regroup_combo():
    """any_hit + in-call regroup: the permutation wrapper must pass the
    occlusion semantics through and inverse-scatter `hit` exactly."""
    from d3d12renderer_tpu.ops.ray_trace_pallas import (
        closest_hit_pallas_culled,
    )
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    rng = np.random.default_rng(11)
    meshes = []
    for i in range(6):
        s = mesh_mod.uv_sphere(0.5 + 0.1 * i, 16, 24).transformed(
            translate=tuple(rng.uniform(-3, 3, 3)))
        meshes.append((s, i))
    b = bvh_mod.build_bvh(meshes)

    R = 1500
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tm = rng.uniform(0.5, 10.0, (R,)).astype(np.float32)

    ref = bvh_mod.closest_hit_dense(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    t_max=jnp.asarray(tm))
    want = np.asarray(ref["hit"]) & (np.asarray(ref["t"]) < tm)
    got = closest_hit_pallas_culled(b.dense, jnp.asarray(o), jnp.asarray(d),
                                    t_max=jnp.asarray(tm), interpret=True,
                                    any_hit=True, regroup=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]), want)


def test_ray_trace_packsel_matches_onehot(monkeypatch):
    """The packed-key winner select (PACKSEL: one int32 min-reduce with the
    column in the low mantissa bits) returns the same hits, exact-identical
    t, and matching uv as the one-hot argmin chain it replaces."""
    from d3d12renderer_tpu.ops import ray_trace_pallas as rtp
    from d3d12renderer_tpu.render import bvh as bvh_mod
    from d3d12renderer_tpu.render import mesh as mesh_mod

    rng = np.random.default_rng(5)
    meshes = []
    for i in range(6):
        s = mesh_mod.uv_sphere(0.5 + 0.1 * i, 16, 24).transformed(
            translate=tuple(rng.uniform(-3, 3, 3)))
        meshes.append((s, i))
    b = bvh_mod.build_bvh(meshes)

    R = 2000
    o = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    monkeypatch.setattr(rtp, "PACKSEL", True)
    fast = rtp.closest_hit_pallas_culled(b.dense, jnp.asarray(o),
                                         jnp.asarray(d), interpret=True)
    monkeypatch.setattr(rtp, "PACKSEL", False)
    ref = rtp.closest_hit_pallas_culled(b.dense, jnp.asarray(o),
                                        jnp.asarray(d), interpret=True)

    np.testing.assert_array_equal(np.asarray(fast["hit"]),
                                  np.asarray(ref["hit"]))
    m = np.asarray(ref["hit"])
    assert m.sum() > 50
    # t is the exact min on both paths (PACKSEL only approximates the
    # ARGmin among sub-1e-4-relative ties).
    np.testing.assert_array_equal(np.asarray(fast["t"])[m],
                                  np.asarray(ref["t"])[m])
    same = np.asarray(fast["tri"])[m] == np.asarray(ref["tri"])[m]
    assert same.mean() > 0.999, f"tri winners diverged: {1 - same.mean():.4f}"
    np.testing.assert_allclose(np.asarray(fast["uv"])[m][same],
                               np.asarray(ref["uv"])[m][same],
                               rtol=2e-3, atol=2e-3)