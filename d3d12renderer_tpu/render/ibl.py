"""Image-based lighting preprocessing.

Reference: src/rendering/texture_preprocessing.h:10-23 + shaders/
texture_preprocessing/*.hlsl — equirect->cubemap, GGX-prefiltered radiance
mips, diffuse irradiance (incl. the SH variant), and the split-sum BRDF LUT;
environment resolutions sky 2048 / irradiance 32 / prefiltered 128
(src/rendering/pbr_environment.h:41-43).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# Reference resolutions (pbr_environment.h:41-43).
SKY_RESOLUTION = 2048
IRRADIANCE_RESOLUTION = 32
PREFILTERED_RESOLUTION = 128


def equirect_to_cubemap(equirect, face_res: int):
    """(He, We, 3) equirect -> (6, R, R, 3) cubemap
    (reference: equirectangular_to_cubemap_cs.hlsl)."""
    u = (jnp.arange(face_res) + 0.5) / face_res * 2 - 1
    gu, gv = jnp.meshgrid(u, u)
    one = jnp.ones_like(gu)
    # Standard cubemap face bases (+x, -x, +y, -y, +z, -z).
    dirs = jnp.stack([
        jnp.stack([one, -gv, -gu], -1),
        jnp.stack([-one, -gv, gu], -1),
        jnp.stack([gu, one, gv], -1),
        jnp.stack([gu, -one, -gv], -1),
        jnp.stack([gu, -gv, one], -1),
        jnp.stack([-gu, -gv, -one], -1),
    ])
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return sample_equirect(equirect, d)


def sample_equirect(equirect, d):
    he, we, _ = equirect.shape
    theta = jnp.arccos(jnp.clip(d[..., 1], -1, 1))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    u = (phi / (2 * math.pi) + 0.5) * (we - 1)
    v = theta / math.pi * (he - 1)
    return equirect[jnp.clip(v.astype(jnp.int32), 0, he - 1),
                    jnp.clip(u.astype(jnp.int32), 0, we - 1)]


def _fibonacci_hemisphere(n, key=None):
    i = jnp.arange(n, dtype=jnp.float32) + 0.5
    phi = i * (math.pi * (3.0 - math.sqrt(5.0)))
    cos_t = 1.0 - i / n
    sin_t = jnp.sqrt(jnp.maximum(1 - cos_t ** 2, 0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1), cos_t


def irradiance_sh9(env_fn, num_samples=2048):
    """Project an environment (direction -> radiance fn) onto 9 SH bands
    (reference: texture_preprocessing irradiance SH variant)."""
    i = jnp.arange(num_samples, dtype=jnp.float32) + 0.5
    phi = i * (math.pi * (3.0 - math.sqrt(5.0)))
    cos_t = 1.0 - 2.0 * i / num_samples
    sin_t = jnp.sqrt(jnp.maximum(1 - cos_t ** 2, 0))
    d = jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], -1)
    radiance = env_fn(d)  # (N, 3)

    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    basis = jnp.stack([
        0.282095 * jnp.ones_like(x),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3 * z * z - 1),
        1.092548 * x * z, 0.546274 * (x * x - y * y),
    ], -1)                                                   # (N, 9)
    sh = jnp.einsum("nb,nc->bc", basis, radiance) * (4 * math.pi / num_samples)
    return sh  # (9, 3)


def eval_irradiance_sh9(sh, n):
    """Diffuse irradiance from SH9 coefficients at normals n (..., 3)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    # Lambertian convolution constants.
    c = (0.429043, 0.511664, 0.743125, 0.886227, 0.247708)
    return (
        c[3] * sh[0]
        + 2 * c[1] * (sh[1] * y[..., None] + sh[2] * z[..., None] + sh[3] * x[..., None])
        + 2 * c[0] * (sh[4] * (x * y)[..., None] + sh[5] * (y * z)[..., None]
                      + sh[7] * (x * z)[..., None])
        + c[2] * sh[6] * (z * z)[..., None] - c[4] * sh[6]
        + c[0] * sh[8] * (x * x - y * y)[..., None]
    )


def prefilter_ggx(env_fn, roughness_levels=(0.0, 0.25, 0.5, 0.75, 1.0),
                  num_dirs=256, num_samples=128, key=None):
    """GGX-prefiltered radiance per roughness level on a Fibonacci direction
    set (reference: prefilter_environment_cs.hlsl mips)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    i = jnp.arange(num_dirs, dtype=jnp.float32) + 0.5
    phi = i * (math.pi * (3.0 - math.sqrt(5.0)))
    cos_t = 1.0 - 2.0 * i / num_dirs
    sin_t = jnp.sqrt(jnp.maximum(1 - cos_t ** 2, 0))
    dirs = jnp.stack([sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi)], -1)

    from ..core import maths as m
    levels = []
    for rough in roughness_levels:
        alpha = max(rough * rough, 1e-3)
        u1 = jax.random.uniform(jax.random.fold_in(key, int(rough * 100)),
                                (num_samples,))
        u2 = jax.random.uniform(jax.random.fold_in(key, int(rough * 100) + 1),
                                (num_samples,))
        ct = jnp.sqrt((1 - u1) / (1 + (alpha * alpha - 1) * u1))
        st = jnp.sqrt(jnp.maximum(1 - ct * ct, 0))
        ph = 2 * math.pi * u2
        t1, t2 = m.orthonormal_basis(dirs)                 # (D,3)
        h = (t1[:, None] * (st * jnp.cos(ph))[None, :, None]
             + t2[:, None] * (st * jnp.sin(ph))[None, :, None]
             + dirs[:, None] * ct[None, :, None])           # (D,S,3)
        l = 2 * jnp.sum(dirs[:, None] * h, -1, keepdims=True) * h - dirs[:, None]
        w = jnp.maximum(jnp.sum(dirs[:, None] * l, -1), 0.0)
        rad = env_fn(l.reshape(-1, 3)).reshape(num_dirs, num_samples, 3)
        lev = jnp.sum(rad * w[..., None], 1) / jnp.maximum(
            jnp.sum(w, 1)[..., None], 1e-6)
        levels.append(lev)
    return dirs, jnp.stack(levels)  # (D,3), (R,D,3)


def brdf_lut(resolution=64, num_samples=256):
    """Split-sum BRDF LUT over (n_dot_v, roughness)
    (reference: integrate_brdf_cs.hlsl)."""
    nv = (jnp.arange(resolution) + 0.5) / resolution
    rough = (jnp.arange(resolution) + 0.5) / resolution
    nvg, rg = jnp.meshgrid(nv, rough)                       # (R,R)
    v = jnp.stack([jnp.sqrt(1 - nvg ** 2), jnp.zeros_like(nvg), nvg], -1)
    n = jnp.array([0.0, 0.0, 1.0])

    a_sum = jnp.zeros_like(nvg)
    b_sum = jnp.zeros_like(nvg)
    i = jnp.arange(num_samples, dtype=jnp.float32)
    u1 = (i + 0.5) / num_samples
    # Van der Corput radical inverse for u2.
    bits = i.astype(jnp.uint32)
    bits = ((bits << 16) | (bits >> 16))
    bits = ((bits & jnp.uint32(0x55555555)) << 1) | ((bits & jnp.uint32(0xAAAAAAAA)) >> 1)
    bits = ((bits & jnp.uint32(0x33333333)) << 2) | ((bits & jnp.uint32(0xCCCCCCCC)) >> 2)
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << 4) | ((bits & jnp.uint32(0xF0F0F0F0)) >> 4)
    bits = ((bits & jnp.uint32(0x00FF00FF)) << 8) | ((bits & jnp.uint32(0xFF00FF00)) >> 8)
    u2 = bits.astype(jnp.float32) * (1.0 / 4294967296.0)

    alpha = jnp.maximum(rg * rg, 1e-3)[..., None]           # (R,R,1)
    ct = jnp.sqrt((1 - u1) / (1 + (alpha ** 2 - 1) * u1))   # (R,R,S)
    st = jnp.sqrt(jnp.maximum(1 - ct ** 2, 0))
    ph = 2 * math.pi * u2
    h = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], -1)  # (R,R,S,3)
    l = 2 * jnp.sum(v[..., None, :] * h, -1, keepdims=True) * h - v[..., None, :]

    n_dot_l = jnp.maximum(l[..., 2], 0.0)
    n_dot_h = jnp.maximum(h[..., 2], 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v[..., None, :] * h, -1), 1e-6)
    n_dot_v = jnp.maximum(nvg, 1e-4)[..., None]

    k = (rg[..., None] ** 2) / 2.0
    g = (n_dot_l / (n_dot_l * (1 - k) + k)) * (n_dot_v / (n_dot_v * (1 - k) + k))
    g_vis = g * v_dot_h / jnp.maximum(n_dot_h * n_dot_v, 1e-6)
    fc = (1 - v_dot_h) ** 5
    valid = n_dot_l > 0
    a_sum = jnp.sum(jnp.where(valid, (1 - fc) * g_vis, 0.0), -1) / num_samples
    b_sum = jnp.sum(jnp.where(valid, fc * g_vis, 0.0), -1) / num_samples
    return jnp.stack([a_sum, b_sum], -1)  # (R, R, 2): indexed [rough, n_dot_v]
