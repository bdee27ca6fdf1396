"""Hand-written Pallas TPU kernels for image-space hot paths.

The frame post-stack (reference: shaders/post_processing/*.hlsl) is
bandwidth-bound: each pass reads and writes the full HDR target.  These
kernels keep whole pass sequences VMEM-resident: a fused
exposure+tonemap+sRGB present pass, and a separable gaussian blur whose
horizontal intermediate stays in VMEM for the vertical pass.

Measured on v5e (1080p tonemap / 512^2 blur): XLA's own fusion already
reaches the same bandwidth (1.5/2.0 ms) and these kernels run at 2.6/4.7 ms
(single-channel-per-grid-step serializes what XLA parallelizes).  They are
kept as verified Pallas infrastructure — the pattern to reach for when a
pass sequence appears that XLA cannot fuse — with interpret-mode tests and
device-vs-host references; the production post stack stays on the XLA path
(render/post.py).

The blur question was ultimately won WITHOUT Pallas: the banded-matmul
formulation (render/post.py gaussian_blur_matmul — two MXU matmuls against
constant band matrices) measures 0.02 ms at 1080p vs 0.07 ms for the XLA
shift-chain and 4.7 ms for the kernel here.  The MXU, not a hand-written
VMEM pipeline, was the right tool.

Each kernel has an interpret-mode path (tests run on CPU) and a jnp reference
for the device-vs-host comparison pattern (SURVEY.md §4.1).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: last dim 128 lanes; rows per tile chosen for f32 (8, 128) tiling.
TILE_H = 64
TILE_W = 128


def _pad_hw(img, tile_h, tile_w):
    h, w = img.shape[:2]
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2),
                      mode="edge")
    return img, h, w


# --------------------------------------------------------------------------
# Fused tonemap + sRGB encode (reference: tonemap_cs.hlsl + present)
# --------------------------------------------------------------------------

def _tonemap_kernel(x_ref, params_ref, out_ref):
    x = x_ref[:]
    exposure = params_ref[0]
    a, b, c, d, e, f = (params_ref[i] for i in range(1, 7))
    white = params_ref[7]

    def curve(v):
        return ((v * (a * v + c * b) + d * e)
                / (v * (a * v + b) + d * f)) - e / f

    v = jnp.maximum(x * exposure, 0.0)
    ldr = jnp.clip(curve(v) / curve(white), 0.0, 1.0)
    # sRGB encode.
    out_ref[:] = jnp.where(
        ldr <= 0.0031308, ldr * 12.92,
        1.055 * jnp.exp(jnp.log(jnp.maximum(ldr, 1e-7)) * (1 / 2.4)) - 0.055,
    )


def tonemap_srgb(img, exposure=0.2, tonemap=None, interpret=False):
    """Fused filmic tonemap + sRGB on (H, W, 3); one pass over HBM.

    Uses the same Uncharted-2 constants as post.TonemapSettings."""
    from ..render.post import TonemapSettings

    t = tonemap or TonemapSettings()
    params = jnp.array([2.0 ** exposure, t.A, t.B, t.C, t.D, t.E, t.F,
                        t.linear_white], jnp.float32)
    x = jnp.moveaxis(img, -1, 0)           # (3, H, W): channels in the grid
    x, h, w = _pad_hw(jnp.moveaxis(x, 0, -1), TILE_H, TILE_W)
    x = jnp.moveaxis(x, -1, 0)
    c, hp, wp = x.shape

    out = pl.pallas_call(
        _tonemap_kernel,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        grid=(c, hp // TILE_H, wp // TILE_W),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda ci, i, j: (ci, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda ci, i, j: (ci, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, params)
    return jnp.moveaxis(out, 0, -1)[:h, :w]


def tonemap_srgb_reference(img, exposure=0.2, tonemap=None):
    """jnp reference for the device-vs-host comparison."""
    from ..render.post import TonemapSettings, to_srgb, tonemap_uncharted2

    t = tonemap or TonemapSettings()
    t = t.replace(exposure=exposure)
    return to_srgb(tonemap_uncharted2(img, t))


# --------------------------------------------------------------------------
# Separable gaussian blur with VMEM-resident intermediate
# (reference: gaussian_blur_*_cs.hlsl)
# --------------------------------------------------------------------------

def _blur_kernel(x_ref, k_ref, out_ref, *, radius):
    """Both blur axes on a full (1, Hp, Wp) channel image resident in VMEM —
    the horizontal intermediate never leaves the chip."""
    x = x_ref[0]
    acc = k_ref[radius] * x
    for i in range(1, radius + 1):
        acc = acc + k_ref[radius - i] * jnp.roll(x, i, axis=1)
        acc = acc + k_ref[radius + i] * jnp.roll(x, -i, axis=1)
    acc2 = k_ref[radius] * acc
    for i in range(1, radius + 1):
        acc2 = acc2 + k_ref[radius - i] * jnp.roll(acc, i, axis=0)
        acc2 = acc2 + k_ref[radius + i] * jnp.roll(acc, -i, axis=0)
    out_ref[0] = acc2


def gaussian_blur_pallas(img, sigma=2.0, radius: Optional[int] = None,
                         interpret=False):
    """Separable gaussian on (H, W) or (H, W, C).

    One grid step per channel holds the whole padded image in VMEM, so the
    separable intermediate costs zero HBM traffic (XLA's version round-trips
    between the passes).  Image + halo must fit VMEM (~1k x 1k f32)."""
    radius = radius if radius is not None else max(1, int(3 * sigma))
    xk = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (xk / sigma) ** 2)
    kern = kern / jnp.sum(kern)

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    # Edge-halo so jnp.roll wraparound only touches padding, plus tile-align.
    xp = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)),
                 mode="edge")
    xp, _, _ = _pad_hw(xp, 8, 128)
    xp = jnp.moveaxis(xp, -1, 0)                        # (C, Hp, Wp)
    cp, hp, wp = xp.shape

    out = pl.pallas_call(
        functools.partial(_blur_kernel, radius=radius),
        out_shape=jax.ShapeDtypeStruct((cp, hp, wp), jnp.float32),
        grid=(cp,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda ci: (ci, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, kern)
    out = jnp.moveaxis(out, 0, -1)[radius:radius + h, radius:radius + w]
    return out[..., 0] if squeeze else out


def gaussian_blur_reference(img, sigma=2.0, radius: Optional[int] = None):
    from ..render.post import _sep_conv, gaussian_kernel

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = _sep_conv(img, gaussian_kernel(sigma, radius))
    return out[..., 0] if squeeze else out
