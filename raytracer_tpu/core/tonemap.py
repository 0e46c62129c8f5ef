"""HDR -> LDR tonemapping and u32 pixel packing.

Capability parity with the reference tonemap module (reference:
raytracer_lib/src/raytracer/tonemap.rs): the active per-channel Reinhard
`simple_map` (tonemap.rs:4-10) plus the unused-but-present
`luminance_simple_map`, `gamma_map`, and sRGB<->XYZ conversions
(tonemap.rs:13-51), and the 0xAARRGGBB packing from
scene/color.rs:89-95.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB <-> XYZ matrices (tonemap.rs:37-51); row-vector convention.
# numpy (not jnp) so importing this module never initializes the XLA
# backend — jax.distributed.initialize must be callable after import.
_RGB_TO_XYZ = np.array([
    [0.4124564, 0.2126729, 0.0193339],
    [0.3575761, 0.7151522, 0.119192],
    [0.1804375, 0.0721750, 0.9503041],
], dtype=np.float32)
_XYZ_TO_RGB = np.array([
    [3.2404542, -0.969266, 0.0556434],
    [-1.5371385, 1.8760108, -0.2040259],
    [-0.4985314, 0.0415560, 1.0572252],
], dtype=np.float32)


def simple_map(color):
    """Per-channel Reinhard x/(1+x) (tonemap.rs:4-10). color: (..., 3)."""
    return color / (1.0 + color)


def to_xyz(color):
    return color @ _RGB_TO_XYZ


def to_rgb(xyz):
    return xyz @ _XYZ_TO_RGB


def luminance_simple_map(color):
    """tonemap.rs:13-20 — Reinhard on the Y channel only."""
    xyz = to_xyz(color)
    y = xyz[..., 1:2]
    xyz = jnp.concatenate([xyz[..., :1], y / (1.0 + y), xyz[..., 2:]], axis=-1)
    return to_rgb(xyz)


def gamma_map(color, a: float = 0.5, gamma: float = 0.5):
    """tonemap.rs:23-33 — gamma compression of the Y channel."""
    xyz = to_xyz(color)
    y = a * jnp.power(jnp.maximum(xyz[..., 1:2], 0.0), gamma)
    xyz = jnp.concatenate([xyz[..., :1], y, xyz[..., 2:]], axis=-1)
    return to_rgb(xyz)


def pack_u32(rgb, alpha: float = 1.0):
    """RGBA -> packed 0xAARRGGBB u32 (scene/color.rs:85-95).

    Rust's clamp chain `x.min(1.0).max(0.0)` maps NaN to 1.0 (f32::min
    returns the non-NaN operand), so NaN pixels (unsampled film) pack as
    white; reproduce that.
    """
    x = jnp.where(jnp.isnan(rgb), 1.0, jnp.clip(rgb, 0.0, 1.0))
    b = (x[..., 2] * 255.0).astype(jnp.uint32)
    g = (x[..., 1] * 255.0).astype(jnp.uint32)
    r = (x[..., 0] * 255.0).astype(jnp.uint32)
    a = jnp.uint32(min(max(alpha, 0.0), 1.0) * 255.0)
    return b | (g << 8) | (r << 16) | (a << 24)
