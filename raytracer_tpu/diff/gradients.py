"""Differentiable rendering: pixels -> scene-parameter gradients.

New capability beyond the reference (which is forward-only; see
BASELINE.json north star).  The whole jnp wavefront pipeline is
differentiable as written:

- Continuous paths: radiance is analytic in vertex positions (through
  Möller–Trumbore t/u/v and geometric normals), material albedo, light
  position/color, texel values, and camera pose — gradients flow
  through `trace_radiance` end to end.
- Discrete decisions are detached, as planned in SURVEY §7: closest-hit
  *selection* (integer argmin), shadow binarity, hemisphere-sample
  flips, and texel snapping are piecewise-constant, so autodiff treats
  them as constants — correct almost everywhere; visibility
  discontinuities carry no gradient by design.

Gradient correctness is verified against central finite differences in
tests/test_diff.py on configurations away from visibility edges
(the comparison protocol from BASELINE.json configs #3/#5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracer_tpu.core.wavefront import trace_radiance
from raytracer_tpu.models.camera import generate_rays


def render_pixels(scene, cam, px, py, key, width, height, intersector,
                  recursions: int = 0, spread: int = 1, jitter=None):
    """Differentiable pixel radiance.  With jitter=None uses the frame
    key; pass a fixed (R, 2) jitter for deterministic comparisons."""
    kj, kt = jax.random.split(key)
    if jitter is None:
        jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
    origins, dirs = generate_rays(cam, px, py, jitter, width, height)
    return trace_radiance(scene, origins, dirs, kt, intersector,
                          recursions, spread)


def pixel_loss(scene, cam, px, py, key, width, height, intersector, target,
               recursions: int = 0, spread: int = 1, jitter=None):
    """Mean-squared pixel loss against a target image batch."""
    rad = render_pixels(scene, cam, px, py, key, width, height, intersector,
                        recursions, spread, jitter)
    return jnp.mean((rad - target) ** 2)


def scene_grads(scene, cam, px, py, key, width, height, intersector, target,
                recursions: int = 0, spread: int = 1, jitter=None):
    """Gradient of the pixel loss with respect to every scene leaf
    (tri_verts, materials, lights, texels) and the camera params."""
    fn = partial(pixel_loss, px=px, py=py, key=key, width=width, height=height,
                 intersector=intersector, target=target, recursions=recursions,
                 spread=spread, jitter=jitter)
    # allow_int: integer scene leaves (tri_geom, tex ids) get float0 grads
    return jax.grad(lambda s, c: fn(s, c), argnums=(0, 1),
                    allow_int=True)(scene, cam)
