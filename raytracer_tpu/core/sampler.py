"""Random direction sampling for indirect bounces.

The reference precomputes 65,536 rejection-sampled unit vectors and
rejection-loops per bounce until one lies in the normal's hemisphere
(reference: raytracer_lib/src/raytracer/sample_generator.rs:15-52 +
raytracer/mod.rs:178-196).  That distribution is uniform on the
hemisphere.  The TPU-native sampler draws a 3D Gaussian with
jax.random, normalizes (uniform on the sphere), and reflects into the
normal's hemisphere — the same distribution, branch-free, with
counter-based deterministic keys instead of OS-seeded state.

`SampleGenerator` reproduces the reference's table-based API for
host-side oracles and tests (sample_generator.rs:5-52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hemisphere_from_gaussian(g, normals):
    """Deterministic half of hemisphere sampling: normalize a 3D
    Gaussian draw (uniform on the sphere) and reflect into the normal's
    hemisphere.  Separated from the draw so callers can generate the
    Gaussians in canonical ray order and permute them alongside sorted
    rays — results then don't depend on traversal ordering.

    The norm is the explicit component form (x*x + y*y) + z*z — NOT
    jnp.linalg.norm, which differs by 1 ulp — so the in-kernel epilogue
    (pallas_bvh._norm3) reproduces these directions bit-for-bit."""
    norm = jnp.sqrt(g[..., 0:1] * g[..., 0:1] + g[..., 1:2] * g[..., 1:2]
                    + g[..., 2:3] * g[..., 2:3])
    d = g / jnp.where(norm > 0, norm, 1.0)
    dot = jnp.sum(d * normals, axis=-1, keepdims=True)
    return jnp.where(dot < 0, -d, d)


def sample_hemisphere(key, normals):
    """Uniform hemisphere directions around each normal.

    normals: (R, 3).  Returns (R, 3) unit vectors d with dot(d, n) >= 0.
    Matches the reference's rejection loop in distribution
    (mod.rs:186-190).
    """
    g = jax.random.normal(key, normals.shape, dtype=normals.dtype)
    return hemisphere_from_gaussian(g, normals)


class SampleGenerator:
    """Host-side parity port of the reference's precomputed direction
    table (sample_generator.rs).  65,536 unit vectors, sequential and
    rng-indexed lookup."""

    NUM_SAMPLES = 1 << 16
    SAMPLE_MAX = (1 << 16) - 1

    def __init__(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        vecs = np.empty((self.NUM_SAMPLES, 3), dtype=np.float32)
        count = 0
        # rejection-sample inside the unit sphere, then normalize
        # (sample_generator.rs:36-52)
        while count < self.NUM_SAMPLES:
            cand = rng.uniform(-1.0, 1.0, size=(self.NUM_SAMPLES, 3)).astype(np.float32)
            ok = (cand * cand).sum(-1) < 1.0
            good = cand[ok]
            take = min(len(good), self.NUM_SAMPLES - count)
            vecs[count:count + take] = good[:take]
            count += take
        self.normalized_vecs = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
        self.sample_idx = 0

    def normalized_vec_lookup(self):
        """sample_generator.rs:26-29"""
        self.sample_idx = (self.sample_idx + 1) % self.SAMPLE_MAX
        return self.normalized_vecs[self.sample_idx]

    def normalized_vec_pseudo(self, rng: np.random.Generator):
        """sample_generator.rs:31-34"""
        self.sample_idx = int(rng.integers(0, self.NUM_SAMPLES - 1))
        return self.normalized_vecs[self.sample_idx]
