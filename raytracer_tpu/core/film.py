"""Film: per-pixel accumulation of sum, sum of squares, and sample count.

Capability parity with the reference film (reference:
raytracer_lib/src/raytracer/film.rs): additive sample accumulation
(film.rs:20-24), mean readout (film.rs:43-48), clear on camera motion
(film.rs:37-41), and the estimated-variance hook for adaptive sampling
(film.rs:50-67, same *50 scaling).

TPU-native design: the film is a pytree of three device arrays updated
functionally inside jit (scatter-add for partial-frame updates); no
per-pixel objects.
"""

from __future__ import annotations

import jax.numpy as jnp


class Film:
    def __init__(self, size: int):
        self.size = size
        self.clear()

    def clear(self):
        """film.rs:37-41"""
        self.pixel_sum = jnp.zeros((self.size, 3), jnp.float32)
        self.pixel_sum_sq = jnp.zeros((self.size, 3), jnp.float32)
        self.num_samples = jnp.zeros((self.size,), jnp.float32)

    def add_samples(self, pixel_idx, radiance):
        """Scatter-add a batch of samples (film.rs:20-24, batched).
        pixel_idx: (R,) int32; radiance: (R, 3)."""
        self.pixel_sum = self.pixel_sum.at[pixel_idx].add(radiance)
        self.pixel_sum_sq = self.pixel_sum_sq.at[pixel_idx].add(radiance * radiance)
        self.num_samples = self.num_samples.at[pixel_idx].add(1.0)

    def add_full_frame(self, radiance, n_per_pixel):
        """Dense accumulation when every pixel got n samples (the batched
        fast path — no scatter)."""
        self.pixel_sum = self.pixel_sum + radiance
        self.pixel_sum_sq = self.pixel_sum_sq + radiance * radiance
        self.num_samples = self.num_samples + n_per_pixel

    def get_pixels(self):
        """Mean radiance (film.rs:43-48).  Unsampled pixels are NaN, like
        the reference's 1/0 multiply; the tonemap/pack stage handles them
        the way Rust's min/max chain does (-> white)."""
        return self.pixel_sum * (1.0 / self.num_samples)[:, None]

    def get_estimated_variances(self):
        """film.rs:50-67 (unused by the reference render loop; kept as the
        adaptive-sampling hook, same *50 scaling)."""
        n = self.num_samples
        n_nm1 = n * (n - 1.0)
        n2_nm1 = n * n_nm1
        var = (self.pixel_sum_sq / n_nm1[:, None]
               - self.pixel_sum * self.pixel_sum / n2_nm1[:, None])
        return var * 50.0
