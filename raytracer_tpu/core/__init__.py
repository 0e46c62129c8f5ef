"""Core render pipeline: intersection, shading, film, tonemap, wavefront.

TPU-native replacement for the reference tracer core
(reference: raytracer_lib/src/raytracer/).  The per-pixel recursive CPU
loop (raytracer/mod.rs:80-176) becomes a batched wavefront: ray-gen /
intersect / shade stages over whole ray batches, with the bounce
recursion unrolled into fixed levels with per-level weights.
"""

from raytracer_tpu.core.engine import RayTracer, DEFAULT_TRIANGLES_PER_LEAF

__all__ = ["RayTracer", "DEFAULT_TRIANGLES_PER_LEAF"]
