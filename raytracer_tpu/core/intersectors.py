"""Pluggable acceleration structures for the wavefront pipeline.

The reference makes the tracer generic over an `Intersector` trait with
an octree and a brute-force implementation (reference:
raytracer_lib/src/raytracer/accel_intersect.rs:10-13,
oct_tree_intersector.rs, no_acceleration_intersector.rs).  Here an
intersector is an object exposing

    closest(scene, origins, dirs) -> hit dict
    shadow(scene, origins, dirs)  -> blocked (R,) bool

- `BruteForceIntersector`: pure-jnp linear scan over all triangles — the
  correctness oracle (no_acceleration_intersector.rs:7-42).
- `ClusterIntersector`: the production TPU path — Morton-ordered triangle
  clusters with AABB culling inside a Pallas kernel (ops.pallas_intersect)
  — the TPU-native replacement for the CPU octree.
"""

from __future__ import annotations


class BruteForceIntersector:
    """Linear scan over all triangles (the reference's
    NoAccelerationIntersector oracle)."""

    name = "brute"

    def __init__(self, chunk: int = 512):
        self.chunk = chunk

    def closest(self, scene, origins, dirs, alive=None):
        from raytracer_tpu.core.intersect import closest_hit
        # `alive` is a block-skipping hint; the dense scan ignores it
        # (and stays cleanly differentiable).
        return closest_hit(origins, dirs, scene.tri_verts, chunk=self.chunk)

    def shadow(self, scene, origins, dirs, alive=None):
        from raytracer_tpu.core.intersect import any_hit_window
        return any_hit_window(origins, dirs, scene.tri_verts, chunk=self.chunk)

    # intersectors are baked into jitted closures; identity-based hashing
    # is fine because engines build them once.


def make_intersector(kind: str, scene_buffers=None, triangles_per_leaf: int = 70):
    if kind == "brute":
        return BruteForceIntersector()
    if kind == "cluster":
        from raytracer_tpu.ops.pallas_intersect import ClusterIntersector
        return ClusterIntersector(scene_buffers, triangles_per_leaf=triangles_per_leaf)
    raise ValueError(f"unknown intersector kind: {kind!r}")
