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

    def query(self, scene, origins, dirs, alive=None, t_limit=None):
        """Generic limited closest-hit.  The dense scan ignores `alive`
        and `t_limit` (the limit only culls work; the full closest hit
        is a correct superset) and stays cleanly differentiable."""
        from raytracer_tpu.core.intersect import closest_hit
        return closest_hit(origins, dirs, scene.tri_verts, chunk=self.chunk)

    def closest(self, scene, origins, dirs, alive=None):
        return self.query(scene, origins, dirs)

    def shadow(self, scene, origins, dirs, alive=None, t_min=0.01, t_max=1.0):
        from raytracer_tpu.core.intersect import any_hit_window
        return any_hit_window(origins, dirs, scene.tri_verts,
                              t_min=t_min, t_max=t_max, chunk=self.chunk)

    # intersectors are baked into jitted closures; identity-based hashing
    # is fine because engines build them once.


def make_intersector(kind: str, scene_buffers=None, triangles_per_leaf: int = 70,
                     **opts):
    """`opts` are forwarded to the accel constructor (e.g. the BVH's
    `seg`/`group`/`ray_block`/`exact_order`)."""
    if kind == "brute":
        return BruteForceIntersector(**opts)
    if kind == "cluster":
        from raytracer_tpu.ops.pallas_intersect import ClusterIntersector
        return ClusterIntersector(scene_buffers,
                                  triangles_per_leaf=triangles_per_leaf,
                                  **opts)
    if kind == "bvh":
        from raytracer_tpu.ops.pallas_bvh import BVHIntersector
        return BVHIntersector(scene_buffers,
                              triangles_per_leaf=triangles_per_leaf, **opts)
    raise ValueError(f"unknown intersector kind: {kind!r}")
