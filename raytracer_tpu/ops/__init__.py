"""TPU kernels and acceleration-structure builders.

The reference accelerates intersection with a CPU octree traversed by
pointer-chasing recursion (reference:
raytracer_lib/src/raytracer/accel_intersect/oct_tree_intersector.rs).
On a vector machine that shape is hostile: divergent traversal, dynamic
stacks, per-lane gathers.  The TPU-native equivalent here is a
*cluster grid*: triangles Morton-sorted into fixed-size clusters with
precomputed AABBs, intersected by a Pallas kernel that slab-tests a
whole ray block against each cluster AABB and skips the cluster's
triangle batch when no ray in the block can improve its closest hit —
uniform control flow, block-granular divergence only.
"""
