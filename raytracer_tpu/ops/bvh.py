"""Host-side two-level BVH builder (median-split) for the TPU kernel.

The TPU-native successor of the reference octree build
(reference: raytracer_lib/src/raytracer/accel_intersect/
oct_tree_intersector.rs:66-146).  Differences, both deliberate:

- The reference splits space (octants) and duplicates straddling
  triangles into multiple leaves, then needs the hit-in-cube rejection
  quirk (oct_tree_intersector.rs:160-169).  We split the *triangle set*
  (median split on the longest centroid axis), so every triangle lives
  in exactly one leaf and results match brute force exactly.
- The output is flat SoA, not pointers: leaves are fixed-capacity rows
  of a (num_leaves, C) triangle-plane matrix, padded with degenerate
  triangles that can never pass the |det| >= eps test; G consecutive
  leaves (DFS order, so spatially coherent) form one "supercluster"
  whose AABB is the union of its leaves.  The kernel culls at both
  levels: supercluster AABBs against whole ray blocks first, then the
  8 leaf AABBs of each surviving supercluster.

`triangles_per_leaf` is the reference's tunable leaf size
(lib.rs:15-27, main.rs:36-41), rounded up to the TPU lane width.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

F = np.float32


@dataclass
class BVH2:
    """Two-level flat BVH (host arrays).

    num_superclusters K1, group G leaves each, leaf capacity C.
      perm       (K1*G*C,) int32 — packed slot -> original triangle
                                   index (padding slots = -1)
      v0,e1,e2   (K1*G, C, 3)    — triangle origin + edges, packed;
                                   padding rows all-zero (degenerate)
      leaf_aabb  (K1*G, 8) f32   — per-leaf [min xyz, max xyz, 0, 0];
                                   empty leaves get an inverted box
                                   (+BIG/-BIG) that fails every slab test
      sc_aabb    (K1, 8) f32     — per-supercluster union box
      orders     (6, K1) int32   — supercluster visit order by centroid
                                   along +x,-x,+y,-y,+z,-z (approximate
                                   front-to-back, the TPU analogue of the
                                   octree's ordered descent,
                                   oct_tree_intersector.rs:176-185)
    """
    leaf_size: int
    group: int
    num_superclusters: int
    num_leaves: int
    num_triangles: int
    perm: np.ndarray
    v0: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    leaf_aabb: np.ndarray
    sc_aabb: np.ndarray
    orders: np.ndarray


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _median_split_leaves(centroids: np.ndarray, leaf_size: int) -> list[np.ndarray]:
    """Recursive median split on the longest centroid axis; returns the
    leaf index lists in DFS order (spatially coherent neighbours)."""
    leaves: list[np.ndarray] = []
    stack = [np.arange(len(centroids), dtype=np.int64)]
    out_stack: list[np.ndarray] = []
    # iterative DFS to dodge Python recursion limits on big scenes
    while stack:
        idx = stack.pop()
        if len(idx) <= leaf_size:
            out_stack.append(idx)
            continue
        c = centroids[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(c[:, axis], half)
        # push right first so left pops first -> DFS order
        stack.append(idx[part[half:]])
        stack.append(idx[part[:half]])
    leaves = out_stack
    return leaves


def build_bvh2(tri_verts: np.ndarray, triangles_per_leaf: int = 128,
               group: int = 8, lane: int = 128) -> BVH2:
    """tri_verts: (N, 3, 3) float32 world-space triangles."""
    tri_verts = np.asarray(tri_verts, dtype=F)
    N = len(tri_verts)
    C = max(lane, _round_up(max(triangles_per_leaf, 1), lane))
    G = group
    BIG = F(1e30)

    if N == 0:
        K1, NL = 1, G
        leaf_aabb = np.zeros((NL, 8), F)
        leaf_aabb[:, 0:3] = BIG
        leaf_aabb[:, 3:6] = -BIG
        return BVH2(
            leaf_size=C, group=G, num_superclusters=K1, num_leaves=NL,
            num_triangles=0, perm=np.full((NL * C,), -1, np.int32),
            v0=np.zeros((NL, C, 3), F), e1=np.zeros((NL, C, 3), F),
            e2=np.zeros((NL, C, 3), F), leaf_aabb=leaf_aabb,
            sc_aabb=np.zeros((K1, 8), F), orders=np.zeros((6, K1), np.int32))

    centroids = tri_verts.mean(axis=1)
    leaves = _median_split_leaves(centroids, C)
    n_leaves = len(leaves)
    NL = _round_up(n_leaves, G)
    K1 = NL // G

    perm = np.full((NL * C,), -1, np.int32)
    v0 = np.zeros((NL, C, 3), F)
    e1 = np.zeros((NL, C, 3), F)
    e2 = np.zeros((NL, C, 3), F)
    leaf_aabb = np.zeros((NL, 8), F)
    leaf_aabb[:, 0:3] = BIG          # empty leaves: inverted box
    leaf_aabb[:, 3:6] = -BIG

    for li, idx in enumerate(leaves):
        n = len(idx)
        tv = tri_verts[idx]                       # (n, 3, 3)
        perm[li * C: li * C + n] = idx
        v0[li, :n] = tv[:, 0]
        e1[li, :n] = tv[:, 1] - tv[:, 0]
        e2[li, :n] = tv[:, 2] - tv[:, 0]
        leaf_aabb[li, 0:3] = tv.min(axis=(0, 1))
        leaf_aabb[li, 3:6] = tv.max(axis=(0, 1))

    sc_aabb = np.zeros((K1, 8), F)
    lmin = leaf_aabb[:, 0:3].reshape(K1, G, 3)
    lmax = leaf_aabb[:, 3:6].reshape(K1, G, 3)
    nonempty = (lmin <= lmax).all(axis=2)         # (K1, G)
    any_ne = nonempty.any(axis=1)
    sc_aabb[:, 0:3] = np.where(nonempty[:, :, None], lmin, BIG).min(axis=1)
    sc_aabb[:, 3:6] = np.where(nonempty[:, :, None], lmax, -BIG).max(axis=1)
    sc_aabb[~any_ne, 0:3] = BIG
    sc_aabb[~any_ne, 3:6] = -BIG

    centers = 0.5 * (sc_aabb[:, 0:3] + sc_aabb[:, 3:6])
    orders = np.zeros((6, K1), np.int32)
    for axis in range(3):
        fwd = np.argsort(centers[:, axis], kind="stable").astype(np.int32)
        orders[2 * axis] = fwd
        orders[2 * axis + 1] = fwd[::-1]

    return BVH2(
        leaf_size=C, group=G, num_superclusters=K1, num_leaves=NL,
        num_triangles=N, perm=perm, v0=v0, e1=e1, e2=e2,
        leaf_aabb=leaf_aabb, sc_aabb=sc_aabb, orders=orders)
