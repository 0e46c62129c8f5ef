"""The wavefront radiance pipeline: the reference's per-pixel recursion,
unrolled into fixed ray levels over whole batches.

The reference computes radiance recursively per pixel
(reference: raytracer_lib/src/raytracer/mod.rs:132-176): with
RECURSIONS=2, SUB_SPREAD=1 (mod.rs:81-82) each primary hit spawns
`spread * recursions` = 2 indirect rays, each of which spawns 1 more, and
each recursion level averages its children:

    radiance = shade0 + 1/2 * [ (shade1a + shade2a) + (shade1b + shade2b) ]

On TPU that recursion becomes a static unroll over levels with
per-level fan-out and weights:

    level 0:   R rays, weight 1
    level 1: 2*R rays, weight 1/2   (fan-out 2 = spread * recursions)
    level 2: 2*R rays, weight 1/2   (fan-out 1)

Each level is one batched closest-hit + one batched shade (with its
shadow queries), so the machine always runs wide, uniform kernels —
dead rays (missed parents) are masked, not compacted, because the tree
is shallow and fixed (fixed-budget masking; see SURVEY §7 'stream
compaction').  Child radiance folds back to its originating pixel with a
reshape-sum, since fan-out is contiguous repetition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.sampler import sample_hemisphere
from raytracer_tpu.core.shade import geometric_normal, shade

# Compile-time knobs of the reference render loop (mod.rs:81-82).
RECURSIONS = 2
SUB_SPREAD = 1

# Hit-point offset along the new direction (mod.rs:193).
HIT_OFFSET = 1e-5

# Bounce rays are regrouped before traversal: rays within a neighborhood
# of this many lanes are stably sorted by direction octant, so traversal
# blocks see bundles that share both origin locality (inherited from the
# parent pixel tiles) and a direction octant — the wavefront analogue of
# GPU ray-sorting.
SORT_SEGMENT = 1024


def _octant_sort(origins, dirs, alive):
    """Returns (perm, inv_perm) grouping rays by (segment, dir octant),
    dead rays last within each segment."""
    R = dirs.shape[0]
    idx = jnp.arange(R, dtype=jnp.int32)
    octant = ((dirs[:, 0] >= 0).astype(jnp.int32)
              + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
              + 4 * (dirs[:, 2] >= 0).astype(jnp.int32))
    key = (idx // SORT_SEGMENT) * 16 + jnp.where(alive, octant, 15)
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    return perm, inv


def trace_radiance(scene, origins, dirs, key, closest_fn, shadow_fn,
                   recursions: int = RECURSIONS, spread: int = SUB_SPREAD):
    """Radiance for R primary rays, bounce tree unrolled.

    closest_fn(scene, o, d) -> hit dict; shadow_fn(scene, o, d) -> blocked:
    the pluggable acceleration structure (the reference's Intersector
    generic, accel_intersect.rs:10-13).

    Returns (R, 3) radiance; rays that miss everything return black
    (mod.rs:99-110).
    """
    R = origins.shape[0]
    radiance = jnp.zeros((R, 3), dtype=jnp.float32)
    cur_o, cur_d = origins, dirs
    parent_alive = jnp.ones((origins.shape[0],), dtype=bool)
    weight = 1.0
    fan = 1

    for level in range(recursions + 1):
        if level == 0:
            hit = closest_fn(scene, cur_o, cur_d, alive=parent_alive)
        else:
            # regroup bounce rays for block coherence, then un-permute
            perm, inv = _octant_sort(cur_o, cur_d, parent_alive)
            hit_s = closest_fn(scene, cur_o[perm], cur_d[perm],
                               alive=parent_alive[perm])
            hit = {k: v[inv] for k, v in hit_s.items()}
        pa = parent_alive
        rad = shade(scene, cur_o, cur_d, hit,
                    lambda o, d, alive, _pa=pa: shadow_fn(scene, o, d,
                                                          alive=alive & _pa))
        alive = parent_alive & hit["hit"]
        rad = jnp.where(alive[:, None], rad, 0.0)
        radiance = radiance + weight * rad.reshape(R, fan, 3).sum(axis=1)

        if level == recursions:
            break
        b = spread * (recursions - level)  # num_sub_rays, mod.rs:150
        normal = geometric_normal(scene.tri_verts, hit["tri"])
        # missed parents: t sentinel (BIG_T) would launch children from
        # ~1e38 origins -> inf/NaN in their (masked) intersections and
        # NaN gradients; spawn them from the parent origin instead
        t_safe = jnp.where(alive, hit["t"], 0.0)
        hit_point = cur_o + t_safe[:, None] * cur_d
        key, sub = jax.random.split(key)
        n_rep = jnp.repeat(normal, b, axis=0)
        hp_rep = jnp.repeat(hit_point, b, axis=0)
        new_d = sample_hemisphere(sub, n_rep)
        cur_o = hp_rep + HIT_OFFSET * new_d          # mod.rs:192-193
        cur_d = new_d
        parent_alive = jnp.repeat(alive, b, axis=0)
        weight = weight / b                          # mean over children
        fan = fan * b

    return radiance
