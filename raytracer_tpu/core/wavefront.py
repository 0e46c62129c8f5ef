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

Shadow queries use a static t-limit at the light distance
(mod.rs:224-230's window), which the kernel specializes on at compile
time.  (Folding shadow + next-level rays into one per-ray-limited
launch was tried and measured slower: mixed-purpose batches dilute
block-level culling and the per-ray limit stream costs more than it
saves.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.sampler import sample_hemisphere
from raytracer_tpu.core.shade import finish_shade, prepare_shade

# Compile-time knobs of the reference render loop (mod.rs:81-82).
RECURSIONS = 2
SUB_SPREAD = 1

# Hit-point offset along the new direction (mod.rs:193).
HIT_OFFSET = 1e-5

# Shadow occluder window (mod.rs:227): 0.01 < t < 1.0 along the
# unnormalized to-light direction.
SHADOW_T_MIN = 0.01
SHADOW_T_MAX = 1.0

# Bounce rays are regrouped before traversal: rays within a neighborhood
# of this many lanes are stably sorted by direction octant, so traversal
# blocks see bundles that share both origin locality (inherited from the
# parent pixel tiles) and a direction octant — the wavefront analogue of
# GPU ray-sorting.
SORT_SEGMENT = 1024


def _octant_sort(origins, dirs, alive):
    """Returns (perm, inv_perm) compacting alive rays first (dead rays
    go to the global tail, so trailing kernel blocks are fully dead and
    skipped outright), grouped by (segment, dir octant) within the alive
    prefix for block coherence."""
    R = dirs.shape[0]
    idx = jnp.arange(R, dtype=jnp.int32)
    octant = ((dirs[:, 0] >= 0).astype(jnp.int32)
              + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
              + 4 * (dirs[:, 2] >= 0).astype(jnp.int32))
    nseg = R // SORT_SEGMENT + 1
    key = jnp.where(alive, (idx // SORT_SEGMENT) * 8 + octant, 8 * nseg)
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    return perm, inv


def _partition_alive(alive):
    """Stable partition: alive rays first (keeping their relative order,
    hence their tile coherence), dead rays compacted into trailing —
    skippable — kernel blocks."""
    perm = jnp.argsort((~alive).astype(jnp.int32), stable=True)
    inv = jnp.argsort(perm)
    return perm, inv


def _shadow_query(isect, scene, ctx, shadow_alive):
    """Shadow occlusion with dead lanes compacted to the tail (missed or
    culled parents leave large dead stretches; compaction turns them
    into fully-dead blocks the intersector skips)."""
    perm, inv = _partition_alive(shadow_alive)
    res = isect.query(scene, ctx["shadow_origins"][perm],
                      ctx["shadow_dirs"][perm], alive=shadow_alive[perm],
                      t_limit=SHADOW_T_MAX)
    return {k: v[inv] for k, v in res.items()}


def _window(res, n):
    """Shadow blocked mask from the first n rays of a query result."""
    t = res["t"][:n]
    return res["hit"][:n] & (t > SHADOW_T_MIN) & (t < SHADOW_T_MAX)


def trace_radiance(scene, origins, dirs, key, isect,
                   recursions: int = RECURSIONS, spread: int = SUB_SPREAD):
    """Radiance for R primary rays, bounce tree unrolled.

    isect: pluggable acceleration structure exposing
    query(scene, o, d, alive, limits) -> hit dict (the reference's
    Intersector generic, accel_intersect.rs:10-13).

    Returns (R, 3) radiance; rays that miss everything return black
    (mod.rs:99-110).
    """
    R = origins.shape[0]
    radiance = jnp.zeros((R, 3), dtype=jnp.float32)
    cur_o, cur_d = origins, dirs
    parent_alive = jnp.ones((R,), dtype=bool)
    weight = 1.0
    fan = 1

    hit = isect.query(scene, cur_o, cur_d, alive=parent_alive)

    for level in range(recursions + 1):
        ctx = prepare_shade(scene, cur_o, cur_d, hit)
        n_shadow = ctx["shadow_origins"].shape[0]
        shadow_alive = (ctx["shadow_alive"]
                        & jnp.tile(parent_alive, ctx["num_lights"]))
        alive = parent_alive & hit["hit"]

        if level < recursions:
            b = spread * (recursions - level)  # num_sub_rays, mod.rs:150
            key, sub = jax.random.split(key)
            n_rep = jnp.repeat(ctx["normal"], b, axis=0)
            # hit_point is sanitized in prepare_shade: missed parents
            # spawn from their (finite) parent origin, keeping the
            # masked child intersections NaN-free under autodiff
            hp_rep = jnp.repeat(ctx["hit_point"], b, axis=0)
            child_d = sample_hemisphere(sub, n_rep)
            child_o = hp_rep + HIT_OFFSET * child_d      # mod.rs:192-193
            child_alive = jnp.repeat(alive, b, axis=0)

            # occlusion queries for this level (t-limited at the light)
            res = _shadow_query(isect, scene, ctx, shadow_alive)
            blocked = _window(res, n_shadow)
            # regroup children for block coherence, traverse, un-permute
            # (folding this into the shadow launch measured slower:
            # mixed-purpose batches dilute block-level culling)
            perm, inv = _octant_sort(child_o, child_d, child_alive)
            hit_s = isect.query(scene, child_o[perm], child_d[perm],
                                alive=child_alive[perm])
            hit = {k: v[inv] for k, v in hit_s.items()}
            next_state = (child_o, child_d, child_alive)
        else:
            res = _shadow_query(isect, scene, ctx, shadow_alive)
            blocked = _window(res, n_shadow)
            next_state = None

        rad = finish_shade(scene, ctx, blocked)
        rad = jnp.where(parent_alive[:, None], rad, 0.0)
        radiance = radiance + weight * rad.reshape(R, fan, 3).sum(axis=1)

        if next_state is not None:
            cur_o, cur_d, parent_alive = next_state
            weight = weight / b                          # mean over children
            fan = fan * b

    return radiance
