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
shadow queries), so the machine always runs wide, uniform kernels.

Ray ordering (the TPU analogue of GPU ray-sorting): bounce rays are
globally sorted by (parent hit leaf, direction octant) before
traversal, and — unlike round 1 — the level then STAYS in sorted order
through shading, so its shadow rays (which originate at the sorted hit
points) inherit the coherence for free.  Only the per-level radiance is
folded back to pixel order, one (N, 3) gather per level instead of
un-permuting five hit fields + re-partitioning for shadows.  Dead rays
(missed parents) sort to the global tail, so trailing kernel blocks are
fully dead and skipped outright by the intersector.

Sampling happens in parent order BEFORE sorting, so results are
invariant to the sort (same rays, same RNG stream, same per-pixel sums).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.sampler import sample_hemisphere
from raytracer_tpu.core.shade import (finish_shade, prepare_shade,
                                      prepare_shade_fast)

# Compile-time knobs of the reference render loop (mod.rs:81-82).
RECURSIONS = 2
SUB_SPREAD = 1

# Hit-point offset along the new direction (mod.rs:193).
HIT_OFFSET = 1e-5

# Shadow occluder window (mod.rs:227): 0.01 < t < 1.0 along the
# unnormalized to-light direction.
SHADOW_T_MIN = 0.01
SHADOW_T_MAX = 1.0


def _shadow(isect, scene, ctx, shadow_alive):
    """Occlusion for a level's shadow batch (windowed closest,
    mod.rs:224-230)."""
    if hasattr(isect, "shadow"):
        return isect.shadow(scene, ctx["shadow_origins"],
                            ctx["shadow_dirs"], alive=shadow_alive,
                            t_min=SHADOW_T_MIN, t_max=SHADOW_T_MAX)
    res = isect.query(scene, ctx["shadow_origins"], ctx["shadow_dirs"],
                      alive=shadow_alive, t_limit=SHADOW_T_MAX)
    return res["hit"] & (res["t"] > SHADOW_T_MIN) & (res["t"] < SHADOW_T_MAX)


def _sort_key(isect, hit, dirs, alive, fan):
    """Spatial sort key for bounce rays: (parent hit leaf, direction
    octant); dead rays key to the tail.  `slot` is the intersector's
    packed triangle slot (leaf-major), so slot / leaf-capacity
    identifies the parent's leaf — spatially tight by construction."""
    slot = hit.get("slot", hit["tri"])
    cap = getattr(isect, "leaf_capacity", 128)
    leaf = jnp.repeat(slot, fan, axis=0) // cap
    octant = ((dirs[:, 0] >= 0).astype(jnp.int32)
              + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
              + 4 * (dirs[:, 2] >= 0).astype(jnp.int32))
    key = leaf * 8 + octant
    return jnp.where(alive, key, jnp.int32(2 ** 30))


def trace_radiance(scene, origins, dirs, key, isect,
                   recursions: int = RECURSIONS, spread: int = SUB_SPREAD,
                   sort_rays: bool = True, shade_records=None,
                   has_textures: bool = True):
    """Radiance for R primary rays, bounce tree unrolled.

    isect: pluggable acceleration structure exposing
    query(scene, o, d, alive, t_limit) -> hit dict (the reference's
    Intersector generic, accel_intersect.rs:10-13) and optionally
    shadow(...) -> blocked.

    shade_records: optional packed (S, 8) slot-record table
    (shade.build_slot_records) enabling the forward-only fast shading
    path — one gather per level instead of five.  Training paths leave
    it None so gradients flow through the live scene arrays.

    Returns (R, 3) radiance; rays that miss everything return black
    (mod.rs:99-110).
    """
    def _prepare(o, d, h):
        if shade_records is not None:
            return prepare_shade_fast(scene, o, d, h, shade_records,
                                      has_textures)
        return prepare_shade(scene, o, d, h)

    R = origins.shape[0]
    radiance = jnp.zeros((R, 3), dtype=jnp.float32)
    cur_o, cur_d = origins, dirs
    parent_alive = jnp.ones((R,), dtype=bool)
    weight = 1.0
    fan = 1
    # composed permutation: sorted position -> original child position
    # (identity at level 0, where rays arrive pixel-tile ordered)
    perm_total = None

    hit = isect.query(scene, cur_o, cur_d, alive=parent_alive)

    for level in range(recursions + 1):
        ctx = _prepare(cur_o, cur_d, hit)
        shadow_alive = (ctx["shadow_alive"]
                        & jnp.tile(parent_alive, ctx["num_lights"]))
        alive = parent_alive & hit["hit"]

        blocked = _shadow(isect, scene, ctx, shadow_alive)
        rad = finish_shade(scene, ctx, blocked)
        rad = jnp.where(parent_alive[:, None], rad, 0.0)

        # fold back to pixel order (one gather; levels >= 1 are in
        # sorted order)
        if perm_total is not None:
            inv = jnp.argsort(perm_total)
            rad = rad[inv]
        radiance = radiance + weight * rad.reshape(R, fan, 3).sum(axis=1)

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

            if sort_rays:
                skey = _sort_key(isect, hit, child_d, child_alive, b)
                perm = jnp.argsort(skey)
                child_o, child_d = child_o[perm], child_d[perm]
                child_alive = child_alive[perm]
                # compose with the parent level's permutation: parents
                # are themselves sorted, so map child positions through
                # the parent ordering first
                if perm_total is None:
                    perm_total = perm
                else:
                    pt_child = (jnp.repeat(perm_total * b, b)
                                + jnp.tile(jnp.arange(b, dtype=perm_total.dtype),
                                           perm_total.shape[0]))
                    perm_total = pt_child[perm]

            hit = isect.query(scene, child_o, child_d, alive=child_alive)
            cur_o, cur_d, parent_alive = child_o, child_d, child_alive
            weight = weight / b                          # mean over children
            fan = fan * b

    return radiance
