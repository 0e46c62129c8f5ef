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

from raytracer_tpu.core.sampler import hemisphere_from_gaussian
from raytracer_tpu.core.shade import (finish_shade, prepare_shade,
                                      prepare_shade_fast,
                                      prepare_shade_fused)

# Compile-time knobs of the reference render loop (mod.rs:81-82).
RECURSIONS = 2
SUB_SPREAD = 1

# Hit-point offset along the new direction (mod.rs:193).
HIT_OFFSET = 1e-5

# Shadow occluder window (mod.rs:227): 0.01 < t < 1.0 along the
# unnormalized to-light direction.
SHADOW_T_MIN = 0.01
SHADOW_T_MAX = 1.0

# |origin| above this marks a dead-lane sentinel ray (matches
# ops.pallas_intersect._ALIVE_LIMIT without importing the Pallas module
# into the backend-agnostic wavefront).
_ALIVE_SORT_LIMIT = 1.0e30


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


def _expand3(x):
    """Spread 7 bits to every 3rd position (Morton interleave)."""
    x = (x | (x << 8)) & 0x0100F00F
    x = (x | (x << 4)) & 0x010C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _sort_key(isect, origins, dirs, alive, mode="dir6"):
    """Spatial sort key for bounce rays: direction bins (major) then a
    Morton code of the spawn origin (minor); dead rays key past
    everything.  Blocks then share one direction bin and a tight origin
    cell — exactly what the kernel's per-block front-to-back walk and
    AABB culling want.

    mode (measured e2e Mrays/s on thai2 1024^2, round 2 unless noted):
      "dir6"     1.55 — 64 direction bins major, 15-bit Morton minor
      "dir9"     512 direction bins major (3 bits/axis), full 21-bit
                 Morton minor — for POOLED wavefronts, whose denser key
                 population can fill finer bins (round 5)
      "dirmajor" 1.42 — 8 octants major, 21-bit Morton minor
      "posmajor" 0.97 — Morton major, octant minor
    A parent-row-major key ("leafdir") was measured in round 4 and
    DELETED in round 5: L1 closest 168.6 vs dir6's 149.9 ms
    (scripts/sweep_sortkey.py; direction agreement beats origin
    tightness for the front-to-back walk's early exit).
    """
    lo, inv_span = isect.world_lo, isect.world_inv_span
    q = jnp.clip((origins - lo) * inv_span * 128.0, 0.0, 127.0)
    q = q.astype(jnp.int32)
    morton = ((_expand3(q[:, 0]) << 2) | (_expand3(q[:, 1]) << 1)
              | _expand3(q[:, 2]))
    octant = ((dirs[:, 0] >= 0).astype(jnp.int32)
              + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
              + 4 * (dirs[:, 2] >= 0).astype(jnp.int32))
    if mode == "posmajor":
        key = (morton << 3) | octant
    elif mode == "dirmajor":
        key = (octant << 21) | morton
    elif mode == "dir6":
        # finer direction bins: 2 bits/axis of the inf-norm-scaled
        # direction -> 64 bins (major), then a 15-bit origin Morton
        mag = jnp.max(jnp.abs(dirs), axis=1, keepdims=True)
        qd = jnp.clip(((dirs / jnp.maximum(mag, 1e-30)) + 1.0) * 2.0,
                      0.0, 3.0).astype(jnp.int32)        # (R, 3) in 0..3
        dirbin = (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
        key = (dirbin << 15) | (morton >> 6)
    elif mode == "dir9":
        # 3 bits/axis -> 512 direction bins, full 21-bit Morton minor
        # (30-bit key); for pooled populations dense enough to fill them
        mag = jnp.max(jnp.abs(dirs), axis=1, keepdims=True)
        qd = jnp.clip(((dirs / jnp.maximum(mag, 1e-30)) + 1.0) * 4.0,
                      0.0, 7.0).astype(jnp.int32)        # (R, 3) in 0..7
        dirbin = (qd[:, 0] << 6) | (qd[:, 1] << 3) | qd[:, 2]
        key = (dirbin << 21) | morton
    else:
        raise ValueError(f"unknown sort_key_mode {mode!r}")
    return jnp.where(alive, key, jnp.int32(2 ** 30))


def _sort_rays(skey, o, d, alive, orig, extra):
    """Sort rays by key, payloads riding the sort network (multi-operand
    lax.sort) — measured ~4x cheaper than argsort + row gathers on TPU.
    `extra`: list of additional (R,) payload columns (e.g. the next
    level's canonical Gaussian draws).  Returns (o, d, alive, orig,
    extra) sorted."""
    cols = jax.lax.sort(
        (skey, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         alive.astype(jnp.int32), orig, *extra), num_keys=1)
    (_, o0, o1, o2, d0, d1, d2, a, og), extra_s = cols[:9], cols[9:]
    return (jnp.stack([o0, o1, o2], axis=1),
            jnp.stack([d0, d1, d2], axis=1), a.astype(bool), og,
            list(extra_s))


def _unsort_radiance(rad, orig):
    """Fold sorted per-ray radiance back to original order: sort by the
    original index (a permutation), radiance riding as payload."""
    _, r0, r1, r2 = jax.lax.sort(
        (orig, rad[:, 0], rad[:, 1], rad[:, 2]), num_keys=1)
    return jnp.stack([r0, r1, r2], axis=1)


def trace_radiance(scene, origins, dirs, key, isect,
                   recursions: int = RECURSIONS, spread: int = SUB_SPREAD,
                   sort_rays: bool = True, shade_records=None,
                   has_textures: bool = True, fused_shade: bool = False,
                   sort_key_mode: str = "dir6"):
    """Radiance for R primary rays, bounce tree unrolled.

    isect: pluggable acceleration structure exposing
    query(scene, o, d, alive, t_limit) -> hit dict (the reference's
    Intersector generic, accel_intersect.rs:10-13) and optionally
    shadow(...) -> blocked.

    shade_records: optional packed (S, 8) slot-record table
    (shade.build_slot_records) enabling the forward-only fast shading
    path — one gather per level instead of five.  Training paths leave
    it None so gradients flow through the live scene arrays.

    fused_shade: the intersector extracts the winning record IN-KERNEL
    (BVHIntersector.set_shade_records); closest-hit queries pass
    emit_shade=True and shading uses hit["rec"] with no gather at all.

    Returns (R, 3) radiance; rays that miss everything return black
    (mod.rs:99-110).
    """
    def _closest(o, d, alive):
        if fused_shade:
            return isect.query(scene, o, d, alive=alive, emit_shade=True)
        return isect.query(scene, o, d, alive=alive)

    def _prepare(o, d, h):
        if fused_shade:
            return prepare_shade_fused(scene, o, d, h, has_textures)
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
    do_sort = sort_rays and hasattr(isect, "world_lo")

    # Per-level RNG, presplit so each level's Gaussians can be drawn in
    # CANONICAL (pixel) order regardless of ray sorting: level l+1's
    # draws are generated before level l's sort and carried through it
    # as payload columns, so every ray keeps the same random numbers it
    # would get unsorted (brute-force and accel paths stay bit-equal).
    subs = jax.random.split(key, recursions) if recursions > 0 else None
    pending_g = None  # (n_parents, 3*b) canonical Gaussians, parent order

    hit = _closest(cur_o, cur_d, parent_alive)

    for level in range(recursions + 1):
        ctx = _prepare(cur_o, cur_d, hit)
        shadow_alive = (ctx["shadow_alive"]
                        & jnp.tile(parent_alive, ctx["num_lights"]))
        alive = parent_alive & hit["hit"]

        blocked = _shadow(isect, scene, ctx, shadow_alive)
        rad = finish_shade(scene, ctx, blocked)
        rad = jnp.where(parent_alive[:, None], rad, 0.0)

        # fold back to pixel order (levels >= 1 are in sorted order)
        if perm_total is not None:
            rad = _unsort_radiance(rad, perm_total)
        radiance = radiance + weight * rad.reshape(R, fan, 3).sum(axis=1)

        if level < recursions:
            b = spread * (recursions - level)  # num_sub_rays, mod.rs:150
            n_parents = cur_o.shape[0]
            n_rep = jnp.repeat(ctx["normal"], b, axis=0)
            # hit_point is sanitized in prepare_shade: missed parents
            # spawn from their (finite) parent origin, keeping the
            # masked child intersections NaN-free under autodiff
            hp_rep = jnp.repeat(ctx["hit_point"], b, axis=0)
            if pending_g is None:
                # parents are in canonical order (level 0)
                g = jax.random.normal(subs[level], (n_parents * b, 3),
                                      dtype=jnp.float32)
            else:
                # canonical draws, permuted alongside their parents
                g = pending_g.reshape(n_parents * b, 3)
            child_d = hemisphere_from_gaussian(g, n_rep)
            child_o = hp_rep + HIT_OFFSET * child_d      # mod.rs:192-193
            child_alive = jnp.repeat(alive, b, axis=0)

            if do_sort:
                skey = _sort_key(isect, child_o, child_d, child_alive,
                                 mode=sort_key_mode)
                # original (pixel-order) index of each child: parents are
                # themselves sorted, so map through the parent ordering
                if perm_total is None:
                    orig = jnp.arange(child_o.shape[0], dtype=jnp.int32)
                else:
                    orig = (jnp.repeat(perm_total * b, b)
                            + jnp.tile(jnp.arange(b, dtype=perm_total.dtype),
                                       perm_total.shape[0]))
                # next level's canonical Gaussians ride this sort; each
                # child row carries the draws of its b_next grandchildren
                extra = []
                if level + 1 < recursions:
                    b_next = spread * (recursions - level - 1)
                    g_next = jax.random.normal(
                        subs[level + 1], (child_o.shape[0] * b_next, 3),
                        dtype=jnp.float32)
                    # canonical grandchild order == canonical child order
                    # expanded by b_next; but children here are still in
                    # pre-sort (parent) order, which is canonical only at
                    # level 0 — map through `orig` otherwise
                    gcols = g_next.reshape(child_o.shape[0], 3 * b_next)
                    if perm_total is not None:
                        gcols = gcols[orig]
                    extra = [gcols[:, c] for c in range(3 * b_next)]
                child_o, child_d, child_alive, perm_total, extra = _sort_rays(
                    skey, child_o, child_d, child_alive, orig, extra)
                pending_g = (jnp.stack(extra, axis=1) if extra else None)
            elif level + 1 < recursions:
                b_next = spread * (recursions - level - 1)
                pending_g = jax.random.normal(
                    subs[level + 1], (child_o.shape[0] * b_next, 3),
                    dtype=jnp.float32).reshape(child_o.shape[0], 3 * b_next)
            else:
                pending_g = None

            hit = _closest(child_o, child_d, child_alive)
            cur_o, cur_d, parent_alive = child_o, child_d, child_alive
            weight = weight / b                          # mean over children
            fan = fan * b

    return radiance


def trace_radiance_fused(scene, origins, dirs, key, isect,
                         recursions: int = RECURSIONS,
                         spread: int = SUB_SPREAD,
                         sort_key_mode: str = "dir6",
                         pool: int = 1,
                         sort_payload: str = "ride"):
    """Whole-level fused variant of `trace_radiance` for intersectors
    exposing spawn/shadow_shade (BVHIntersector on TPU, texture-free
    scenes): each level is ONE closest+spawn kernel (shadow rays, child
    rays and their sort keys constructed in the Möller–Trumbore
    epilogue) and ONE occlusion+radiance kernel; the XLA glue between
    them reduces to the child sorts, the canonical RNG draws, and the
    per-level radiance unsort — everything else rides (nb, RB) planes
    whose (R,) column reshapes are free.

    Semantics — ray tree, RNG streams, quirks — are IDENTICAL to
    `trace_radiance` with sorting on (verified bit-for-bit in
    tests/test_fused_spawn.py): Gaussians are drawn in canonical pixel
    order with the unpadded shapes the reference path uses, and ride
    the sorts as payload columns.

    sort_payload: "ride" carries every payload column through the sort
    network (multi-operand lax.sort — the round-2 measurement); "gather"
    sorts only (key, position) and gathers the payload columns once by
    the resulting permutation, trading sort-network traffic for one
    gather pass (re-measurement hook for the round-4 verdict's glue
    item — pooled sorts are big enough for the tradeoff to differ).

    pool > 1 renders `pool` spp samples in ONE wavefront: origins/dirs
    are the samples' rays concatenated sample-major and `key` carries
    `pool` stacked PRNG keys (one per sample).  All samples' bounce
    rays enter a single global sort, so every 128-ray block draws from
    a `pool`-times denser key population — far tighter direction+origin
    bins, which directly attacks the L1 128-ray-union coherence penalty
    (round-4 counters: L1 blocks Möller–Trumbore ~10.9 rows vs L0's
    1.84).  Per-sample radiance is BIT-IDENTICAL to pool=1 with that
    sample's key: per-ray kernel results don't depend on block mates
    (gates are conservative), draws stay in canonical per-sample order,
    and the unsort restores canonical order before the per-sample fold.
    """
    R0 = origins.shape[0]
    assert R0 % pool == 0
    RB = isect.ray_block
    pad = (-R0) % (8 * RB)
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.broadcast_to(jnp.float32(1e35), (pad, 3))])
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (pad, 3))])
    R = origins.shape[0]
    nb = R // RB
    L = scene.light_pos.shape[0]
    # per-sample RNG streams: pool == 1 uses `key` directly; pooled mode
    # splits each sample's stacked key exactly as its pool=1 call would
    key_list = [key] if pool == 1 else [key[s] for s in range(pool)]
    subs = ([jax.random.split(k, recursions) for k in key_list]
            if recursions > 0 else None)

    def draw_gauss(level, per_sample):
        """(pool * per_sample, 3) canonical Gaussians, sample-major —
        identical per-sample values to the pool=1 draws."""
        gs = [jax.random.normal(subs[s][level], (per_sample, 3),
                                dtype=jnp.float32) for s in range(pool)]
        return gs[0] if pool == 1 else jnp.concatenate(gs)

    cur_o = [origins[:, k].reshape(nb, RB) for k in range(3)]
    cur_d = [dirs[:, k].reshape(nb, RB) for k in range(3)]
    rad_acc = [jnp.zeros((R,), jnp.float32) for _ in range(3)]
    weight, fan = 1.0, 1
    perm_total = None
    pending_cols = None      # 3*b gaussian columns riding the last sort
    nb_l = nb

    for level in range(recursions + 1):
        n_rays = nb_l * RB
        n_real = R0 * fan               # rays that aren't padding
        b = spread * (recursions - level) if level < recursions else 0

        # canonical Gaussians for this level's children, with the same
        # draw shapes as the unfused path (padding rows are zeros and
        # belong to dead rays)
        if b:
            if pending_cols is None:
                g = draw_gauss(level, (n_real // pool) * b)
                gcols_mat = g.reshape(n_real, 3 * b)
                if n_rays != n_real:
                    gcols_mat = jnp.concatenate(
                        [gcols_mat,
                         jnp.zeros((n_rays - n_real, 3 * b), jnp.float32)])
                gcols = [gcols_mat[:, c] for c in range(3 * b)]
            else:
                gcols = pending_cols
            gauss_planes = [c.reshape(nb_l, RB) for c in gcols]
        else:
            gauss_planes = []

        sres = isect.spawn(cur_o, cur_d, gauss_planes, scene.light_pos,
                           children=b,
                           key_mode=(sort_key_mode
                                     if sort_key_mode in ("dir6", "dir9")
                                     else "none"))

        # Diffuse resolution between spawn and shadow-shade, in XLA:
        # - "mat" records: the kernel extracted [normal, material id]
        #   only; diffuse rgb (and tex id) come from the tiny
        #   per-material tables via an (R,)-row gather — far cheaper
        #   than 2-3 extra masked (RB, C) reductions per MT'd row.
        # - textured scenes: the kernel also emitted barycentric u/v;
        #   the nearest-neighbour texel fetch (the only scattered
        #   lookup) runs here with prepare_shade_fused semantics
        #   (mod.rs:244-247, texture.rs:21-27).
        mat_fmt = getattr(isect, "rec_format", "full") == "mat"
        has_tex = getattr(isect, "fused_has_textures", False)
        if mat_fmt:
            mid = sres["rec"][3].reshape(n_rays).astype(jnp.int32)
            base_rgb = scene.mat_diffuse_rgb[mid]            # (R, 3)
        else:
            base_rgb = None
        if has_tex:
            uu = sres["u"].reshape(n_rays)
            vv = sres["v"].reshape(n_rays)
            if mat_fmt:
                tid = scene.mat_tex_id[mid]
            else:
                tid = sres["rec"][6].reshape(n_rays).astype(jnp.int32)
            safe_tex = jnp.maximum(tid, 0)
            hw = scene.tex_hw[safe_tex]
            th, tw = hw[:, 0], hw[:, 1]
            x = jnp.clip((uu * tw.astype(jnp.float32)).astype(jnp.int32),
                         0, tw - 1)
            y = jnp.clip((vv * th.astype(jnp.float32)).astype(jnp.int32),
                         0, th - 1)
            texel = scene.tex_atlas[safe_tex, y, x]          # (R, 3)
            use_tex = tid >= 0
            if base_rgb is None:
                base_cols = [sres["rec"][3 + k].reshape(n_rays)
                             for k in range(3)]
            else:
                base_cols = [base_rgb[:, k] for k in range(3)]
            c_planes = [jnp.where(use_tex, texel[:, k], base_cols[k]
                                  ).reshape(nb_l, RB) for k in range(3)]
        elif mat_fmt:
            c_planes = [base_rgb[:, k].reshape(nb_l, RB) for k in range(3)]
        else:
            c_planes = sres["rec"][3:6]

        # occlusion + radiance (light-major shadow batch)
        so_pl = [jnp.concatenate([sres["shadow"][li][k] for li in range(L)])
                 if L > 1 else sres["shadow"][0][k] for k in range(3)]
        sd_pl = [jnp.concatenate([sres["shadow"][li][3 + k]
                                  for li in range(L)])
                 if L > 1 else sres["shadow"][0][3 + k] for k in range(3)]
        rr, rg, rb_ = isect.shadow_shade(
            so_pl, sd_pl, sres["rec"][0:3], c_planes, cur_d,
            scene.light_color)
        if L > 1:
            rr = rr.reshape(L, n_rays).sum(axis=0)
            rg = rg.reshape(L, n_rays).sum(axis=0)
            rb_ = rb_.reshape(L, n_rays).sum(axis=0)
        rcols = [rr.reshape(n_rays), rg.reshape(n_rays), rb_.reshape(n_rays)]

        # fold back to pixel order and accumulate
        if perm_total is not None:
            if sort_payload == "gather":
                _, inv = jax.lax.sort(
                    (perm_total, jnp.arange(n_rays, dtype=jnp.int32)),
                    num_keys=1)
                rcols = [c[inv] for c in rcols]
            else:
                _, r0c, r1c, r2c = jax.lax.sort(
                    (perm_total, rcols[0], rcols[1], rcols[2]), num_keys=1)
                rcols = [r0c, r1c, r2c]
        if fan > 1:
            rcols = [c.reshape(R, fan).sum(axis=1) for c in rcols]
        rad_acc = [a + weight * c for a, c in zip(rad_acc, rcols)]

        if b:
            # child columns in canonical (parent-major) interleave
            def inter(cols_j):
                if b == 1:
                    return cols_j[0].reshape(n_rays)
                return jnp.stack([c.reshape(n_rays) for c in cols_j],
                                 axis=1).reshape(-1)

            ch = sres["children"]
            cox = inter([ch[j][0] for j in range(b)])
            coy = inter([ch[j][1] for j in range(b)])
            coz = inter([ch[j][2] for j in range(b)])
            cdx = inter([ch[j][3] for j in range(b)])
            cdy = inter([ch[j][4] for j in range(b)])
            cdz = inter([ch[j][5] for j in range(b)])
            if sort_key_mode in ("dir6", "dir9"):
                skey = inter([ch[j][6] for j in range(b)])
            else:
                alive = jnp.abs(cox) < _ALIVE_SORT_LIMIT
                skey = _sort_key(isect,
                                 jnp.stack([cox, coy, coz], axis=1),
                                 jnp.stack([cdx, cdy, cdz], axis=1),
                                 alive, mode=sort_key_mode)

            if perm_total is None:
                orig = jnp.arange(n_rays * b, dtype=jnp.int32)
            else:
                orig = (jnp.repeat(perm_total * b, b)
                        + jnp.tile(jnp.arange(b, dtype=perm_total.dtype),
                                   perm_total.shape[0]))

            gmat = None
            if level + 1 < recursions:
                b_next = spread * (recursions - level - 1)
                g_next = draw_gauss(level + 1,
                                    (n_real // pool) * b * b_next)
                gmat = g_next.reshape(n_real * b, 3 * b_next)
                if n_rays != n_real:
                    gmat = jnp.concatenate(
                        [gmat, jnp.zeros(((n_rays - n_real) * b, 3 * b_next),
                                         jnp.float32)])

            if sort_payload == "gather":
                # sort only (key, position); gather the ray payloads by
                # the permutation.  lax.sort is stable, so `p` equals
                # the implicit permutation of the ride path — results
                # are bit-identical between modes.
                _, p = jax.lax.sort(
                    (skey, jnp.arange(n_rays * b, dtype=jnp.int32)),
                    num_keys=1)
                cox, coy, coz, cdx, cdy, cdz = (
                    c[p] for c in (cox, coy, coz, cdx, cdy, cdz))
                perm_total = orig[p] if perm_total is not None else p
                if gmat is not None:
                    # canonical draws straight to sorted child order —
                    # ONE gather (the ride path needs gmat[orig] first)
                    gsort = gmat[perm_total]
                    pending_cols = [gsort[:, c]
                                    for c in range(gsort.shape[1])]
                else:
                    pending_cols = None
            else:
                extra = []
                if gmat is not None:
                    if perm_total is not None:
                        # children are in their (sorted) parents' order;
                        # map the canonical draws through.  At level 0
                        # `orig` is the identity — skip the (N, 3b)
                        # gather (XLA does not elide iota-indexed
                        # gathers; ~10 ms/frame)
                        gmat = gmat[orig]
                    extra = [gmat[:, c] for c in range(gmat.shape[1])]

                sorted_cols = jax.lax.sort(
                    (skey, cox, coy, coz, cdx, cdy, cdz, orig, *extra),
                    num_keys=1)
                (_, cox, coy, coz, cdx, cdy, cdz,
                 perm_total) = sorted_cols[:8]
                pending_cols = list(sorted_cols[8:]) or None

            nb_l = nb_l * b
            cur_o = [c.reshape(nb_l, RB) for c in (cox, coy, coz)]
            cur_d = [c.reshape(nb_l, RB) for c in (cdx, cdy, cdz)]
            weight = weight / b
            fan = fan * b

    radiance = jnp.stack(rad_acc, axis=1)
    return radiance[:R0]
