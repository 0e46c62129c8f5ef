"""Packed two-level BVH intersection: Pallas TPU kernel + XLA fallback.

Successor of the flat cluster kernel (ops/pallas_intersect.py) and the
TPU-native replacement of the reference octree traversal (reference:
raytracer_lib/src/raytracer/accel_intersect/oct_tree_intersector.rs:
148-272).  Per RAY_BLOCK-ray block:

1. slab-test every SUPERCLUSTER AABB against all rays at once ->
   per-(supercluster, ray) entry distances; min over the block to SMEM;
2. walk superclusters in front-to-back order — exact per-block (scalar
   insertion sort of the SMEM entries) or approximate (per-block
   dominant direction picks one of six precomputed centroid orders);
3. a scalar gate (supercluster's closest possible entry vs the block's
   worst best-hit and the caller's t-limit) skips most superclusters;
4. surviving superclusters slab-test the G*S SEGMENT AABBs of their G
   triangle rows in one (G*S, RB) vector op.  Each row is gated by the
   min over its S segment entries (= the entry into the row's AABB
   *union*, strictly tighter than one fat row box) via IN-REGISTER
   vector->scalar reductions — no DMA round-trip — and a scalar sorting
   network orders the rows front-to-back so early hits tighten the
   bound for the rest.  Rows that survive run one full-width
   Möller–Trumbore pass over (ray, lane) pairs on the VPU.

Rows are PACKED FULL by the builder (ops/bvh.py): every MT lane is a
real triangle (a naive median-split leaves ~39% of lanes as padding on
thai2), and segments are tight 16-32-triangle chunks, so the gates model
the geometry at fine granularity while MT issues stay full-width (narrow
(SG, C) issues measured ~+35%/ray in round 3's subgroup experiment —
that knob is gone, this design replaces it).

The slab phases guard against zero direction components (the reference
unit-tests axis-parallel rays, oct_tree_intersector.rs:485-492): an
unguarded 1/d with d == 0 and origin exactly on a box plane yields
0 * inf = NaN, which compares false and silently culls.  Directions are
clamped to +-1e-30 minimum magnitude before inversion, which keeps every
slab product finite (sign loss is irrelevant: the entry/exit tests take
min/max over both plane distances).

`mode="shadow"` skips the u/v/triangle-index bookkeeping (occlusion only
needs the windowed min-t, mod.rs:224-230) for a leaner epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.intersect import BIG_T, F32_EPSILON
from raytracer_tpu.ops.bvh import build_bvh2
from raytracer_tpu.ops.pallas_intersect import (
    DEAD_ORIGIN, _ALIVE_LIMIT, xla_cluster_closest)

DEFAULT_RAY_BLOCK = 128

# Minimum direction-component magnitude before inversion (zero-direction
# slab guard; see module docstring).
_DIR_TINY = 1e-30

# Front-to-back row ordering networks (compare-swap index pairs).
# G=8: Batcher odd-even merge (19 comparators); G=4: 5; G=2: 1.
_SORT_NET = {
    8: ((0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)),
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    2: ((0, 1),),
    1: (),
}


def _safe_inv(x):
    """1/x with |x| clamped away from zero so slab products stay finite
    (0 * inf = NaN would compare false -> silent miss)."""
    return 1.0 / jnp.where(jnp.abs(x) < _DIR_TINY, _DIR_TINY, x)


def _traverse(limit, shadow, G, S, exact_order,
              order_ref,
              cols, rows,
              sc_aabb_ref, seg_aabb_ref, planes, rec_planes,
              tent, mintent, mintent_sm, order_sm, sem,
              bt, bu, bv, bi, rec_acc, maxbest, stream_bufs=None,
              extract_uvi=True):
    """The shared two-level walk: initializes the per-ray accumulators
    (bt/bu/bv/bi/rec_acc, maxbest) and runs the gated supercluster ->
    segment-row -> Möller–Trumbore traversal for one ray block.

    cols: (ox, oy, oz, dx, dy, dz) as (RB, 1) columns;
    rows: the same six as (1, RB) rows (the caller owns the layout).
    Callers read the results out of the accumulator scratch and write
    their own outputs / epilogues.

    stream_bufs: optional ([(9 + n_rec) x VMEM (G, C) scratch], DMA
    sem) — HBM streaming mode: `planes` (and the shading-record planes,
    when present) then live in ANY/HBM (any scene size) and each
    visited supercluster's G rows of every plane are DMA'd into the
    scratch on demand, the copies overlapping the segment slab phase
    (reference streams any-size scenes from RAM,
    oct_tree_intersector.rs:66-146)."""
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = planes
    ox, oy, oz, dx, dy, dz = cols
    oxr, oyr, ozr, dxr, dyr, dzr = rows
    idxr, idyr, idzr = _safe_inv(dxr), _safe_inv(dyr), _safe_inv(dzr)

    K1 = sc_aabb_ref.shape[0]
    C = v0x.shape[1]
    RB = ox.shape[0]

    bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)
    if not shadow:
        if extract_uvi:
            bu[:] = jnp.zeros((RB, 1), jnp.float32)
            bv[:] = jnp.zeros((RB, 1), jnp.float32)
            bi[:] = jnp.zeros((RB, 1), jnp.int32)
        for acc in rec_acc:
            acc[:] = jnp.zeros((RB, 1), jnp.float32)

    # dead lanes (sentinel origins) never find a hit and must not hold
    # the block's culling threshold at BIG_T
    alive_row = jnp.abs(ox) < _ALIVE_LIMIT               # (RB, 1) bool

    # NOTE (round 5, measured and REVERTED): bounding each ray's
    # contribution to the early-exit threshold by its root-box exit
    # distance (so miss rays don't pin maxbest at BIG_T) does NOT cut
    # MT volume — the slab phase already culls superclusters a miss
    # ray never intersects, so rows-MT stayed 3.49 vs 3.51 while the
    # per-block setup cost 8% end-to-end (2.62 vs 2.84 Mrays/s).

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, C), dimension=1)

    # Per-block metadata computed IN-KERNEL from the ray planes (the
    # former host-side (1, nb) SMEM arrays capped nb at ~64k blocks —
    # 1 MB SMEM — which pooled wavefronts exceed, and cost an XLA
    # reduction pass per level besides):
    #  - block aliveness: any lane with a non-sentinel origin;
    #  - dominant-direction order index (approximate walk only).
    alive_blk = jnp.max(jnp.where(alive_row, 1, 0))
    if exact_order:
        oidx = jnp.int32(0)
    else:
        sx, sy, sz = jnp.sum(dxr), jnp.sum(dyr), jnp.sum(dzr)
        ax_, ay_, az_ = jnp.abs(sx), jnp.abs(sy), jnp.abs(sz)
        axis = jnp.where(ay_ > ax_, 1, 0)
        best = jnp.maximum(ax_, ay_)
        axis = jnp.where(az_ > best, 2, axis)
        sgn = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
        oidx = axis * 2 + (sgn < 0.0).astype(jnp.int32)

    maxbest[0, 0] = jnp.float32(min(BIG_T, limit))

    @pl.when(alive_blk != 0)
    def _():
        # --- phase 1: slab-test every supercluster against every ray ---
        minx, miny, minz = (sc_aabb_ref[:, 0:1], sc_aabb_ref[:, 1:2],
                            sc_aabb_ref[:, 2:3])
        maxx, maxy, maxz = (sc_aabb_ref[:, 3:4], sc_aabb_ref[:, 4:5],
                            sc_aabb_ref[:, 5:6])
        tx1, tx2 = (minx - oxr) * idxr, (maxx - oxr) * idxr
        ty1, ty2 = (miny - oyr) * idyr, (maxy - oyr) * idyr
        tz1, tz2 = (minz - ozr) * idzr, (maxz - ozr) * idzr
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.minimum(tz1, tz2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.maximum(tz1, tz2))
        tent[:] = jnp.where((tmax >= tmin) & (tmax > 0.0), tmin, BIG_T)
        mintent[:] = jnp.min(tent[:], axis=1, keepdims=True)   # (K1, 1)
        cp = pltpu.make_async_copy(mintent, mintent_sm, sem)
        cp.start()
        cp.wait()

        if exact_order:
            # exact per-block front-to-back: scalar insertion sort of the
            # supercluster entry distances (K1 is small; ~K1^2/2 scalar
            # ops amortized over the whole block).  Tightens early-t
            # termination where the global dominant-axis order is weakest
            # (bounce blocks).
            def init_order(i, _):
                order_sm[i, 0] = i
                return 0
            jax.lax.fori_loop(0, K1, init_order, 0)

            def ins(i, _):
                def shift(state):
                    j, key_i, key_v = state
                    order_sm[j, 0] = order_sm[j - 1, 0]
                    return j - 1, key_i, key_v

                def cond(state):
                    j, _, key_v = state
                    prev = order_sm[jnp.maximum(j - 1, 0), 0]
                    return (j > 0) & (mintent_sm[prev, 0] > key_v)

                key_i = order_sm[i, 0]
                key_v = mintent_sm[key_i, 0]
                j, _, _ = jax.lax.while_loop(cond, shift, (i, key_i, key_v))
                order_sm[j, 0] = key_i
                return 0
            jax.lax.fori_loop(1, K1, ins, 0)

        def mt_row(leaf, local):
            """Möller–Trumbore of the whole block against packed row
            `leaf` (a traced global index; `local` is its row within
            the current supercluster, used by the streaming scratch)."""
            if stream_bufs is not None:
                srcs = [b[pl.ds(local, 1), :] for b in stream_bufs[0][:9]]
            else:
                srcs = [pln[pl.ds(leaf, 1), :]
                        for pln in (v0x, v0y, v0z, e1x, e1y, e1z,
                                    e2x, e2y, e2z)]
            (av0x, av0y, av0z, ae1x, ae1y, ae1z,
             ae2x, ae2y, ae2z) = srcs                    # (1, C) each

            # (RB,1) ray x (1,C) triangle -> (RB,C)
            px = dy * ae2z - dz * ae2y
            py = dz * ae2x - dx * ae2z
            pz = dx * ae2y - dy * ae2x
            det = ae1x * px + ae1y * py + ae1z * pz
            non_par = jnp.abs(det) >= F32_EPSILON
            inv_det = 1.0 / jnp.where(non_par, det, 1.0)
            tvx, tvy, tvz = ox - av0x, oy - av0y, oz - av0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * ae1z - tvz * ae1y
            qy = tvz * ae1x - tvx * ae1z
            qz = tvx * ae1y - tvy * ae1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (ae2x * qx + ae2y * qy + ae2z * qz) * inv_det
            # acceptance as one sign test: u>=0 & v>=0 & u+v<=1 & t>=0
            # == min(u, v, 1-(u+v), t) >= 0 (u<=1 is implied by v>=0 &
            # u+v<=1, and sign(1-s) matches s<=1 exactly in f32 —
            # Sterbenz for s in [0.5, 2], magnitude elsewhere).  Saves
            # ~4 (RB, C) ops per pair in the MT-throughput-bound loop.
            ok = non_par & (jnp.minimum(
                jnp.minimum(uu, vv),
                jnp.minimum(1.0 - (uu + vv), tt)) >= 0.0)
            tt = jnp.where(ok, tt, BIG_T)

            tmin_row = jnp.min(tt, axis=1, keepdims=True)      # (RB, 1)
            better = tmin_row < bt[:]
            if not shadow and (extract_uvi or rec_planes):
                jhot = (tt == tmin_row) & (tmin_row < BIG_T)
                jfirst = jnp.min(jnp.where(jhot, lane, C), axis=1,
                                 keepdims=True)
                sel = lane == jfirst
            if not shadow and extract_uvi:
                # u/v/slot-index extraction — skipped by the fused spawn
                # on texture-free scenes (records carry everything it
                # needs; each masked (RB, C) reduction here is a
                # significant share of a row's MT cost)
                uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1, keepdims=True)
                vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1, keepdims=True)
                bu[:] = jnp.where(better, uj, bu[:])
                bv[:] = jnp.where(better, vj, bv[:])
                bi[:] = jnp.where(better, leaf * C + jfirst, bi[:])
            if not shadow:
                # shading-record epilogue: extract the winning triangle's
                # packed record values (normal/diffuse[/tex]) through the
                # same one-hot mask — kills the post-hoc (R, n_rec)
                # slot-record gather on the XLA side (VERDICT r3 item 4)
                if stream_bufs is not None:
                    rec_srcs = [b[pl.ds(local, 1), :]
                                for b in stream_bufs[0][9:]]
                else:
                    rec_srcs = [plane[pl.ds(leaf, 1), :]
                                for plane in rec_planes]
                for acc, rsrc in zip(rec_acc, rec_srcs):
                    pj = jnp.sum(jnp.where(sel, rsrc, 0.0),
                                 axis=1, keepdims=True)
                    acc[:] = jnp.where(better, pj, acc[:])
            bt[:] = jnp.where(better, tmin_row, bt[:])
            maxbest[0, 0] = jnp.minimum(
                jnp.max(jnp.where(alive_row, bt[:], 0.0)),
                jnp.float32(limit))

        def visit(kk):
            if stream_bufs is not None:
                # stream this supercluster's triangle (and shading-
                # record) rows HBM -> VMEM, overlapping the DMA with
                # the slab/gate phase below
                bufs, tsem = stream_bufs
                cps = [pltpu.make_async_copy(
                           pln.at[pl.ds(kk * G, G), :], buf, tsem)
                       for pln, buf in zip((v0x, v0y, v0z, e1x, e1y, e1z,
                                            e2x, e2y, e2z) + tuple(rec_planes),
                                           bufs)]
                for cp in cps:
                    cp.start()
            # --- segment-level slab test: one (G*S, RB) vector op ---
            sb = seg_aabb_ref[pl.ds(kk * (G * S), G * S), :]   # (G*S, 8)
            sminx, sminy, sminz = sb[:, 0:1], sb[:, 1:2], sb[:, 2:3]
            smaxx, smaxy, smaxz = sb[:, 3:4], sb[:, 4:5], sb[:, 5:6]
            sx1, sx2 = (sminx - oxr) * idxr, (smaxx - oxr) * idxr
            sy1, sy2 = (sminy - oyr) * idyr, (smaxy - oyr) * idyr
            sz1, sz2 = (sminz - ozr) * idzr, (smaxz - ozr) * idzr
            smin = jnp.maximum(jnp.maximum(jnp.minimum(sx1, sx2),
                                           jnp.minimum(sy1, sy2)),
                               jnp.minimum(sz1, sz2))
            smax = jnp.minimum(jnp.minimum(jnp.maximum(sx1, sx2),
                                           jnp.maximum(sy1, sy2)),
                               jnp.maximum(sz1, sz2))
            tent2 = jnp.where((smax >= smin) & (smax > 0.0),
                              smin, BIG_T)                 # (G*S, RB)

            # per-row key = min over the row's S segments and the block
            # (= entry into the union of its segment boxes, tighter
            # than one fat row AABB).  One full (S, RB) vector
            # reduction per row — the round-4 form (32 vector->scalar
            # extracts + 24 scalar mins) serialized on the scalar unit.
            ms = [jnp.min(tent2[l * S:(l + 1) * S, :]) for l in range(G)]
            ls = [jnp.int32(l) for l in range(G)]
            # front-to-back row order so the earliest rows tighten
            # maxbest before the rest are gated
            for (i, j) in _SORT_NET.get(G, ()):
                swap = ms[i] > ms[j]
                ms[i], ms[j] = (jnp.where(swap, ms[j], ms[i]),
                                jnp.where(swap, ms[i], ms[j]))
                ls[i], ls[j] = (jnp.where(swap, ls[j], ls[i]),
                                jnp.where(swap, ls[i], ls[j]))

            if stream_bufs is not None:
                for cp in cps:
                    cp.wait()
            for r in range(G):
                @pl.when(ms[r] < maxbest[0, 0])
                def _(r=r):
                    mt_row(kk * G + ls[r], ls[r])

        if exact_order:
            # walk in exact ascending entry order; the first gate failure
            # ends the whole walk (every later supercluster is farther)
            def wcond(k):
                kk = order_sm[jnp.minimum(k, K1 - 1), 0]
                return (k < K1) & (mintent_sm[kk, 0] < maxbest[0, 0])

            def wbody(k):
                visit(order_sm[k, 0])
                return k + 1

            jax.lax.while_loop(wcond, wbody, 0)
        else:
            def body(k, _):
                kk = order_ref[oidx, k]

                @pl.when(mintent_sm[kk, 0] < maxbest[0, 0])
                def _():
                    visit(kk)
                return 0

            jax.lax.fori_loop(0, K1, body, 0)


def _bvh_kernel(limit, shadow, G, S, exact_order, n_rec, stream,
                order_ref,                    # SMEM (6, K1) int32
                o_ref, d_ref,                 # VMEM (RB, 3)
                sc_aabb_ref,                  # VMEM (K1, 8)
                seg_aabb_ref,                 # VMEM (NL*S, 8)
                *rest):
    # rest = 9 triangle planes (NL, C) [+ n_rec shading-record planes
    # (NL, C)], then outputs t/u/v/i [+ n_rec], then scratch.
    planes = rest[:9]
    rec_planes = rest[9:9 + n_rec]
    k = 9 + n_rec
    t_out, u_out, v_out, i_out = rest[k:k + 4]
    rec_out = rest[k + 4:k + 4 + n_rec]
    k += 4 + n_rec
    (tent, mintent, mintent_sm, order_sm, sem, bt, bu, bv, bi) = rest[k:k + 9]
    rec_acc = rest[k + 9:k + 9 + n_rec]       # scratch (RB, 1) f32 each
    k += 9 + n_rec
    maxbest = rest[k]                         # scratch SMEM (1, 1) f32
    nsb = 9 + n_rec
    stream_bufs = ((rest[k + 1:k + 1 + nsb], rest[k + 1 + nsb])
                   if stream else None)

    RB = o_ref.shape[0]
    row = pl.program_id(1)
    o = o_ref[:]
    d = d_ref[:]
    cols = (o[:, 0:1], o[:, 1:2], o[:, 2:3],
            d[:, 0:1], d[:, 1:2], d[:, 2:3])
    rows = (o[:, 0].reshape(1, RB), o[:, 1].reshape(1, RB),
            o[:, 2].reshape(1, RB), d[:, 0].reshape(1, RB),
            d[:, 1].reshape(1, RB), d[:, 2].reshape(1, RB))

    _traverse(limit, shadow, G, S, exact_order,
              order_ref, cols, rows,
              sc_aabb_ref, seg_aabb_ref, planes, rec_planes,
              tent, mintent, mintent_sm, order_sm, sem,
              bt, bu, bv, bi, rec_acc, maxbest, stream_bufs=stream_bufs)

    t_out[pl.ds(row, 1), :] = bt[:].reshape(1, RB)
    if not shadow:
        u_out[pl.ds(row, 1), :] = bu[:].reshape(1, RB)
        v_out[pl.ds(row, 1), :] = bv[:].reshape(1, RB)
        i_out[pl.ds(row, 1), :] = bi[:].reshape(1, RB)
        for out, acc in zip(rec_out, rec_acc):
            out[pl.ds(row, 1), :] = acc[:].reshape(1, RB)


@functools.partial(jax.jit, static_argnames=("interpret", "t_limit", "shadow",
                                             "ray_block", "group",
                                             "exact_order", "stream"))
def pallas_bvh_closest(origins, dirs, v0, e1, e2, seg_aabb, sc_aabb, orders,
                       rec_planes=(),
                       interpret=False, t_limit=None, shadow=False,
                       ray_block=DEFAULT_RAY_BLOCK, group=8,
                       exact_order=None, stream=False):
    """origins/dirs: (R, 3) with R a multiple of 8*ray_block.
    v0/e1/e2: (NL, C, 3) packed triangle SoA; seg_aabb: (NL*S, 8) with
    S segments per row; sc_aabb: (K1, 8) with NL = K1*group;
    orders: (6, K1) int32.
    rec_planes: optional tuple of per-slot shading-record planes, each
    (NL, C) f32 (e.g. normal xyz + diffuse rgb [+ tex id]); the winning
    triangle's values are extracted in the Möller–Trumbore epilogue and
    returned as extra (R,) outputs, replacing the post-hoc slot-record
    gather.
    t_limit: STATIC float — superclusters/segments entirely beyond it
    are culled (hits past the limit MAY be missed; the closest hit below
    it is exact).
    Returns t (R,) f32 [, u, v (R,) f32, idx (R,) int32 packed-slot
    index, and one (R,) f32 per rec plane when not shadow; shadow
    returns only t]."""
    R = origins.shape[0]
    NL, C, _ = v0.shape
    K1 = sc_aabb.shape[0]
    assert NL == K1 * group
    assert seg_aabb.shape[0] % NL == 0
    S = seg_aabb.shape[0] // NL
    RB = ray_block
    assert R % RB == 0
    limit = float(t_limit) if t_limit is not None else float(BIG_T)
    planes = [a[:, :, c] for a in (v0, e1, e2) for c in range(3)]
    if stream:
        # HBM-resident triangle store: whole planes stay in ANY/HBM and
        # stream per visited supercluster (any scene size; the VMEM
        # footprint is 9 (G, C) buffers instead of 9 (NL, C) planes)
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        tri_spec = pl.BlockSpec((NL, C), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)

    nb = R // RB
    assert nb % 8 == 0
    grid = (nb // 8, 8)

    # per-block metadata (aliveness, dominant-direction order index) is
    # computed in-kernel from the ray data — no host-side reduction, no
    # SMEM arrays whose (1, nb) footprint would cap the batch size
    ray_spec = pl.BlockSpec((RB, 3), lambda i, j: (i * 8 + j, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    # exact per-block ordering pays for itself while the scalar sort is
    # cheap relative to the block's vector work (measured default)
    if exact_order is None:
        exact_order = K1 <= 64
    rec_planes = tuple(rec_planes) if not shadow else ()
    n_rec = len(rec_planes)
    kernel = functools.partial(_bvh_kernel, limit, shadow, group, S,
                               exact_order, n_rec, stream)

    # shadow mode leaves the u/v/idx outputs unwritten (their buffers are
    # allocated but never read back)
    out_shapes = (
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.int32),
    ) + (jax.ShapeDtypeStruct((nb, RB), jnp.float32),) * n_rec
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((6, K1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec,
                  pl.BlockSpec((K1, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NL * S, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [tri_spec] * (9 + n_rec),
        out_specs=(out_spec,) * (4 + n_rec),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K1, RB), jnp.float32),
                        pltpu.VMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.int32),
                        pltpu.SemaphoreType.DMA(())]
        + [pltpu.VMEM((RB, 1), jnp.float32)] * 3
        + [pltpu.VMEM((RB, 1), jnp.int32)]
        + [pltpu.VMEM((RB, 1), jnp.float32)] * n_rec
        + [pltpu.SMEM((1, 1), jnp.float32)]
        + ([pltpu.VMEM((group, C), jnp.float32)] * (9 + n_rec)
           + [pltpu.SemaphoreType.DMA(())] if stream else []),
        interpret=interpret,
    )(orders, origins, dirs, sc_aabb, seg_aabb, *planes, *rec_planes)
    if shadow:
        return outs[0].reshape(R)
    return tuple(o.reshape(R) for o in outs)


class BVHIntersector:
    """Production accel structure (see module docstring).  The
    `triangles_per_leaf` knob is the reference's octree leaf size
    (lib.rs:15-27), here the packed row width rounded to a lane
    multiple."""

    name = "bvh"

    def __init__(self, scene_buffers, triangles_per_leaf: int = 128,
                 group: int = 8, seg: int = 4,
                 ray_block: int = DEFAULT_RAY_BLOCK,
                 use_pallas: bool | None = None,
                 exact_order: bool | None = None,
                 stream: bool = False):
        bvh = build_bvh2(np.asarray(scene_buffers.tri_verts),
                         triangles_per_leaf=triangles_per_leaf, group=group,
                         seg=seg)
        self.bvh = bvh
        self.group = group
        self.seg = bvh.seg
        self.ray_block = ray_block
        self.leaf_capacity = bvh.leaf_size
        self.v0 = jnp.asarray(bvh.v0)
        self.e1 = jnp.asarray(bvh.e1)
        self.e2 = jnp.asarray(bvh.e2)
        self.leaf_aabb = jnp.asarray(bvh.leaf_aabb)
        self.seg_aabb = jnp.asarray(bvh.seg_aabb)
        self.sc_aabb = jnp.asarray(bvh.sc_aabb)
        self.orders = jnp.asarray(bvh.orders)
        self.perm = jnp.asarray(np.maximum(bvh.perm, 0))
        # world bounds for bounce-ray sort keys (wavefront._sort_key)
        lo = bvh.sc_aabb[:, 0:3].min(axis=0)
        hi = bvh.sc_aabb[:, 3:6].max(axis=0)
        self.world_lo = jnp.asarray(lo)
        self.world_inv_span = jnp.asarray(1.0 / np.maximum(hi - lo, 1e-30))
        self._world_lo_t = tuple(float(x) for x in lo)
        self._world_inv_t = tuple(float(x)
                                  for x in 1.0 / np.maximum(hi - lo, 1e-30))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.exact_order = exact_order
        # HBM-resident triangle store: stream supercluster rows on
        # demand instead of holding all planes in VMEM (any scene size)
        self.stream = stream
        # optional fused-shade record planes (set_shade_records): each
        # (NL, C) f32, extracted in-kernel for the forward fast path
        self.shade_planes = None
        self.rec_format = "full"
        self._rec_textured = None

    def set_shade_records(self, records, fmt: str = "full",
                          textured: bool | None = None):
        """Install packed per-slot shading records (S, n) — e.g.
        shade.build_slot_records — as (NL, C) planes for the in-kernel
        winning-record epilogue.  S must equal NL * C.

        fmt="full": columns are [normal(3), diffuse(3)[, tex_id]] and
        the kernel extracts all of them (6-7 masked reductions per MT
        row).  fmt="mat": columns are [normal(3), material id] — 4
        reductions; the driver resolves diffuse rgb (and tex id) from
        the per-material tables in XLA, which costs one tiny-table
        gather per level and saves 2-3 (RB, C) reductions per MT'd
        row.  `textured` (mat format) says whether the driver needs
        the barycentric u/v planes for a texel fetch."""
        NL, C, _ = self.v0.shape
        records = jnp.asarray(records)
        assert records.shape[0] == NL * C, (records.shape, NL, C)
        assert fmt in ("full", "mat")
        if fmt == "mat":
            assert records.shape[1] == 4
        self.shade_planes = tuple(records[:, k].reshape(NL, C)
                                  for k in range(records.shape[1]))
        self.rec_format = fmt
        self._rec_textured = bool(textured) if textured is not None else None

    @property
    def supports_fused_shade(self):
        return self.use_pallas and self.shade_planes is not None

    @property
    def supports_fused_spawn(self):
        """Whole-level fusion (pallas_bvh_spawn/shadow_shade): "full"
        records need 6 planes (normal + diffuse) for texture-free
        scenes or 7 (+ tex id) for textured ones; "mat" records need 4
        (normal + material id).  Textured scenes additionally emit the
        winning hit's barycentric u/v planes and the texel fetch runs
        in XLA between spawn and shadow-shade (reference texturing:
        mod.rs:244-247, texture.rs:21-27).  Streaming scenes
        (HBM-resident planes) keep the fused path: the record planes
        stream alongside the triangles."""
        if not self.use_pallas or self.shade_planes is None:
            return False
        if getattr(self, "rec_format", "full") == "mat":
            return len(self.shade_planes) == 4
        return len(self.shade_planes) in (6, 7)

    @property
    def fused_has_textures(self):
        """True when the fused-spawn driver must fetch texels between
        spawn and shadow_shade (the spawn kernel then also emits u/v)."""
        if self.shade_planes is None:
            return False
        if getattr(self, "rec_format", "full") == "mat":
            return bool(self._rec_textured)
        return len(self.shade_planes) == 7

    def spawn(self, o_planes, d_planes, gauss_planes, light_pos,
              children: int, key_mode: str = "dir6"):
        """Fused closest + shadow-ray + child-ray construction on
        plane-form rays (see pallas_bvh_spawn).  Textured scenes (7
        record planes) additionally emit the winning hit's barycentric
        u/v planes for the XLA-side texel fetch."""
        assert self.shade_planes is not None
        return pallas_bvh_spawn(
            tuple(o_planes), tuple(d_planes), tuple(gauss_planes),
            light_pos, self.v0, self.e1, self.e2, self.seg_aabb,
            self.sc_aabb, self.orders, self.shade_planes,
            world_lo=self._world_lo_t, world_inv_span=self._world_inv_t,
            group=self.group, exact_order=self.exact_order,
            n_lights=int(light_pos.shape[0]), children=children,
            emit_uv=self.fused_has_textures, key_mode=key_mode,
            ray_block=self.ray_block, stream=self.stream)

    def shadow_shade(self, so_planes, sd_planes, n_planes, c_planes,
                     view_planes, light_color):
        """Fused occlusion + Phong radiance (see
        pallas_bvh_shadow_shade)."""
        return pallas_bvh_shadow_shade(
            tuple(so_planes), tuple(sd_planes), tuple(n_planes),
            tuple(c_planes), tuple(view_planes), light_color,
            self.v0, self.e1, self.e2, self.seg_aabb, self.sc_aabb,
            self.orders, group=self.group, exact_order=self.exact_order,
            n_lights=int(light_color.shape[0]),
            ray_block=self.ray_block, stream=self.stream)

    def _pad(self, origins, dirs):
        R = origins.shape[0]
        pad = (-R) % (8 * self.ray_block)
        if pad:
            origins = jnp.concatenate(
                [origins,
                 jnp.broadcast_to(jnp.float32(DEAD_ORIGIN), (pad, 3))])
            dirs = jnp.concatenate(
                [dirs, jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (pad, 3))])
        return origins, dirs, R

    @staticmethod
    def _mask_dead(origins, dirs, alive):
        if alive is None:
            return origins, dirs
        a = alive[:, None]
        return (jnp.where(a, origins, DEAD_ORIGIN),
                jnp.where(a, dirs, 1.0))

    def query(self, scene, origins, dirs, alive=None, t_limit=None,
              emit_shade=False):
        """Generic closest-hit with a STATIC t-limit.  With
        emit_shade=True (requires set_shade_records + the Pallas path)
        the hit dict additionally carries the winning triangle's packed
        record columns as "rec" (R, n_rec), extracted in-kernel."""
        origins, dirs = self._mask_dead(origins, dirs, alive)
        rec = None
        if self.use_pallas:
            origins, dirs, R = self._pad(origins, dirs)
            planes = self.shade_planes if emit_shade else ()
            assert not emit_shade or planes, \
                "emit_shade requires set_shade_records()"
            t, u, v, i, *recs = pallas_bvh_closest(
                origins, dirs, self.v0, self.e1, self.e2, self.seg_aabb,
                self.sc_aabb, self.orders, rec_planes=planes,
                t_limit=t_limit,
                ray_block=self.ray_block, group=self.group,
                exact_order=self.exact_order, stream=self.stream)
            t, u, v, i = t[:R], u[:R], v[:R], i[:R]
            if emit_shade:
                rec = jnp.stack([r[:R] for r in recs], axis=1)   # (R, n)
        else:
            t, u, v, i = xla_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2,
                self.leaf_aabb[:, 0:3], self.leaf_aabb[:, 3:6])
        hit = t < BIG_T
        tri = jnp.where(hit, self.perm[i], 0)
        out = dict(t=t, u=u, v=v, tri=tri.astype(jnp.int32), hit=hit,
                   slot=jnp.where(hit, i, 0).astype(jnp.int32))
        if rec is not None:
            out["rec"] = rec
        return out

    def closest(self, scene, origins, dirs, alive=None):
        return self.query(scene, origins, dirs, alive=alive)

    def shadow(self, scene, origins, dirs, alive=None, t_min=0.01, t_max=1.0):
        """Windowed-closest occlusion (mod.rs:224-230): blocked iff the
        closest hit lands strictly inside (t_min, t_max).  Culling past
        t_max cannot change the outcome."""
        origins, dirs = self._mask_dead(origins, dirs, alive)
        if self.use_pallas:
            origins, dirs, R = self._pad(origins, dirs)
            t = pallas_bvh_closest(
                origins, dirs, self.v0, self.e1, self.e2, self.seg_aabb,
                self.sc_aabb, self.orders, t_limit=t_max, shadow=True,
                ray_block=self.ray_block, group=self.group,
                exact_order=self.exact_order, stream=self.stream)[:R]
        else:
            t, _, _, _ = xla_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2,
                self.leaf_aabb[:, 0:3], self.leaf_aabb[:, 3:6])
        return (t < BIG_T) & (t > t_min) & (t < t_max)


# --- fused wavefront kernels -------------------------------------------------
#
# The closest-hit kernel's epilogue can construct everything the next
# pipeline stage consumes — shadow rays, Phong radiance inputs, child
# bounce rays and their sort keys — directly from its per-ray
# accumulators, at VMEM bandwidth.  Doing so removes the (R, 3)
# elementwise XLA glue (to-light subtraction, masking selects, repeats,
# hemisphere reflection, Morton quantization...) that round-4 traces
# showed costing more than the traversal kernels themselves, plus the
# layout-conversion copies XLA inserts around every (R, 3) kernel
# operand.  Ray I/O here is PLANE form — one (nb, RB) f32 array per
# scalar component — which reshapes for free to the (R,) columns
# lax.sort consumes, unlike packed (R, 3) arrays whose TPU layout pads
# 3 -> 128 lanes.
#
# wavefront.trace_radiance_fused drives these; semantics are verified
# bit-for-bit against the unfused path in tests/test_fused_spawn.py.

HIT_OFFSET = 1e-5      # mod.rs:193 (spawn offset along the new dir)
SHADOW_OFFSET = 0.01   # mod.rs:224-225 (shadow origin offset)


def _expand3_k(x):
    """Morton bit-spread (wavefront._expand3, in-kernel int vector)."""
    x = (x | (x << 8)) & 0x0100F00F
    x = (x | (x << 4)) & 0x010C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _norm3(x, y, z):
    """shade._normalize, component form: v / where(|v| > 0, |v|, 1)."""
    n = jnp.sqrt(x * x + y * y + z * z)
    safe = jnp.where(n > 0, n, 1.0)
    return x / safe, y / safe, z / safe


def _spawn_kernel(limit, G, S, exact_order, n_rec, L, b, emit_uv, key_mode,
                  stream, world_lo, world_inv_span,
                  order_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, RB)
                  light_ref,                    # SMEM (L, 4) light pos
                  sc_aabb_ref, seg_aabb_ref,
                  *rest):
    # rest = 9 tri planes + 3b gauss planes (8, RB) + n_rec rec planes,
    # then outputs, then scratch [+ tile stash] [+ streaming bufs].
    planes = rest[:9]
    gauss = rest[9:9 + 3 * b]
    rec_planes = rest[9 + 3 * b:9 + 3 * b + n_rec]
    k = 9 + 3 * b + n_rec
    n_out = 1 + (2 if emit_uv else 0) + n_rec + 6 * L + 7 * b
    outs = rest[k:k + n_out]
    k += n_out
    (tent, mintent, mintent_sm, order_sm, sem, bt, bu, bv, bi) = rest[k:k + 9]
    rec_acc = rest[k + 9:k + 9 + n_rec]
    maxbest = rest[k + 9 + n_rec]
    k += 9 + n_rec + 1
    nsb = 9 + n_rec
    stream_bufs = (rest[k:k + nsb], rest[k + nsb]) if stream else None

    RB = ox_ref.shape[1]
    row = pl.program_id(1)

    rows = tuple(r[pl.ds(row, 1), :]
                 for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
    cols = tuple(r.reshape(RB, 1) for r in rows)

    _traverse(limit, False, G, S, exact_order,
              order_ref, cols, rows,
              sc_aabb_ref, seg_aabb_ref, planes, rec_planes,
              tent, mintent, mintent_sm, order_sm, sem,
              bt, bu, bv, bi, rec_acc, maxbest, stream_bufs=stream_bufs,
              extract_uvi=emit_uv)

    # write this block's traversal results straight into the (8, RB)
    # output windows (t, [u, v], records) — the epilogue reads them back
    n_direct = 1 + (2 if emit_uv else 0) + n_rec
    di = 0
    for acc in (bt, bu, bv)[:1 + (2 if emit_uv else 0)]:
        outs[di][pl.ds(row, 1), :] = acc[:].reshape(1, RB)
        di += 1
    for acc in rec_acc:
        outs[di][pl.ds(row, 1), :] = acc[:].reshape(1, RB)
        di += 1

    # --- whole-tile epilogue, once per grid step ---------------------
    # Round 4 ran this per block in (RB, 1)/(1, RB) form — both use 1
    # of 128 VPU lanes, and the round-5 trace showed the epilogue
    # dominating the spawn kernels' per-block fixed cost.  Running it
    # once over the (8, RB) tile uses the full vreg.
    @pl.when(row == 7)
    def _epilogue():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        bt_t = outs[0][:]
        alive_t = jnp.abs(ox) < _ALIVE_LIMIT
        hit = (bt_t < BIG_T) & alive_t
        t_san = jnp.where(hit, bt_t, 0.0)   # prepare_shade t sanitization
        hpx = ox + t_san * dx
        hpy = oy + t_san * dy
        hpz = oz + t_san * dz
        rec_t = outs[n_direct - n_rec:n_direct]
        nx_, ny_, nz_ = rec_t[0][:], rec_t[1][:], rec_t[2][:]

        out_i = n_direct

        def emit(tile):
            nonlocal out_i
            outs[out_i][:, :] = tile
            out_i += 1

        # shadow rays per light (prepare_shade: origin offset along the
        # UNNORMALIZED to-light dir; facing via the normalized one)
        for li in range(L):
            tlx = light_ref[li, 0] - hpx
            tly = light_ref[li, 1] - hpy
            tlz = light_ref[li, 2] - hpz
            tnx, tny, tnz = _norm3(tlx, tly, tlz)
            dln = nx_ * tnx + ny_ * tny + nz_ * tnz
            salive = hit & (dln >= 0.0)
            emit(jnp.where(salive, hpx + SHADOW_OFFSET * tlx, DEAD_ORIGIN))
            emit(jnp.where(salive, hpy + SHADOW_OFFSET * tly, DEAD_ORIGIN))
            emit(jnp.where(salive, hpz + SHADOW_OFFSET * tlz, DEAD_ORIGIN))
            emit(jnp.where(salive, tlx, 1.0))
            emit(jnp.where(salive, tly, 1.0))
            emit(jnp.where(salive, tlz, 1.0))

        # child bounce rays (wavefront child-gen: hemisphere_from_gaussian
        # + HIT_OFFSET spawn + dead-masking + dir6/dir9 sort key)
        for j in range(b):
            gx, gy, gz = (gauss[3 * j][:], gauss[3 * j + 1][:],
                          gauss[3 * j + 2][:])
            ux, uy, uz = _norm3(gx, gy, gz)
            gdot = ux * nx_ + uy * ny_ + uz * nz_
            flip = gdot < 0.0
            cdx = jnp.where(flip, -ux, ux)
            cdy = jnp.where(flip, -uy, uy)
            cdz = jnp.where(flip, -uz, uz)
            cox = hpx + HIT_OFFSET * cdx
            coy = hpy + HIT_OFFSET * cdy
            coz = hpz + HIT_OFFSET * cdz
            emit(jnp.where(hit, cox, DEAD_ORIGIN))
            emit(jnp.where(hit, coy, DEAD_ORIGIN))
            emit(jnp.where(hit, coz, DEAD_ORIGIN))
            emit(jnp.where(hit, cdx, 1.0))
            emit(jnp.where(hit, cdy, 1.0))
            emit(jnp.where(hit, cdz, 1.0))
            if key_mode in ("dir6", "dir9"):
                # wavefront._sort_key: direction bins major, origin
                # Morton minor.  dir6 = 64 bins + 15-bit Morton; dir9 =
                # 512 bins + full 21-bit Morton (pooled wavefronts fill
                # finer bins).
                q = [jnp.clip((c - lo) * inv * 128.0, 0.0, 127.0
                              ).astype(jnp.int32)
                     for c, lo, inv in
                     ((cox, world_lo[0], world_inv_span[0]),
                      (coy, world_lo[1], world_inv_span[1]),
                      (coz, world_lo[2], world_inv_span[2]))]
                morton = ((_expand3_k(q[0]) << 2) | (_expand3_k(q[1]) << 1)
                          | _expand3_k(q[2]))
                mag = jnp.maximum(jnp.maximum(jnp.abs(cdx), jnp.abs(cdy)),
                                  jnp.abs(cdz))
                mag = jnp.maximum(mag, 1e-30)
                bits = 2 if key_mode == "dir6" else 3
                hi = float(2 ** bits - 1)
                qd = [jnp.clip((c / mag + 1.0) * (2.0 ** (bits - 1)),
                               0.0, hi).astype(jnp.int32)
                      for c in (cdx, cdy, cdz)]
                dirbin = (qd[0] << (2 * bits)) | (qd[1] << bits) | qd[2]
                if key_mode == "dir6":
                    key = (dirbin << 15) | (morton >> 6)
                else:
                    key = (dirbin << 21) | morton
                emit(jnp.where(hit, key, jnp.int32(2 ** 30)))
            else:
                emit(jnp.where(hit, jnp.int32(0), jnp.int32(2 ** 30)))


def _shadow_shade_kernel(t_min, t_max, G, S, exact_order, L, nbp, pow_spec,
                         stream,
                         order_ref,
                         ox_ref, oy_ref, oz_ref,      # shadow origin (1, RB)
                         dx_ref, dy_ref, dz_ref,      # to-light dir (1, RB)
                         nx_ref, ny_ref, nz_ref,      # surface normal
                         cx_ref, cy_ref, cz_ref,      # diffuse rgb
                         vx_ref, vy_ref, vz_ref,      # parent ray dir (view)
                         lcol_ref,                    # SMEM (L, 4) light rgb
                         sc_aabb_ref, seg_aabb_ref,
                         *rest):
    planes = rest[:9]
    rr, rg, rb_ = rest[9:12]                 # radiance outputs
    (tent, mintent, mintent_sm, order_sm, sem, bt, bu, bv, bi) = rest[12:21]
    maxbest = rest[21]
    t8 = rest[22]                            # (8, RB) occlusion-t stash
    stream_bufs = (rest[23:32], rest[32]) if stream else None

    RB = ox_ref.shape[1]
    row = pl.program_id(1)
    rows = tuple(r[pl.ds(row, 1), :]
                 for r in (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref))
    cols = tuple(r.reshape(RB, 1) for r in rows)

    _traverse(t_max, True, G, S, exact_order,
              order_ref, cols, rows,
              sc_aabb_ref, seg_aabb_ref, planes, (),
              tent, mintent, mintent_sm, order_sm, sem,
              bt, bu, bv, bi, (), maxbest, stream_bufs=stream_bufs)

    t8[pl.ds(row, 1), :] = bt[:].reshape(1, RB)

    # --- whole-tile epilogue: finish_shade for this light chunk, once
    # per grid step over the (8, RB) tile (the round-4 per-block (1, RB)
    # row form used 1 of 128 VPU lanes; see _spawn_kernel) ---
    @pl.when(row == 7)
    def _epilogue():
        oxr = ox_ref[:]
        tlxr, tlyr, tlzr = dx_ref[:], dy_ref[:], dz_ref[:]
        salive = jnp.abs(oxr) < _ALIVE_LIMIT   # hit & facing, from spawn
        btr = t8[:]
        blocked = (btr < BIG_T) & (btr > t_min) & (btr < t_max)
        nx_, ny_, nz_ = nx_ref[:], ny_ref[:], nz_ref[:]
        cr, cg, cb = cx_ref[:], cy_ref[:], cz_ref[:]
        vx, vy, vz = _norm3(vx_ref[:], vy_ref[:], vz_ref[:])
        tnx, tny, tnz = _norm3(tlxr, tlyr, tlzr)
        dln = nx_ * tnx + ny_ * tny + nz_ * tnz
        # reflect + unclamped even-power Phong (mod.rs:252-256, pow32)
        rx = 2.0 * dln * nx_ - tnx
        ry = 2.0 * dln * ny_ - tny
        rz = 2.0 * dln * nz_ - tnz
        s = vx * rx + vy * ry + vz * rz
        for _ in range(pow_spec):            # x^(2^pow_spec): 32 = 2^5
            s = s * s
        # all 8 blocks of a step share one light chunk (nbp % 8 == 0)
        li = (pl.program_id(0) * 8) // nbp if L > 1 else 0
        lit = salive & ~blocked
        for out, c, lc in ((rr, cr, lcol_ref[li, 0]),
                           (rg, cg, lcol_ref[li, 1]),
                           (rb_, cb, lcol_ref[li, 2])):
            contrib = (c * dln + s) * lc
            out[:, :] = jnp.where(lit, contrib, 0.0)


def _plane_spec(RB):
    # Mosaic requires sublane-dim blocks divisible by 8: fetch the 8
    # block-rows of grid step i and let the kernel slice its row j.
    return pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _common_scratch(K1, RB, n_rec):
    return ([pltpu.VMEM((K1, RB), jnp.float32),
             pltpu.VMEM((K1, 1), jnp.float32),
             pltpu.SMEM((K1, 1), jnp.float32),
             pltpu.SMEM((K1, 1), jnp.int32),
             pltpu.SemaphoreType.DMA(())]
            + [pltpu.VMEM((RB, 1), jnp.float32)] * 3
            + [pltpu.VMEM((RB, 1), jnp.int32)]
            + [pltpu.VMEM((RB, 1), jnp.float32)] * n_rec
            + [pltpu.SMEM((1, 1), jnp.float32)])


@functools.partial(jax.jit, static_argnames=(
    "interpret", "group", "exact_order", "n_lights", "children", "emit_uv",
    "key_mode", "ray_block", "world_lo", "world_inv_span", "stream"))
def pallas_bvh_spawn(o_planes, d_planes, gauss_planes, light_pos,
                     v0, e1, e2, seg_aabb, sc_aabb, orders, rec_planes,
                     world_lo=(0.0, 0.0, 0.0), world_inv_span=(1., 1., 1.),
                     interpret=False, group=8, exact_order=None,
                     n_lights=1, children=0, emit_uv=False, key_mode="dir6",
                     ray_block=DEFAULT_RAY_BLOCK, stream=False):
    """Fused closest-hit + spawn: plane-form rays in, per-ray closest t,
    shading record, per-light shadow rays, and per-child bounce rays +
    sort keys out (all (nb, RB) planes).  See module comment.
    stream=True keeps the triangle AND record planes in ANY/HBM and
    DMAs each visited supercluster's rows (any scene size)."""
    nb, RB = o_planes[0].shape
    NL, C, _ = v0.shape
    K1 = sc_aabb.shape[0]
    S = seg_aabb.shape[0] // NL
    b = children
    L = n_lights
    n_rec = len(rec_planes)
    assert nb % 8 == 0
    if exact_order is None:
        exact_order = K1 <= 64
    world_lo = tuple(float(x) for x in np.asarray(world_lo))
    world_inv_span = tuple(float(x) for x in np.asarray(world_inv_span))
    planes = [a[:, :, c] for a in (v0, e1, e2) for c in range(3)]
    if stream:
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        tri_spec = pl.BlockSpec((NL, C), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    pspec = _plane_spec(RB)
    lp = jnp.zeros((L, 4), jnp.float32).at[:, 0:3].set(light_pos)

    n_out = 1 + (2 if emit_uv else 0) + n_rec + 6 * L + 7 * b
    out_shapes = []
    out_dtypes = ([jnp.float32] * (1 + (2 if emit_uv else 0) + n_rec)
                  + [jnp.float32] * (6 * L)
                  + ([jnp.float32] * 6 + [jnp.int32]) * b)
    for dt in out_dtypes:
        out_shapes.append(jax.ShapeDtypeStruct((nb, RB), dt))
    out_spec = pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_spawn_kernel, float(BIG_T), group, S,
                               exact_order, n_rec, L, b, emit_uv, key_mode,
                               stream, world_lo, world_inv_span)
    outs = pl.pallas_call(
        kernel,
        grid=(nb // 8, 8),
        in_specs=[pl.BlockSpec((6, K1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pspec] * 6
        + [pl.BlockSpec((L, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((K1, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((NL * S, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)]
        + [tri_spec] * 9 + [pspec] * (3 * b) + [tri_spec] * n_rec,
        out_specs=tuple([out_spec] * n_out),
        out_shape=tuple(out_shapes),
        scratch_shapes=_common_scratch(K1, RB, n_rec)
        + ([pltpu.VMEM((group, C), jnp.float32)] * (9 + n_rec)
           + [pltpu.SemaphoreType.DMA(())] if stream else []),
        interpret=interpret,
    )(orders, *o_planes, *d_planes, lp, sc_aabb, seg_aabb,
      *planes, *gauss_planes, *rec_planes)

    res = dict(t=outs[0])
    k = 1
    if emit_uv:
        res["u"], res["v"] = outs[k], outs[k + 1]
        k += 2
    res["rec"] = outs[k:k + n_rec]
    k += n_rec
    res["shadow"] = [outs[k + 6 * li:k + 6 * (li + 1)] for li in range(L)]
    k += 6 * L
    res["children"] = [outs[k + 7 * j:k + 7 * (j + 1)] for j in range(b)]
    return res


@functools.partial(jax.jit, static_argnames=(
    "interpret", "group", "exact_order", "n_lights", "t_min", "t_max",
    "ray_block", "stream"))
def pallas_bvh_shadow_shade(so_planes, sd_planes, n_planes, c_planes,
                            view_planes, light_color,
                            v0, e1, e2, seg_aabb, sc_aabb, orders,
                            interpret=False, group=8, exact_order=None,
                            n_lights=1, t_min=0.01, t_max=1.0,
                            ray_block=DEFAULT_RAY_BLOCK, stream=False):
    """Fused occlusion + Phong radiance for a light-major shadow batch:
    so/sd are (L*nbp, RB) planes; n/c/view are the parent-level planes
    (nbp, RB), indexed per light chunk.  Returns 3 radiance planes
    (L*nbp, RB) — sum over the L chunks for the level's radiance."""
    nbs, RB = so_planes[0].shape
    L = n_lights
    nbp = nbs // L
    # nbp must itself be a block-row multiple: parent_spec indexes the
    # parent planes with i % (nbp // 8) and the kernel derives the light
    # index as blk // nbp, both of which misindex if only nbs (and not
    # the per-light chunk) is divisible by 8.
    assert nbs == nbp * L and nbp % 8 == 0
    NL, C, _ = v0.shape
    K1 = sc_aabb.shape[0]
    S = seg_aabb.shape[0] // NL
    if exact_order is None:
        exact_order = K1 <= 64
    planes = [a[:, :, c] for a in (v0, e1, e2) for c in range(3)]
    if stream:
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        tri_spec = pl.BlockSpec((NL, C), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    pspec = _plane_spec(RB)
    parent_spec = pl.BlockSpec((8, RB), lambda i, j: (i % (nbp // 8), 0),
                               memory_space=pltpu.VMEM)
    lc = jnp.zeros((L, 4), jnp.float32).at[:, 0:3].set(light_color)

    kernel = functools.partial(_shadow_shade_kernel, float(t_min),
                               float(t_max), group, S, exact_order, L, nbp,
                               5, stream)                # 2^5 = pow32
    out_spec = pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    rr, rg, rb_ = pl.pallas_call(
        kernel,
        grid=(nbs // 8, 8),
        in_specs=[pl.BlockSpec((6, K1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pspec] * 6 + [parent_spec] * 9
        + [pl.BlockSpec((L, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((K1, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((NL * S, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)]
        + [tri_spec] * 9,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((nbs, RB), jnp.float32)
                        for _ in range(3)),
        scratch_shapes=_common_scratch(K1, RB, 0)
        + [pltpu.VMEM((8, RB), jnp.float32)]             # t8 tile stash
        + ([pltpu.VMEM((group, C), jnp.float32)] * 9
           + [pltpu.SemaphoreType.DMA(())] if stream else []),
        interpret=interpret,
    )(orders, *so_planes, *sd_planes,
      *n_planes, *c_planes, *view_planes, lc, sc_aabb, seg_aabb, *planes)
    return rr, rg, rb_
