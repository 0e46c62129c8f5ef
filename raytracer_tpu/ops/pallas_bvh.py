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


def _bvh_kernel(limit, shadow, G, S, exact_order, n_rec,
                oidx_ref,                     # SMEM (1, nb) int32
                alive_ref,                    # SMEM (1, nb) int32
                order_ref,                    # SMEM (6, K1) int32
                o_ref, d_ref,                 # VMEM (RB, 3)
                sc_aabb_ref,                  # VMEM (K1, 8)
                seg_aabb_ref,                 # VMEM (NL*S, 8)
                *rest):
    # rest = 9 triangle planes (NL, C) [+ n_rec shading-record planes
    # (NL, C)], then outputs t/u/v/i [+ n_rec], then scratch.
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = rest[:9]
    rec_planes = rest[9:9 + n_rec]
    k = 9 + n_rec
    t_out, u_out, v_out, i_out = rest[k:k + 4]
    rec_out = rest[k + 4:k + 4 + n_rec]
    k += 4 + n_rec
    (tent, mintent, mintent_sm, order_sm, sem, bt, bu, bv, bi) = rest[k:k + 9]
    rec_acc = rest[k + 9:k + 9 + n_rec]       # scratch (RB, 1) f32 each
    maxbest = rest[k + 9 + n_rec]             # scratch SMEM (1, 1) f32

    K1 = sc_aabb_ref.shape[0]
    C = v0x.shape[1]
    RB = o_ref.shape[0]
    row = pl.program_id(1)

    o = o_ref[:]
    d = d_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]          # (RB, 1) cols
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    # row layouts for the cluster-major slab phases
    oxr, oyr, ozr = (o[:, 0].reshape(1, RB), o[:, 1].reshape(1, RB),
                     o[:, 2].reshape(1, RB))
    dxr, dyr, dzr = (d[:, 0].reshape(1, RB), d[:, 1].reshape(1, RB),
                     d[:, 2].reshape(1, RB))
    idxr, idyr, idzr = _safe_inv(dxr), _safe_inv(dyr), _safe_inv(dzr)

    bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)
    if not shadow:
        bu[:] = jnp.zeros((RB, 1), jnp.float32)
        bv[:] = jnp.zeros((RB, 1), jnp.float32)
        bi[:] = jnp.zeros((RB, 1), jnp.int32)
        for acc in rec_acc:
            acc[:] = jnp.zeros((RB, 1), jnp.float32)

    # dead lanes (sentinel origins) never find a hit and must not hold
    # the block's culling threshold at BIG_T
    alive_row = jnp.abs(ox) < _ALIVE_LIMIT               # (RB, 1) bool

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, C), dimension=1)

    blk = pl.program_id(0) * 8 + row
    oidx = oidx_ref[0, blk]

    maxbest[0, 0] = jnp.float32(min(BIG_T, limit))

    @pl.when(alive_ref[0, blk] != 0)
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

        def mt_row(leaf):
            """Möller–Trumbore of the whole block against packed row
            `leaf` (a traced index)."""
            av0x = v0x[pl.ds(leaf, 1), :]                # (1, C)
            av0y = v0y[pl.ds(leaf, 1), :]
            av0z = v0z[pl.ds(leaf, 1), :]
            ae1x = e1x[pl.ds(leaf, 1), :]
            ae1y = e1y[pl.ds(leaf, 1), :]
            ae1z = e1z[pl.ds(leaf, 1), :]
            ae2x = e2x[pl.ds(leaf, 1), :]
            ae2y = e2y[pl.ds(leaf, 1), :]
            ae2z = e2z[pl.ds(leaf, 1), :]

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
            ok = (non_par & (uu >= 0.0) & (uu <= 1.0)
                  & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= 0.0))
            tt = jnp.where(ok, tt, BIG_T)

            tmin_row = jnp.min(tt, axis=1, keepdims=True)      # (RB, 1)
            better = tmin_row < bt[:]
            if not shadow:
                jhot = (tt == tmin_row) & (tmin_row < BIG_T)
                jfirst = jnp.min(jnp.where(jhot, lane, C), axis=1,
                                 keepdims=True)
                sel = lane == jfirst
                uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1, keepdims=True)
                vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1, keepdims=True)
                bu[:] = jnp.where(better, uj, bu[:])
                bv[:] = jnp.where(better, vj, bv[:])
                bi[:] = jnp.where(better, leaf * C + jfirst, bi[:])
                # shading-record epilogue: extract the winning triangle's
                # packed record values (normal/diffuse[/tex]) through the
                # same one-hot mask — kills the post-hoc (R, n_rec)
                # slot-record gather on the XLA side (VERDICT r3 item 4)
                for acc, plane in zip(rec_acc, rec_planes):
                    pj = jnp.sum(jnp.where(sel, plane[pl.ds(leaf, 1), :], 0.0),
                                 axis=1, keepdims=True)
                    acc[:] = jnp.where(better, pj, acc[:])
            bt[:] = jnp.where(better, tmin_row, bt[:])
            maxbest[0, 0] = jnp.minimum(
                jnp.max(jnp.where(alive_row, bt[:], 0.0)),
                jnp.float32(limit))

        def visit(kk):
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

            # per-segment block-entry minima -> scalars; per-row key =
            # min over the row's S segments (= entry into the union of
            # its segment boxes, tighter than one fat row AABB)
            mseg = jnp.min(tent2, axis=1, keepdims=True)   # (G*S, 1)
            msc = [mseg[j, 0] for j in range(G * S)]
            ms = []
            for l in range(G):
                m = msc[l * S]
                for s in range(1, S):
                    m = jnp.minimum(m, msc[l * S + s])
                ms.append(m)
            ls = [jnp.int32(l) for l in range(G)]
            # front-to-back row order so the earliest rows tighten
            # maxbest before the rest are gated
            for (i, j) in _SORT_NET.get(G, ()):
                swap = ms[i] > ms[j]
                ms[i], ms[j] = (jnp.where(swap, ms[j], ms[i]),
                                jnp.where(swap, ms[i], ms[j]))
                ls[i], ls[j] = (jnp.where(swap, ls[j], ls[i]),
                                jnp.where(swap, ls[i], ls[j]))

            for r in range(G):
                @pl.when(ms[r] < maxbest[0, 0])
                def _(r=r):
                    mt_row(kk * G + ls[r])

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

    t_out[pl.ds(row, 1), :] = bt[:].reshape(1, RB)
    if not shadow:
        u_out[pl.ds(row, 1), :] = bu[:].reshape(1, RB)
        v_out[pl.ds(row, 1), :] = bv[:].reshape(1, RB)
        i_out[pl.ds(row, 1), :] = bi[:].reshape(1, RB)
        for out, acc in zip(rec_out, rec_acc):
            out[pl.ds(row, 1), :] = acc[:].reshape(1, RB)


@functools.partial(jax.jit, static_argnames=("interpret", "t_limit", "shadow",
                                             "ray_block", "group",
                                             "exact_order"))
def pallas_bvh_closest(origins, dirs, v0, e1, e2, seg_aabb, sc_aabb, orders,
                       rec_planes=(),
                       interpret=False, t_limit=None, shadow=False,
                       ray_block=DEFAULT_RAY_BLOCK, group=8,
                       exact_order=None):
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
    tri_spec = pl.BlockSpec((NL, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    nb = R // RB
    assert nb % 8 == 0
    grid = (nb // 8, 8)

    db = dirs.reshape(nb, RB, 3)
    s = jnp.sum(db, axis=1)                                    # (nb, 3)
    axis = jnp.argmax(jnp.abs(s), axis=1)                      # (nb,)
    sgn = jnp.take_along_axis(s, axis[:, None], axis=1)[:, 0]
    oidx = (axis * 2 + (sgn < 0.0)).astype(jnp.int32)[None, :]  # (1, nb)
    ob = origins.reshape(nb, RB, 3)
    alive = jnp.any(jnp.abs(ob[:, :, 0]) < _ALIVE_LIMIT, axis=1)
    alive = alive.astype(jnp.int32)[None, :]                   # (1, nb)

    ray_spec = pl.BlockSpec((RB, 3), lambda i, j: (i * 8 + j, 0),
                            memory_space=pltpu.VMEM)
    blk_scalar_spec = pl.BlockSpec((1, nb), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    # exact per-block ordering pays for itself while the scalar sort is
    # cheap relative to the block's vector work (measured default)
    if exact_order is None:
        exact_order = K1 <= 64
    rec_planes = tuple(rec_planes) if not shadow else ()
    n_rec = len(rec_planes)
    kernel = functools.partial(_bvh_kernel, limit, shadow, group, S,
                               exact_order, n_rec)

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
        in_specs=[blk_scalar_spec, blk_scalar_spec,
                  pl.BlockSpec((6, K1), lambda i, j: (0, 0),
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
        + [pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(oidx, alive, orders, origins, dirs, sc_aabb, seg_aabb, *planes,
      *rec_planes)
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
                 exact_order: bool | None = None):
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
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.exact_order = exact_order
        # optional fused-shade record planes (set_shade_records): each
        # (NL, C) f32, extracted in-kernel for the forward fast path
        self.shade_planes = None

    def set_shade_records(self, records):
        """Install packed per-slot shading records (S, n) — e.g.
        shade.build_slot_records — as (NL, C) planes for the in-kernel
        winning-record epilogue.  S must equal NL * C."""
        NL, C, _ = self.v0.shape
        records = jnp.asarray(records)
        assert records.shape[0] == NL * C, (records.shape, NL, C)
        self.shade_planes = tuple(records[:, k].reshape(NL, C)
                                  for k in range(records.shape[1]))

    @property
    def supports_fused_shade(self):
        return self.use_pallas and self.shade_planes is not None

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
                exact_order=self.exact_order)
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
                exact_order=self.exact_order)[:R]
        else:
            t, _, _, _ = xla_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2,
                self.leaf_aabb[:, 0:3], self.leaf_aabb[:, 3:6])
        return (t < BIG_T) & (t > t_min) & (t < t_max)
