"""Two-level BVH intersection: Pallas TPU kernel + XLA fallback.

Successor of the flat cluster kernel (ops/pallas_intersect.py) and the
TPU-native replacement of the reference octree traversal (reference:
raytracer_lib/src/raytracer/accel_intersect/oct_tree_intersector.rs:
148-272).  Per RAY_BLOCK-ray block:

1. slab-test every SUPERCLUSTER AABB against all rays at once ->
   per-(supercluster, ray) entry distances; min over the block to SMEM;
2. walk superclusters in approximate front-to-back order (per-block
   dominant direction picks one of six precomputed centroid orders);
3. a scalar gate (supercluster's closest possible entry vs the block's
   worst best-hit and the caller's t-limit) skips most superclusters;
4. surviving superclusters slab-test their G leaf AABBs (one (G, RB)
   vector op), and each leaf is gated by an IN-REGISTER vector->scalar
   reduction — no DMA round-trip — before its Möller–Trumbore pass over
   (ray, triangle) pairs on the VPU.

The second culling level is what round 1 lacked: it cuts triangle tests
per ray by roughly the supercluster/leaf size ratio, and the finer
early-t updates tighten the front-to-back walk.

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


def _bvh_kernel(limit, shadow, G, exact_order, SG,
                oidx_ref,                     # SMEM (1, nb) int32
                alive_ref,                    # SMEM (1, nb) int32
                order_ref,                    # SMEM (6, K1) int32
                o_ref, d_ref,                 # VMEM (RB, 3)
                sc_aabb_ref,                  # VMEM (K1, 8)
                leaf_aabb_ref,                # VMEM (NL, 8)
                v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,  # VMEM (NL, C)
                t_out, u_out, v_out, i_out,   # VMEM (8, RB) blocks
                tent,                         # scratch (K1, RB) f32
                mintent,                      # scratch (K1, 1) f32
                mintent_sm,                   # scratch SMEM (K1, 1) f32
                order_sm,                     # scratch SMEM (K1, 1) int32
                sem,                          # DMA semaphore
                bt, bu, bv, bi,               # scratch (RB, 1)
                maxbest):                     # scratch SMEM (nsub, 1) f32
    K1 = sc_aabb_ref.shape[0]
    C = v0x.shape[1]
    RB = o_ref.shape[0]
    nsub = RB // SG
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
    idxr, idyr, idzr = 1.0 / dxr, 1.0 / dyr, 1.0 / dzr

    bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)
    if not shadow:
        bu[:] = jnp.zeros((RB, 1), jnp.float32)
        bv[:] = jnp.zeros((RB, 1), jnp.float32)
        bi[:] = jnp.zeros((RB, 1), jnp.int32)

    # dead lanes (sentinel origins) never find a hit and must not hold
    # the block's culling threshold at BIG_T
    alive_row = jnp.abs(ox) < _ALIVE_LIMIT               # (RB, 1) bool

    lane = jax.lax.broadcasted_iota(jnp.int32, (SG, C), dimension=1)

    blk = pl.program_id(0) * 8 + row
    oidx = oidx_ref[0, blk]

    for s in range(nsub):
        maxbest[s, 0] = jnp.float32(min(BIG_T, limit))

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

        def mt_leaf(leaf, s):
            """Möller–Trumbore of sub-group `s` (rows [s*SG, (s+1)*SG))
            against leaf `leaf`.  `s` is a compile-time index, `leaf` a
            traced one."""
            sl = slice(s * SG, (s + 1) * SG)
            av0x = v0x[pl.ds(leaf, 1), :]                # (1, C)
            av0y = v0y[pl.ds(leaf, 1), :]
            av0z = v0z[pl.ds(leaf, 1), :]
            ae1x = e1x[pl.ds(leaf, 1), :]
            ae1y = e1y[pl.ds(leaf, 1), :]
            ae1z = e1z[pl.ds(leaf, 1), :]
            ae2x = e2x[pl.ds(leaf, 1), :]
            ae2y = e2y[pl.ds(leaf, 1), :]
            ae2z = e2z[pl.ds(leaf, 1), :]

            # (SG,1) ray x (1,C) triangle -> (SG,C)
            sdx, sdy, sdz = dx[sl], dy[sl], dz[sl]
            sox, soy, soz = ox[sl], oy[sl], oz[sl]
            px = sdy * ae2z - sdz * ae2y
            py = sdz * ae2x - sdx * ae2z
            pz = sdx * ae2y - sdy * ae2x
            det = ae1x * px + ae1y * py + ae1z * pz
            non_par = jnp.abs(det) >= F32_EPSILON
            inv_det = 1.0 / jnp.where(non_par, det, 1.0)
            tvx, tvy, tvz = sox - av0x, soy - av0y, soz - av0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * ae1z - tvz * ae1y
            qy = tvz * ae1x - tvx * ae1z
            qz = tvx * ae1y - tvy * ae1x
            vv = (sdx * qx + sdy * qy + sdz * qz) * inv_det
            tt = (ae2x * qx + ae2y * qy + ae2z * qz) * inv_det
            ok = (non_par & (uu >= 0.0) & (uu <= 1.0)
                  & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= 0.0))
            tt = jnp.where(ok, tt, BIG_T)

            tmin_row = jnp.min(tt, axis=1, keepdims=True)      # (SG, 1)
            better = tmin_row < bt[sl]
            if not shadow:
                jhot = (tt == tmin_row) & (tmin_row < BIG_T)
                jfirst = jnp.min(jnp.where(jhot, lane, C), axis=1,
                                 keepdims=True)
                sel = lane == jfirst
                uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1, keepdims=True)
                vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1, keepdims=True)
                bu[sl] = jnp.where(better, uj, bu[sl])
                bv[sl] = jnp.where(better, vj, bv[sl])
                bi[sl] = jnp.where(better, leaf * C + jfirst, bi[sl])
            bt[sl] = jnp.where(better, tmin_row, bt[sl])
            maxbest[s, 0] = jnp.minimum(
                jnp.max(jnp.where(alive_row[sl], bt[sl], 0.0)),
                jnp.float32(limit))

        def visit(kk):
            # --- leaf-level slab test: one (G, RB) vector op ---
            lb = leaf_aabb_ref[pl.ds(kk * G, G), :]        # (G, 8)
            lminx, lminy, lminz = lb[:, 0:1], lb[:, 1:2], lb[:, 2:3]
            lmaxx, lmaxy, lmaxz = lb[:, 3:4], lb[:, 4:5], lb[:, 5:6]
            sx1, sx2 = (lminx - oxr) * idxr, (lmaxx - oxr) * idxr
            sy1, sy2 = (lminy - oyr) * idyr, (lmaxy - oyr) * idyr
            sz1, sz2 = (lminz - ozr) * idzr, (lmaxz - ozr) * idzr
            smin = jnp.maximum(jnp.maximum(jnp.minimum(sx1, sx2),
                                           jnp.minimum(sy1, sy2)),
                               jnp.minimum(sz1, sz2))
            smax = jnp.minimum(jnp.minimum(jnp.maximum(sx1, sx2),
                                           jnp.maximum(sy1, sy2)),
                               jnp.maximum(sz1, sz2))
            tent2 = jnp.where((smax >= smin) & (smax > 0.0),
                              smin, BIG_T)                 # (G, RB)

            # per-(leaf, sub-group) entry minima: nsub (G, SG) -> (G, 1)
            # reductions + scalar extracts.  The per-leaf block min (for
            # the front-to-back ordering) is the min over the sub-groups.
            msub = [jnp.min(tent2[:, slice(s * SG, (s + 1) * SG)],
                            axis=1, keepdims=True)         # (G, 1)
                    for s in range(nsub)]
            mss = [[m[l, 0] for l in range(G)] for m in msub]  # [nsub][G]
            ms = list(mss[0])
            for s in range(1, nsub):
                ms = [jnp.minimum(a, b) for a, b in zip(ms, mss[s])]
            ls = [jnp.int32(l) for l in range(G)]
            if G == 8:
                # front-to-back leaf order: Batcher odd-even sorting
                # network (19 scalar compare-swaps) so the earliest
                # leaves tighten maxbest before the rest are gated; the
                # per-sub-group minima ride the network as payloads
                for (i, j) in ((0, 1), (2, 3), (4, 5), (6, 7),
                               (0, 2), (1, 3), (4, 6), (5, 7),
                               (1, 2), (5, 6),
                               (0, 4), (1, 5), (2, 6), (3, 7),
                               (2, 4), (3, 5),
                               (1, 2), (3, 4), (5, 6)):
                    swap = ms[i] > ms[j]
                    ms[i], ms[j] = (jnp.where(swap, ms[j], ms[i]),
                                    jnp.where(swap, ms[i], ms[j]))
                    ls[i], ls[j] = (jnp.where(swap, ls[j], ls[i]),
                                    jnp.where(swap, ls[i], ls[j]))
                    for s in range(nsub):
                        mss[s][i], mss[s][j] = (
                            jnp.where(swap, mss[s][j], mss[s][i]),
                            jnp.where(swap, mss[s][i], mss[s][j]))

            for r in range(G):
                leaf = kk * G + ls[r]
                for s in range(nsub):
                    @pl.when(mss[s][r] < maxbest[s, 0])
                    def _(leaf=leaf, s=s):
                        mt_leaf(leaf, s)

        def maxbest_all():
            m = maxbest[0, 0]
            for s in range(1, nsub):
                m = jnp.maximum(m, maxbest[s, 0])
            return m

        if exact_order:
            # walk in exact ascending entry order; the first gate failure
            # ends the whole walk (every later supercluster is farther)
            def wcond(k):
                kk = order_sm[jnp.minimum(k, K1 - 1), 0]
                return (k < K1) & (mintent_sm[kk, 0] < maxbest_all())

            def wbody(k):
                visit(order_sm[k, 0])
                return k + 1

            jax.lax.while_loop(wcond, wbody, 0)
        else:
            def body(k, _):
                kk = order_ref[oidx, k]

                @pl.when(mintent_sm[kk, 0] < maxbest_all())
                def _():
                    visit(kk)
                return 0

            jax.lax.fori_loop(0, K1, body, 0)

    t_out[pl.ds(row, 1), :] = bt[:].reshape(1, RB)
    if not shadow:
        u_out[pl.ds(row, 1), :] = bu[:].reshape(1, RB)
        v_out[pl.ds(row, 1), :] = bv[:].reshape(1, RB)
        i_out[pl.ds(row, 1), :] = bi[:].reshape(1, RB)


@functools.partial(jax.jit, static_argnames=("interpret", "t_limit", "shadow",
                                             "ray_block", "group",
                                             "exact_order", "subgroup"))
def pallas_bvh_closest(origins, dirs, v0, e1, e2, leaf_aabb, sc_aabb, orders,
                       interpret=False, t_limit=None, shadow=False,
                       ray_block=DEFAULT_RAY_BLOCK, group=8,
                       exact_order=None, subgroup=None):
    """origins/dirs: (R, 3) with R a multiple of 8*ray_block.
    v0/e1/e2: (NL, C, 3) packed triangle SoA; leaf_aabb: (NL, 8);
    sc_aabb: (K1, 8) with NL = K1*group; orders: (6, K1) int32.
    t_limit: STATIC float — superclusters/leaves entirely beyond it are
    culled (hits past the limit MAY be missed; the closest hit below it
    is exact).
    subgroup: leaf gating granularity in rays (divides ray_block; default
    = ray_block, i.e. whole-block gating).  Each subgroup of rays gates
    each leaf against its OWN best-hit bound, so one incoherent ray only
    drags its subgroup — not the whole block — into a leaf's
    Möller–Trumbore pass.  Measured on thai2 (v5e): sub-block gating
    LOSES at every granularity (SG=64 ~+8%, SG=32 ~+33%, SG=16 ~+80% on
    sorted bounce rays) — the dir6-sorted blocks are already coherent
    enough that the saved MT volume is smaller than the cost of the
    sub-lane-sliced reductions, extra scalar gates, and the ~35%
    per-ray overhead of (SG, C) MT issues.  Kept as a knob for scenes
    with different coherence profiles.
    Returns t (R,) f32 [, u, v (R,) f32 and idx (R,) int32 packed-slot
    index when not shadow; shadow returns only t]."""
    R = origins.shape[0]
    NL, C, _ = v0.shape
    K1 = sc_aabb.shape[0]
    assert NL == K1 * group
    RB = ray_block
    assert R % RB == 0
    SG = subgroup if subgroup is not None else RB
    assert RB % SG == 0 and SG % 8 == 0
    nsub = RB // SG
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
    kernel = functools.partial(_bvh_kernel, limit, shadow, group, exact_order,
                               SG)

    # shadow mode leaves the u/v/idx outputs unwritten (their buffers are
    # allocated but never read back)
    out_shapes = (
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        jax.ShapeDtypeStruct((nb, RB), jnp.int32),
    )
    t, u, v, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_scalar_spec, blk_scalar_spec,
                  pl.BlockSpec((6, K1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec,
                  pl.BlockSpec((K1, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NL, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)] + [tri_spec] * 9,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K1, RB), jnp.float32),
                        pltpu.VMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.int32),
                        pltpu.SemaphoreType.DMA(())]
        + [pltpu.VMEM((RB, 1), jnp.float32)] * 3
        + [pltpu.VMEM((RB, 1), jnp.int32)]
        + [pltpu.SMEM((nsub, 1), jnp.float32)],
        interpret=interpret,
    )(oidx, alive, orders, origins, dirs, sc_aabb, leaf_aabb, *planes)
    if shadow:
        return t.reshape(R)
    return t.reshape(R), u.reshape(R), v.reshape(R), i.reshape(R)


class BVHIntersector:
    """Production accel structure (see module docstring).  The
    `triangles_per_leaf` knob is the reference's octree leaf size
    (lib.rs:15-27), here the leaf capacity rounded to a lane multiple."""

    name = "bvh"

    def __init__(self, scene_buffers, triangles_per_leaf: int = 128,
                 group: int = 8, ray_block: int = DEFAULT_RAY_BLOCK,
                 use_pallas: bool | None = None,
                 exact_order: bool | None = None,
                 subgroup: int | None = None):
        bvh = build_bvh2(np.asarray(scene_buffers.tri_verts),
                         triangles_per_leaf=triangles_per_leaf, group=group)
        self.bvh = bvh
        self.group = group
        self.ray_block = ray_block
        self.leaf_capacity = bvh.leaf_size
        self.v0 = jnp.asarray(bvh.v0)
        self.e1 = jnp.asarray(bvh.e1)
        self.e2 = jnp.asarray(bvh.e2)
        self.leaf_aabb = jnp.asarray(bvh.leaf_aabb)
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
        self.subgroup = subgroup

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

    def query(self, scene, origins, dirs, alive=None, t_limit=None):
        """Generic closest-hit with a STATIC t-limit."""
        origins, dirs = self._mask_dead(origins, dirs, alive)
        if self.use_pallas:
            origins, dirs, R = self._pad(origins, dirs)
            t, u, v, i = pallas_bvh_closest(
                origins, dirs, self.v0, self.e1, self.e2, self.leaf_aabb,
                self.sc_aabb, self.orders, t_limit=t_limit,
                ray_block=self.ray_block, group=self.group,
                exact_order=self.exact_order, subgroup=self.subgroup)
            t, u, v, i = t[:R], u[:R], v[:R], i[:R]
        else:
            t, u, v, i = xla_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2,
                self.leaf_aabb[:, 0:3], self.leaf_aabb[:, 3:6])
        hit = t < BIG_T
        tri = jnp.where(hit, self.perm[i], 0)
        return dict(t=t, u=u, v=v, tri=tri.astype(jnp.int32), hit=hit,
                    slot=jnp.where(hit, i, 0).astype(jnp.int32))

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
                origins, dirs, self.v0, self.e1, self.e2, self.leaf_aabb,
                self.sc_aabb, self.orders, t_limit=t_max, shadow=True,
                ray_block=self.ray_block, group=self.group,
                exact_order=self.exact_order, subgroup=self.subgroup)[:R]
        else:
            t, _, _, _ = xla_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2,
                self.leaf_aabb[:, 0:3], self.leaf_aabb[:, 3:6])
        return (t < BIG_T) & (t > t_min) & (t < t_max)
