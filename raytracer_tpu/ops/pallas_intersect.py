"""Cluster-grid intersection: Pallas TPU kernel + XLA fallback.

The production closest-hit path (TPU-native successor of the reference
octree traversal, oct_tree_intersector.rs:148-272).  Per 128-ray block:

1. slab-test ALL cluster AABBs against all rays at once (vectorized
   analogue of intersect_cube_inverse_ray,
   oct_tree_intersector.rs:348-372) -> per-(cluster, ray) entry
   distances;
2. walk clusters in approximate front-to-back order (per-block dominant
   direction picks one of six precomputed centroid orders — the ordered
   descent of oct_tree_intersector.rs:176-185);
3. a scalar SMEM gate (cluster's closest possible entry vs the block's
   worst best-hit, and the caller's t-limit) skips most clusters for a
   few scalar ops;
4. surviving clusters run Möller–Trumbore for all (ray, triangle) pairs
   on the VPU in (ray-sublane, triangle-lane) layout with a masked
   closest reduction.  (An MXU scalar-triple reformulation — see
   _build_mt_table — measured SLOWER at these shapes: depth-16 f32
   matmuls waste the 128-deep systolic array; kept for future
   larger-depth batching experiments.)

Shadow queries reuse closest-hit semantics (the reference windows the
*closest* hit, raytracer/mod.rs:224-230) with t_limit=1.0: clusters
entirely beyond the light distance are culled, which provably cannot
change the blocked/unblocked outcome.

`xla_cluster_closest` is the backend-portable (and differentiable)
fallback with identical accept criteria, property-tested against the
brute-force oracle (the reference's NoAccelerationIntersector pattern).

VMEM budget: the triangle SoA planes cost 36 B/triangle padded plus a
(K x 128) entry-distance scratch, so scenes up to ~300k triangles fit
alongside ray blocks.  Larger scenes use the BVH kernel's HBM-resident
streaming mode (ops/pallas_bvh.py, BVHIntersector(stream=True)): planes
stay in ANY/HBM and each visited supercluster's rows are DMA'd into a
small VMEM scratch, overlapped with the slab phase — tested past the
ceiling on a synthetic 400k-triangle scene
(tests/test_pallas_bvh.py::test_bvh_streaming_beyond_vmem_ceiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.intersect import BIG_T, F32_EPSILON
from raytracer_tpu.ops.cluster import build_cluster_grid

RAY_BLOCK = 128

# Rays whose origin magnitude exceeds this are dead-lane sentinels
# (missed-parent bounce rays, padding): every cluster AABB test fails for
# them and fully-dead blocks skip the cluster loop outright.
DEAD_ORIGIN = 1.0e35
_ALIVE_LIMIT = 1.0e30


# --- XLA fallback -----------------------------------------------------------


def _mt_soa(o, d, v0, e1, e2):
    """Möller–Trumbore for all (ray, tri) pairs of a block.

    o, d: (R, 3); v0, e1, e2: (C, 3).  Returns t, u, v (R, C) with
    t = BIG_T where not hit.  Accept criteria identical to
    core.intersect (intersect.rs:62-98)."""
    dd = d[:, None, :]                                   # (R, 1, 3)
    pvec = jnp.cross(dd, e2[None, :, :])                 # (R, C, 3)
    det = jnp.einsum("tc,rtc->rt", e1, pvec)
    non_parallel = jnp.abs(det) >= F32_EPSILON
    inv_det = 1.0 / jnp.where(non_parallel, det, 1.0)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.einsum("rtc,rtc->rt", tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.einsum("rc,rtc->rt", d, qvec) * inv_det
    t = jnp.einsum("tc,rtc->rt", e2, qvec) * inv_det
    hit = (non_parallel & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0))
    return jnp.where(hit, t, BIG_T), u, v


@jax.jit
def xla_cluster_closest(origins, dirs, v0, e1, e2, aabb_min, aabb_max):
    """Scan clusters; skip a cluster when no ray can improve.

    v0/e1/e2: (K, C, 3); aabb_min/max: (K, 3).
    Returns t (R,), u (R,), v (R,), idx (R,) int32 index into the
    *sorted* triangle order (cluster k, lane j -> k*C + j).
    """
    R = origins.shape[0]
    C = v0.shape[1]
    inv_d = 1.0 / dirs                                   # inf on zero comps,
    # like the reference's inverse ray (oct_tree_intersector.rs:241-244)

    def body(carry, blk):
        best_t, best_u, best_v, best_i, k = carry
        v0k, e1k, e2k, bmin, bmax = blk
        t1 = (bmin[None, :] - origins) * inv_d           # (R, 3)
        t2 = (bmax[None, :] - origins) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=1)
        box_hit = (tmax >= tmin) & (tmax > 0.0)          # slab semantics,
        # oct_tree_intersector.rs:366-371
        active = box_hit & (tmin < best_t)

        def do(c):
            bt, bu, bv, bi = c
            t, u, v = _mt_soa(origins, dirs, v0k, e1k, e2k)
            j = jnp.argmin(t, axis=1)
            rows = jnp.arange(R)
            tj, uj, vj = t[rows, j], u[rows, j], v[rows, j]
            better = tj < bt
            idx = (k * C + j).astype(jnp.int32)
            return (jnp.where(better, tj, bt), jnp.where(better, uj, bu),
                    jnp.where(better, vj, bv), jnp.where(better, idx, bi))

        best = jax.lax.cond(jnp.any(active), do, lambda c: c,
                            (best_t, best_u, best_v, best_i))
        return (*best, k + 1), None

    init = (jnp.full((R,), BIG_T), jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.int32),
            jnp.int32(0))
    (t, u, v, i, _), _ = jax.lax.scan(body, init, (v0, e1, e2, aabb_min, aabb_max))
    return t, u, v, i


# --- MXU coefficient table --------------------------------------------------


def _build_mt_table(v0, e1, e2):
    """Per-triangle MXU coefficients: with per-ray L = [o(3), d(3),
    m=o×d(3), 1, 0...] (16,), the products L @ T give, per triangle j:

      col 0..C    u·det   = d·(v0×e2) + m·e2        (scalar triples of
      col C..2C   −v·det  = d·(v0×e1) + m·e1         the Möller–Trumbore
      col 2C..3C  t·det   = o·n − v0·n               system, n = e1×e2,
      col 3C..4C  det     = −d·n                      det = e1·(d×e2))

    v0/e1/e2: (K, C, 3) -> T (K, 16, 4C) float32.
    """
    K, C, _ = v0.shape
    n = np.cross(e1, e2)                       # (K, C, 3)
    q1 = np.cross(v0, e1)
    q2 = np.cross(v0, e2)
    c0 = np.einsum("kcj,kcj->kc", v0, n)       # (K, C)

    T = np.zeros((K, 16, 4 * C), dtype=np.float32)
    tr = lambda a: np.transpose(a, (0, 2, 1))  # (K, C, 3) -> (K, 3, C)
    T[:, 3:6, 0 * C:1 * C] = tr(q2)            # d · q2
    T[:, 6:9, 0 * C:1 * C] = tr(e2)            # m · e2
    T[:, 3:6, 1 * C:2 * C] = tr(q1)            # d · q1
    T[:, 6:9, 1 * C:2 * C] = tr(e1)            # m · e1
    T[:, 0:3, 2 * C:3 * C] = tr(n)             # o · n
    T[:, 9, 2 * C:3 * C] = -c0                 # − v0·n
    T[:, 3:6, 3 * C:4 * C] = tr(-n)            # −d · n
    return T


# --- Pallas kernel ----------------------------------------------------------


def _cluster_kernel(limit,                        # static python float
                    oidx_ref,                     # SMEM (1, nb) int32
                    alive_ref,                    # SMEM (1, nb) int32
                    order_ref,                    # SMEM (6, K)
                    o_ref, d_ref,                 # VMEM (RB, 3)
                    aabb_ref,                     # VMEM (K, 8)
                    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,  # VMEM (K, C)
                    t_out, u_out, v_out, i_out,   # VMEM (8, RB) blocks
                    tent,                         # scratch (K, RB) f32
                    mintent,                      # scratch (K, 1) f32
                    mintent_sm,                   # scratch SMEM (K, 1) f32
                    sem,                          # DMA semaphore
                    bt, bu, bv, bi,               # scratch (RB, 1)
                    maxbest):                     # scratch SMEM (1, 1) f32
    K = aabb_ref.shape[0]
    C = v0x.shape[1]
    RB = o_ref.shape[0]
    row = pl.program_id(1)  # which row of the (8, RB) output block

    o = o_ref[:]
    d = d_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]          # (RB, 1) cols
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    # row layouts for the cluster-major slab phase
    oxr, oyr, ozr = (o[:, 0].reshape(1, RB), o[:, 1].reshape(1, RB),
                     o[:, 2].reshape(1, RB))
    dxr, dyr, dzr = (d[:, 0].reshape(1, RB), d[:, 1].reshape(1, RB),
                     d[:, 2].reshape(1, RB))
    idxr, idyr, idzr = 1.0 / dxr, 1.0 / dyr, 1.0 / dzr

    bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)
    bu[:] = jnp.zeros((RB, 1), jnp.float32)
    bv[:] = jnp.zeros((RB, 1), jnp.float32)
    bi[:] = jnp.zeros((RB, 1), jnp.int32)

    # dead lanes (sentinel origins: padding, masked parents) never find a
    # hit, so they must not hold the block's culling threshold at BIG_T
    alive_row = jnp.abs(ox) < _ALIVE_LIMIT               # (RB, 1) bool

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, C), dimension=1)

    # traversal order + block aliveness are precomputed per block on the
    # XLA side (scalar reductions over row vectors don't lower in Mosaic)
    blk = pl.program_id(0) * 8 + row
    oidx = oidx_ref[0, blk]

    maxbest[0, 0] = jnp.float32(min(BIG_T, limit))

    @pl.when(alive_ref[0, blk] != 0)
    def _():
        # --- phase 1: slab-test every cluster against every ray at once
        # (fully-dead blocks skip this too: only the output writes below
        # run for them, keeping compacted tail blocks nearly free) ---
        minx, miny, minz = aabb_ref[:, 0:1], aabb_ref[:, 1:2], aabb_ref[:, 2:3]
        maxx, maxy, maxz = aabb_ref[:, 3:4], aabb_ref[:, 4:5], aabb_ref[:, 5:6]
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
        # scalar gate per cluster: the closest possible entry over the
        # block, DMA'd into SMEM so the traversal loop reads it as cheap
        # scalars
        mintent[:] = jnp.min(tent[:], axis=1, keepdims=True)   # (K, 1)
        cp = pltpu.make_async_copy(mintent, mintent_sm, sem)
        cp.start()
        cp.wait()

        def mt_cluster(kk, active):
            @pl.when(jnp.any(active))
            def _():
                av0x = v0x[pl.ds(kk, 1), :]                # (1, C)
                av0y = v0y[pl.ds(kk, 1), :]
                av0z = v0z[pl.ds(kk, 1), :]
                ae1x = e1x[pl.ds(kk, 1), :]
                ae1y = e1y[pl.ds(kk, 1), :]
                ae1z = e1z[pl.ds(kk, 1), :]
                ae2x = e2x[pl.ds(kk, 1), :]
                ae2y = e2y[pl.ds(kk, 1), :]
                ae2z = e2z[pl.ds(kk, 1), :]

                # Moller-Trumbore, (RB,1) ray x (1,C) triangle -> (RB,C)
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
                jhot = (tt == tmin_row) & (tmin_row < BIG_T)
                # first-match lane for deterministic tie resolution
                jfirst = jnp.min(jnp.where(jhot, lane, C), axis=1,
                                 keepdims=True)
                sel = lane == jfirst
                uj = jnp.sum(jnp.where(sel, uu, 0.0), axis=1, keepdims=True)
                vj = jnp.sum(jnp.where(sel, vv, 0.0), axis=1, keepdims=True)
                better = tmin_row < bt[:]
                bu[:] = jnp.where(better, uj, bu[:])
                bv[:] = jnp.where(better, vj, bv[:])
                bi[:] = jnp.where(better, kk * C + jfirst, bi[:])
                bt[:] = jnp.where(better, tmin_row, bt[:])
                maxbest[0, 0] = jnp.minimum(
                    jnp.max(jnp.where(alive_row, bt[:], 0.0)),
                    jnp.float32(limit))

        def body(k, _):
            kk = order_ref[oidx, k]

            # cheap scalar gate: can any ray enter this cluster closer
            # than the block's worst best-hit (and the caller's t-limit)?
            @pl.when(mintent_sm[kk, 0] < maxbest[0, 0])
            def _():
                trow = tent[pl.ds(kk, 1), :]               # (1, RB)
                active = trow.reshape(RB, 1) < bt[:]
                mt_cluster(kk, active)
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    t_out[pl.ds(row, 1), :] = bt[:].reshape(1, RB)
    u_out[pl.ds(row, 1), :] = bu[:].reshape(1, RB)
    v_out[pl.ds(row, 1), :] = bv[:].reshape(1, RB)
    i_out[pl.ds(row, 1), :] = bi[:].reshape(1, RB)


@functools.partial(jax.jit, static_argnames=("interpret", "t_limit"))
def pallas_cluster_closest(origins, dirs, v0, e1, e2, aabb, orders,
                           interpret=False, t_limit=None):
    """origins/dirs: (R, 3) with R a multiple of 8*RAY_BLOCK.
    v0/e1/e2: (K, C, 3) sorted triangle SoA;
    aabb: (K, 8) float32 [minx miny minz maxx maxy maxz pad pad];
    orders: (6, K) int32 directional visit orders.
    t_limit: STATIC float — clusters entirely beyond it are culled
    (hits past the limit MAY be missed; the closest hit below it is
    exact).  Static specialization beats a per-ray limit stream, whose
    (R, 1) layout conversions cost more than they save.
    Returns t, u, v (R,) f32 and idx (R,) int32 (sorted order)."""
    R = origins.shape[0]
    K, C, _ = v0.shape
    assert R % RAY_BLOCK == 0
    limit = float(t_limit) if t_limit is not None else float(BIG_T)
    planes = [a[:, :, c] for a in (v0, e1, e2) for c in range(3)]
    tri_spec = pl.BlockSpec((K, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    # TPU output blocks need sublane multiples of 8: view the result as
    # (R/RAY_BLOCK, RAY_BLOCK) rows, written 8 rows per (8, RAY_BLOCK)
    # block — grid = (row-groups, 8), inner dim picks the row.
    nb = R // RAY_BLOCK
    assert nb % 8 == 0
    grid = (nb // 8, 8)

    # per-block traversal order (dominant mean-direction axis, signed)
    # and block aliveness, computed here because Mosaic can't reduce row
    # vectors to scalars
    db = dirs.reshape(nb, RAY_BLOCK, 3)
    s = jnp.sum(db, axis=1)                                    # (nb, 3)
    axis = jnp.argmax(jnp.abs(s), axis=1)                      # (nb,)
    sgn = jnp.take_along_axis(s, axis[:, None], axis=1)[:, 0]
    oidx = (axis * 2 + (sgn < 0.0)).astype(jnp.int32)[None, :]  # (1, nb)
    ob = origins.reshape(nb, RAY_BLOCK, 3)
    alive = jnp.any(jnp.abs(ob[:, :, 0]) < _ALIVE_LIMIT, axis=1)
    alive = alive.astype(jnp.int32)[None, :]                   # (1, nb)

    ray_spec = pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i * 8 + j, 0),
                            memory_space=pltpu.VMEM)
    blk_scalar_spec = pl.BlockSpec((1, nb), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((8, RAY_BLOCK), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.float32),
        jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.float32),
        jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.float32),
        jax.ShapeDtypeStruct((nb, RAY_BLOCK), jnp.int32),
    )
    t, u, v, i = pl.pallas_call(
        functools.partial(_cluster_kernel, limit),
        grid=grid,
        in_specs=[blk_scalar_spec, blk_scalar_spec,
                  pl.BlockSpec((6, K), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  ray_spec, ray_spec,
                  pl.BlockSpec((K, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)] + [tri_spec] * 9,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K, RAY_BLOCK), jnp.float32),
                        pltpu.VMEM((K, 1), jnp.float32),
                        pltpu.SMEM((K, 1), jnp.float32),
                        pltpu.SemaphoreType.DMA(())]
        + [pltpu.VMEM((RAY_BLOCK, 1), jnp.float32)] * 3
        + [pltpu.VMEM((RAY_BLOCK, 1), jnp.int32)]
        + [pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(oidx, alive, orders, origins, dirs, aabb, *planes)
    return t.reshape(R), u.reshape(R), v.reshape(R), i.reshape(R)


# --- intersector facade -----------------------------------------------------


class ClusterIntersector:
    """Production accel structure (see module docstring).  The
    `triangles_per_leaf` knob is the reference's octree leaf size
    (lib.rs:15-27), here the cluster size rounded to a lane multiple."""

    name = "cluster"

    def __init__(self, scene_buffers, triangles_per_leaf: int = 70,
                 use_pallas: bool | None = None):
        grid = build_cluster_grid(np.asarray(scene_buffers.tri_verts),
                                  triangles_per_leaf=triangles_per_leaf)
        self.grid = grid
        self.v0 = jnp.asarray(grid.v0)
        self.e1 = jnp.asarray(grid.e1)
        self.e2 = jnp.asarray(grid.e2)
        self.aabb_min = jnp.asarray(grid.aabb_min)
        self.aabb_max = jnp.asarray(grid.aabb_max)
        aabb8 = np.zeros((grid.num_clusters, 8), np.float32)
        aabb8[:, 0:3] = grid.aabb_min
        aabb8[:, 3:6] = grid.aabb_max
        self.aabb8 = jnp.asarray(aabb8)
        self.orders = jnp.asarray(grid.orders)
        self.perm = jnp.asarray(np.maximum(grid.perm, 0))
        self.leaf_capacity = grid.cluster_size
        lo = grid.aabb_min.min(axis=0)
        hi = grid.aabb_max.max(axis=0)
        self.world_lo = jnp.asarray(lo)
        self.world_inv_span = jnp.asarray(1.0 / np.maximum(hi - lo, 1e-30))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def _closest_sorted(self, origins, dirs, t_limit=None):
        if self.use_pallas:
            R = origins.shape[0]
            pad = (-R) % (8 * RAY_BLOCK)
            if pad:
                # padding rays carry the dead-lane sentinel so fully-dead
                # blocks skip the cluster loop
                origins = jnp.concatenate(
                    [origins,
                     jnp.broadcast_to(jnp.float32(DEAD_ORIGIN), (pad, 3))])
                dirs = jnp.concatenate(
                    [dirs, jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (pad, 3))])
            t, u, v, i = pallas_cluster_closest(
                origins, dirs, self.v0, self.e1, self.e2, self.aabb8,
                self.orders, t_limit=t_limit)
            if pad:
                t, u, v, i = t[:R], u[:R], v[:R], i[:R]
            return t, u, v, i
        # XLA fallback ignores the limit: it returns the true closest
        # hit, a superset of the limited search — identical results for
        # closest queries and for the shadow window check.
        return xla_cluster_closest(origins, dirs, self.v0, self.e1, self.e2,
                                   self.aabb_min, self.aabb_max)

    @staticmethod
    def _mask_dead(origins, dirs, alive):
        """Dead lanes become far-away sentinel rays: every AABB test fails
        and fully-dead blocks skip the whole cluster loop (this path is
        forward-only, so the sentinel can't poison gradients)."""
        if alive is None:
            return origins, dirs
        a = alive[:, None]
        return (jnp.where(a, origins, DEAD_ORIGIN),
                jnp.where(a, dirs, 1.0))

    def query(self, scene, origins, dirs, alive=None, t_limit=None):
        """Generic closest-hit with a STATIC t-limit (shadow queries
        pass the window maximum; closest queries pass None)."""
        origins, dirs = self._mask_dead(origins, dirs, alive)
        t, u, v, i = self._closest_sorted(origins, dirs, t_limit)
        hit = t < BIG_T
        tri = jnp.where(hit, self.perm[i], 0)
        return dict(t=t, u=u, v=v, tri=tri.astype(jnp.int32), hit=hit,
                    slot=jnp.where(hit, i, 0).astype(jnp.int32))

    def closest(self, scene, origins, dirs, alive=None):
        return self.query(scene, origins, dirs, alive=alive)

    def shadow(self, scene, origins, dirs, alive=None, t_min=0.01, t_max=1.0):
        # closest-then-window (mod.rs:224-230).  Culling clusters whose
        # entry exceeds t_max cannot change the outcome: any hit below
        # t_max is found exactly, and a missed farther hit would have
        # been outside the window anyway.
        res = self.query(scene, origins, dirs, alive=alive, t_limit=t_max)
        return res["hit"] & (res["t"] > t_min) & (res["t"] < t_max)
