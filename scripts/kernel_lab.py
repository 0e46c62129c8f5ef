"""Kernel lab: on-chip cost model for the BVH traversal kernel.

Measures the primitive costs that bound any block-walk design on this
chip, plus live visit/MT counters on the production kernel, so kernel
redesigns are driven by data instead of guesses:

  mt              — Möller–Trumbore of a 128-ray block against N rows
                    of C triangles at full and sub-block (SG, C) issue
                    widths, no gating (pure vector throughput)
  counters        — per-block supercluster visits and row MTs of the
                    production kernel on real thai2 L0/L1 ray mixes

Usage: python scripts/kernel_lab.py [mt|counters|all]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracer_tpu.core.intersect import BIG_T, F32_EPSILON

RB = 128


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])     # force a real fetch
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- mt --

def _mt_kernel(NLEAF, SG, o_ref, d_ref, v0x, v0y, v0z, e1x, e1y, e1z,
               e2x, e2y, e2z, t_out, bt):
    C = v0x.shape[1]
    nsub = RB // SG
    row = pl.program_id(1)
    o = o_ref[:]
    d = d_ref[:]
    bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)

    def body(leaf, _):
        for g in range(nsub):
            sl = slice(g * SG, (g + 1) * SG)
            ox, oy, oz = o[sl, 0:1], o[sl, 1:2], o[sl, 2:3]
            dx, dy, dz = d[sl, 0:1], d[sl, 1:2], d[sl, 2:3]
            av0x = v0x[pl.ds(leaf, 1), :]
            av0y = v0y[pl.ds(leaf, 1), :]
            av0z = v0z[pl.ds(leaf, 1), :]
            ae1x = e1x[pl.ds(leaf, 1), :]
            ae1y = e1y[pl.ds(leaf, 1), :]
            ae1z = e1z[pl.ds(leaf, 1), :]
            ae2x = e2x[pl.ds(leaf, 1), :]
            ae2y = e2y[pl.ds(leaf, 1), :]
            ae2z = e2z[pl.ds(leaf, 1), :]
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
            tmin_row = jnp.min(tt, axis=1, keepdims=True)
            bt[sl] = jnp.minimum(bt[sl], tmin_row)
        return 0

    jax.lax.fori_loop(0, NLEAF, body, 0)
    t_out[pl.ds(row, 1), :] = bt[:].reshape(1, RB)


@functools.partial(jax.jit, static_argnames=("nleaf", "sg", "c"))
def mt_bench(o, d, planes, nleaf, sg, c):
    nb = o.shape[0] // RB
    ray_spec = pl.BlockSpec((RB, 3), lambda i, j: (i * 8 + j, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(planes[0].shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mt_kernel, nleaf, sg),
        grid=(nb // 8, 8),
        in_specs=[ray_spec, ray_spec] + [tri_spec] * 9,
        out_specs=pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, RB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RB, 1), jnp.float32)],
    )(o, d, *planes)


def run_mt():
    rng = np.random.default_rng(0)
    R = 128 * 1024                       # 1K blocks
    o = jnp.asarray(rng.random((R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    for C in (128, 256):
        NL = 80 if C == 256 else 160
        planes = [jnp.asarray(rng.random((NL, C)), jnp.float32)
                  for _ in range(9)]
        for nleaf in (8, 32):
            for sg in (128, 32, 16, 8):
                dt = timeit(mt_bench, o, d, planes, nleaf, sg, C)
                per_block = dt / (R // RB) * 1e6
                per_mt = per_block / nleaf / (RB // sg)
                print(f"C={C:4d} leaves={nleaf:3d} SG={sg:4d}: "
                      f"{per_block:8.2f} us/block  {per_mt:7.3f} us/(SG,C) MT"
                      f"  ({R*nleaf*C/dt/1e9:8.1f} G raytri/s)", flush=True)


# -------------------------------------------------------------- walk --

def run_counters():
    """Production kernel with visit/MT counters, on real thai2 rays."""
    import raytracer_tpu as rtx
    from raytracer_tpu.core.wavefront import _sort_key, _sort_rays
    from raytracer_tpu.models.camera import generate_rays
    from raytracer_tpu.ops.pallas_bvh import BVHIntersector
    from raytracer_tpu.ops import pallas_bvh as pb

    W = H = 1024
    TPL = int(os.environ.get("BENCH_TPL", 256))
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="bvh", triangles_per_leaf=TPL)
    isect = rt.intersector
    scene = rt.scene_arrays
    cam = rt.camera.params()
    rt.rows_per_frame = H
    rt._row_block_cache.clear()
    px, py, _ = rt._row_block()
    key = jax.random.PRNGKey(0)
    kj, kt = jax.random.split(key)
    jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
    o0, d0 = generate_rays(cam, px, py, jitter, W, H)
    R = o0.shape[0]

    # L1-like rays: spawn from hits, sorted exactly like the frame path.
    # KL_POOL > 1 pools that many samples' L1 rays into ONE sort — the
    # round-5 spp-pooled wavefront — so the counters quantify how much
    # a denser key population tightens the 128-ray blocks.
    POOL = int(os.environ.get("KL_POOL", 1))
    from raytracer_tpu.core.sampler import hemisphere_from_gaussian
    from raytracer_tpu.core.shade import geometric_normal
    parts = []
    for si in range(POOL):
        ks = jax.random.fold_in(key, si)
        kjs, kts = jax.random.split(ks)
        jit_s = jax.random.uniform(kjs, (px.shape[0], 2), dtype=jnp.float32)
        o0s, d0s = generate_rays(cam, px, py, jit_s, W, H)
        q0 = isect.query(scene, o0s, d0s)
        hitp = o0s + jnp.where(q0["hit"], q0["t"], 0.0)[:, None] * d0s
        g = jax.random.normal(kts, (2 * R, 3), jnp.float32)
        n0 = geometric_normal(scene.tri_verts, q0["tri"])
        c1d = hemisphere_from_gaussian(g, jnp.repeat(n0, 2, axis=0))
        c1o = jnp.repeat(hitp, 2, axis=0) + 1e-5 * c1d
        c1a = jnp.repeat(q0["hit"], 2, axis=0)
        parts.append((c1o, c1d, c1a))
    c1o = jnp.concatenate([p[0] for p in parts])
    c1d = jnp.concatenate([p[1] for p in parts])
    c1a = jnp.concatenate([p[2] for p in parts])
    skey = _sort_key(isect, c1o, c1d, c1a)
    orig = jnp.arange(2 * R * POOL, dtype=jnp.int32)
    s1o, s1d, s1a, _, _ = _sort_rays(skey, c1o, c1d, c1a, orig, [])
    s1o = jnp.where(s1a[:, None], s1o, pb.DEAD_ORIGIN)
    s1d = jnp.where(s1a[:, None], s1d, 1.0)

    for tag, (o, d) in (("L0 coherent", (o0, d0)),
                        (f"L1 sorted x{POOL}", (s1o, s1d))):
        v, m, alive_blocks, dt = counted_walk(o, d, isect)
        print(f"{tag}: blocks={len(v)} alive={alive_blocks}  "
              f"visits/blk mean={v.mean():.2f} p90={np.percentile(v,90):.0f} "
              f" leafMT/blk mean={m.mean():.2f} p90={np.percentile(m,90):.0f}"
              f" max={m.max()}", flush=True)
        nb = len(v)
        print(f"   walk: {dt*1e3:7.2f} ms  {dt/nb*1e6:6.2f} us/block "
              f" ({o.shape[0]/dt/1e6:6.1f} Mq/s; counter overhead incl.)",
              flush=True)


def counted_walk(origins, dirs, isect):
    """Copy of the production walk emitting per-block counters.  Ray
    I/O is PLANE form, like the fused kernels: packed (R, 3) operands
    tile-pad 3 -> 128 lanes on TPU (a 42.7x HBM expansion that OOMs at
    pooled sizes)."""
    from raytracer_tpu.ops.pallas_bvh import _ALIVE_LIMIT

    v0, e1, e2 = isect.v0, isect.e1, isect.e2
    seg_aabb, sc_aabb, orders = isect.seg_aabb, isect.sc_aabb, isect.orders
    NL, C, _ = v0.shape
    K1 = sc_aabb.shape[0]
    G = isect.group
    S = seg_aabb.shape[0] // NL
    R = origins.shape[0]
    pad = (-R) % (8 * RB)
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e16, jnp.float32)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
    Rp = origins.shape[0]
    nb = Rp // RB
    planes = [a[:, :, c] for a in (v0, e1, e2) for c in range(3)]
    o_planes = [origins[:, k].reshape(nb, RB) for k in range(3)]
    d_planes = [dirs[:, k].reshape(nb, RB) for k in range(3)]

    alive = jnp.any(jnp.abs(o_planes[0]) < _ALIVE_LIMIT, axis=1)

    def kernel(order_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               sc_aabb_ref,
               seg_aabb_ref, v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
               cnt_out, tent, mintent, mintent_sm, order_sm, sem,
               bt, maxbest, nv_sm, nm_sm):
        row = pl.program_id(1)
        rows = tuple(r[pl.ds(row, 1), :]
                     for r in (ox_ref, oy_ref, oz_ref,
                               dx_ref, dy_ref, dz_ref))
        oxr, oyr, ozr, dxr, dyr, dzr = rows
        ox, oy, oz, dx, dy, dz = (r.reshape(RB, 1) for r in rows)
        from raytracer_tpu.ops.pallas_bvh import _safe_inv
        idxr, idyr, idzr = _safe_inv(dxr), _safe_inv(dyr), _safe_inv(dzr)
        bt[:] = jnp.full((RB, 1), BIG_T, jnp.float32)
        alive_row = jnp.abs(ox) < _ALIVE_LIMIT
        maxbest[0, 0] = jnp.float32(BIG_T)
        nv_sm[0, 0] = 0
        nm_sm[0, 0] = 0
        # in-kernel block aliveness, like the production kernels
        alive_blk = jnp.max(jnp.where(alive_row, 1, 0))

        @pl.when(alive_blk != 0)
        def _():
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
            mintent[:] = jnp.min(tent[:], axis=1, keepdims=True)
            cp = pltpu.make_async_copy(mintent, mintent_sm, sem)
            cp.start()
            cp.wait()

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

            def mt_leaf(leaf):
                nm_sm[0, 0] = nm_sm[0, 0] + 1
                av0x = v0x[pl.ds(leaf, 1), :]
                av0y = v0y[pl.ds(leaf, 1), :]
                av0z = v0z[pl.ds(leaf, 1), :]
                ae1x = e1x[pl.ds(leaf, 1), :]
                ae1y = e1y[pl.ds(leaf, 1), :]
                ae1z = e1z[pl.ds(leaf, 1), :]
                ae2x = e2x[pl.ds(leaf, 1), :]
                ae2y = e2y[pl.ds(leaf, 1), :]
                ae2z = e2z[pl.ds(leaf, 1), :]
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
                tmin_row = jnp.min(tt, axis=1, keepdims=True)
                better = tmin_row < bt[:]
                bt[:] = jnp.where(better, tmin_row, bt[:])
                maxbest[0, 0] = jnp.max(jnp.where(alive_row, bt[:], 0.0))

            def visit(kk):
                nv_sm[0, 0] = nv_sm[0, 0] + 1
                lb = seg_aabb_ref[pl.ds(kk * (G * S), G * S), :]
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
                tent2 = jnp.where((smax >= smin) & (smax > 0.0), smin, BIG_T)
                mseg = jnp.min(tent2, axis=1, keepdims=True)
                for l in range(G):
                    m = mseg[l * S, 0]
                    for sgi in range(1, S):
                        m = jnp.minimum(m, mseg[l * S + sgi, 0])
                    @pl.when(m < maxbest[0, 0])
                    def _(l=l):
                        mt_leaf(kk * G + l)

            def wcond(k):
                kk = order_sm[jnp.minimum(k, K1 - 1), 0]
                return (k < K1) & (mintent_sm[kk, 0] < maxbest[0, 0])

            def wbody(k):
                visit(order_sm[k, 0])
                return k + 1

            jax.lax.while_loop(wcond, wbody, 0)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        cnt_out[pl.ds(row, 1), :] = jnp.where(
            lanes == 0, nv_sm[0, 0],
            jnp.where(lanes == 1, nm_sm[0, 0], 0))

    grid = (nb // 8, 8)
    pspec = pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((NL, C), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((6, K1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pspec] * 6
        + [pl.BlockSpec((K1, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((NL * S, 8), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)] + [tri_spec] * 9,
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K1, RB), jnp.float32),
                        pltpu.VMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.float32),
                        pltpu.SMEM((K1, 1), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.VMEM((RB, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.int32)],
    )
    run = jax.jit(call)
    cnt = np.asarray(run(orders, *o_planes, *d_planes,
                         sc_aabb, seg_aabb, *planes))
    dt = timeit(lambda: run(orders, *o_planes, *d_planes,
                            sc_aabb, seg_aabb, *planes))
    return cnt[:, 0], cnt[:, 1], int(np.asarray(alive).sum()), dt


def run_phases():
    """Per-block cost of the walk's FIXED phases, each isolated in a
    minimal kernel over the same grid shape the production kernel uses
    (1024 blocks x 8 rows): the VMEM->SMEM mintent DMA round-trip, a
    76-op scalar select chain (the row sort network's cost shape), the
    K1-supercluster slab phase, and an empty baseline.  Attributes the
    gap between pure-MT cost and the production per-block time."""
    from raytracer_tpu.ops.pallas_bvh import _SORT_NET
    rng = np.random.default_rng(0)
    K1 = 10
    nb = 8192
    o = jnp.asarray(rng.random((nb, RB)), jnp.float32)

    def make(kind):
        def kernel(o_ref, out_ref, tent, mintent, mintent_sm, sem, acc_sm):
            row = pl.program_id(1)
            x = o_ref[pl.ds(row, 1), :]
            if kind == "slab":
                # K1-box slab-ish arithmetic: ~6 mul + 6 minmax rows
                t = x * 1.0001
                for _ in range(K1):
                    t = jnp.maximum(t * 0.999, x)
                out_ref[pl.ds(row, 1), :] = t
            elif kind == "dma":
                mintent[:] = jnp.broadcast_to(x[0, 0:1], (K1, 1))
                cp = pltpu.make_async_copy(mintent, mintent_sm, sem)
                cp.start()
                cp.wait()
                out_ref[pl.ds(row, 1), :] = x + mintent_sm[0, 0]
            elif kind == "scalars":
                # 19-comparator x 4-select scalar chain (row sort shape)
                ms = [x[0, j] for j in range(8)]
                ls = [jnp.int32(j) for j in range(8)]
                for (i, j) in _SORT_NET_8:
                    swap = ms[i] > ms[j]
                    ms[i], ms[j] = (jnp.where(swap, ms[j], ms[i]),
                                    jnp.where(swap, ms[i], ms[j]))
                    ls[i], ls[j] = (jnp.where(swap, ls[j], ls[i]),
                                    jnp.where(swap, ls[i], ls[j]))
                s = ms[0]
                for v in ms[1:]:
                    s = s + v
                out_ref[pl.ds(row, 1), :] = x + s
            elif kind == "reduce8":
                # 8 full vector->scalar reductions (the vectorized
                # per-row segment-min shape)
                s = jnp.float32(0)
                for l in range(8):
                    s = s + jnp.min(x * (1.0 + l))
                out_ref[pl.ds(row, 1), :] = x + s
            else:  # empty
                out_ref[pl.ds(row, 1), :] = x
        return kernel

    _SORT_NET_8 = _SORT_NET[8]
    for kind in ("empty", "slab", "dma", "scalars", "reduce8"):
        call = pl.pallas_call(
            make(kind),
            grid=(nb // 8, 8),
            in_specs=[pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, RB), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, RB), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K1, RB), jnp.float32),
                            pltpu.VMEM((K1, 1), jnp.float32),
                            pltpu.SMEM((K1, 1), jnp.float32),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SMEM((1, 1), jnp.float32)],
        )
        run = jax.jit(call)
        dt = timeit(lambda: run(o))
        print(f"phase {kind:8s}: {dt/nb*1e6:7.3f} us/block "
              f"({dt*1e3:7.2f} ms total)", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("mt", "all"):
        run_mt()
    if what in ("counters", "all"):
        run_counters()
    if what in ("phases", "all"):
        run_phases()
