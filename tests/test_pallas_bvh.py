"""Interpret-mode tests for the production two-level BVH Pallas kernel
(ops/pallas_bvh.py) against the brute-force oracle — the reference's own
oracle pattern (no_acceleration_intersector.rs as ground truth).

Covers every kernel code path the engine ships with: closest hit,
shadow mode, static t-limit culling, dead (sentinel-origin) blocks,
exact per-block ordering on/off (insertion-sort walk vs dominant-axis
fori_loop walk), and the Batcher leaf ordering (any compare-swap bug
would surface as a wrong closest hit through a loosened maxbest gate).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.intersect import BIG_T, closest_hit
from raytracer_tpu.ops.bvh import build_bvh2
from raytracer_tpu.ops.pallas_bvh import BVHIntersector, pallas_bvh_closest
from raytracer_tpu.ops.pallas_intersect import DEAD_ORIGIN


def random_scene(n=600, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, size=(n, 1, 3))
    tris = base + rng.uniform(-0.8, 0.8, size=(n, 3, 3))
    return tris.astype(np.float32)


def random_rays(r=1024, seed=4):
    """Mixed ray population: origins inside and around the scene, random
    directions — some hit, some miss, some start inside geometry."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    return o, d


def build(tris, tpl=128, group=8):
    bvh = build_bvh2(tris, triangles_per_leaf=tpl, group=group)
    args = (jnp.asarray(bvh.v0), jnp.asarray(bvh.e1), jnp.asarray(bvh.e2),
            jnp.asarray(bvh.seg_aabb), jnp.asarray(bvh.sc_aabb),
            jnp.asarray(bvh.orders))
    return bvh, args


def run_kernel(o, d, args, **kw):
    return pallas_bvh_closest(jnp.asarray(o), jnp.asarray(d), *args,
                              interpret=True, **kw)


def assert_matches_brute(tris, bvh, t, u, v, i, o, d, mask=None):
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    bt, bhit = np.asarray(brute["t"]), np.asarray(brute["hit"])
    t = np.asarray(t)
    if mask is None:
        mask = np.ones(len(t), bool)
    hit = t < BIG_T
    np.testing.assert_array_equal(hit[mask], bhit[mask])
    sel = mask & hit
    np.testing.assert_allclose(t[sel], bt[sel], rtol=1e-5)
    # triangle identity through the packed-slot permutation
    np.testing.assert_array_equal(bvh.perm[np.asarray(i)[sel]],
                                  np.asarray(brute["tri"])[sel])
    np.testing.assert_allclose(np.asarray(u)[sel],
                               np.asarray(brute["u"])[sel],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[sel],
                               np.asarray(brute["v"])[sel],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("exact_order", [True, False])
def test_bvh_closest_matches_brute(exact_order):
    """Multi-supercluster scene so both walk orders actually reorder."""
    tris = random_scene(3000, seed=5)
    o, d = random_rays(1024, seed=6)
    bvh, args = build(tris, tpl=128)
    assert bvh.num_superclusters > 1
    t, u, v, i = run_kernel(o, d, args, exact_order=exact_order)
    assert_matches_brute(tris, bvh, t, u, v, i, o, d)


def test_bvh_single_supercluster():
    tris = random_scene(300, seed=7)
    o, d = random_rays(1024, seed=8)
    bvh, args = build(tris, tpl=128)
    t, u, v, i = run_kernel(o, d, args)
    assert_matches_brute(tris, bvh, t, u, v, i, o, d)


def test_bvh_t_limit_exact_below_limit():
    """Hits at t <= limit must be exact; beyond the limit the kernel may
    cull (returns are unspecified there, per the contract)."""
    tris = random_scene(1500, seed=9)
    o, d = random_rays(1024, seed=10)
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    bt = np.asarray(brute["t"])
    limit = float(np.median(bt[bt < BIG_T]))
    bvh, args = build(tris, tpl=128)
    for exact_order in (True, False):
        t, u, v, i = run_kernel(o, d, args, t_limit=limit,
                                exact_order=exact_order)
        below = bt <= limit * 0.999
        np.testing.assert_allclose(np.asarray(t)[below], bt[below], rtol=1e-5)
        # and nothing below the limit is invented
        fabricated = (np.asarray(t) < bt * 0.999) & below
        assert not fabricated.any()


def test_bvh_shadow_mode_matches_closest_t():
    """Shadow mode must return the same (windowed-culled) min t the full
    kernel finds: occlusion = closest hit inside (t_min, t_max),
    mod.rs:224-230 semantics are applied by the caller."""
    tris = random_scene(1500, seed=11)
    o, d = random_rays(1024, seed=12)
    bvh, args = build(tris, tpl=128)
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    bt, bhit = np.asarray(brute["t"]), np.asarray(brute["hit"])
    for exact_order in (True, False):
        ts = np.asarray(run_kernel(o, d, args, t_limit=1.0, shadow=True,
                                   exact_order=exact_order))
        want = bhit & (bt > 0.01) & (bt < 1.0)
        got = (ts < BIG_T) & (ts > 0.01) & (ts < 1.0)
        np.testing.assert_array_equal(got, want)


def test_bvh_dead_blocks_skipped():
    """Blocks of sentinel-origin rays must come back all-miss (the alive
    gate skips them outright)."""
    tris = random_scene(600, seed=13)
    o, d = random_rays(2048, seed=14)
    # kill the second 1024-ray super-block entirely + a few lanes of the
    # first (per-lane deadness inside a live block)
    o[1024:] = DEAD_ORIGIN
    d[1024:] = 1.0
    o[100:200] = DEAD_ORIGIN
    d[100:200] = 1.0
    bvh, args = build(tris, tpl=128)
    t, u, v, i = run_kernel(o, d, args)
    t = np.asarray(t)
    assert (t[1024:] == BIG_T).all()
    assert (t[100:200] == BIG_T).all()
    live = np.ones(2048, bool)
    live[1024:] = False
    live[100:200] = False
    assert_matches_brute(tris, bvh, t, u, v, i, o, d, mask=live)


def test_bvh_axis_parallel_rays_zero_direction():
    """The reference unit-tests slab behavior for axis-parallel rays
    whose 1/d is inf (oct_tree_intersector.rs:485-492).  The kernel's
    guarded inverse must not NaN-cull when a zero direction component
    meets an origin exactly on an AABB plane.

    Geometry: a unit quad (two triangles) in the z=1 plane spanning
    [0,1]x[0,1].  Its AABB planes are x=0, x=1, y=0, y=1, z=1."""
    tris = np.array([
        [[0, 0, 1], [1, 0, 1], [0, 1, 1]],
        [[1, 0, 1], [1, 1, 1], [0, 1, 1]],
    ], np.float32)
    bvh, args = build(tris, tpl=128)
    o = np.array([
        [0.25, 0.25, 0.0],   # straight +z hit; dx=dy=0, origin x/y inside
        [0.0, 0.25, 0.0],    # origin exactly ON the x=0 box plane, dx=0
        [0.0, 0.0, 0.0],     # origin on BOTH x=0 and y=0 planes
        [1.0, 1.0, 0.0],     # origin on both max planes
        [2.0, 0.25, 0.0],    # outside the slab, axis-parallel -> miss
        [0.25, 0.25, 1.0],   # origin ON the z=1 plane shooting along it
    ], np.float32)
    d = np.array([
        [0, 0, 1],
        [0, 0, 1],
        [0, 0, 1],
        [0, 0, 1],
        [0, 0, 1],
        [1, 0, 0],
    ], np.float32)
    pad = 1024 - len(o)
    o = np.concatenate([o, np.full((pad, 3), DEAD_ORIGIN, np.float32)])
    d = np.concatenate([d, np.ones((pad, 3), np.float32)])
    for exact_order in (True, False):
        t, u, v, i = run_kernel(o, d, args, exact_order=exact_order)
        t = np.asarray(t)
        np.testing.assert_allclose(t[:4], 1.0, rtol=1e-6)
        assert t[4] == BIG_T
        # ray 5 grazes exactly in the triangle plane; brute agreement is
        # all that is required (degenerate det -> reference rejects too)
        brute = closest_hit(jnp.asarray(o[5:6]), jnp.asarray(d[5:6]),
                            jnp.asarray(tris))
        assert (t[5] < BIG_T) == bool(np.asarray(brute["hit"])[0])
        assert not np.isnan(t[:6]).any()


def test_bvh_fused_shade_records_match_gather():
    """The in-kernel winning-record epilogue (rec_planes) must return
    exactly records[slot] for hits and zeros for misses — the gather it
    replaces (shade.prepare_shade_fast's records[hit["slot"]])."""
    tris = random_scene(1200, seed=21)
    o, d = random_rays(1024, seed=22)
    bvh, args = build(tris, tpl=128)
    rng = np.random.default_rng(23)
    S = bvh.num_leaves * bvh.leaf_size
    records = rng.random((S, 6)).astype(np.float32)
    planes = tuple(jnp.asarray(records[:, k].reshape(bvh.num_leaves,
                                                     bvh.leaf_size))
                   for k in range(6))
    t, u, v, i, *recs = run_kernel(o, d, args, rec_planes=planes)
    t, i = np.asarray(t), np.asarray(i)
    hit = t < BIG_T
    got = np.stack([np.asarray(r) for r in recs], axis=1)
    np.testing.assert_array_equal(got[hit], records[i[hit]])
    assert (got[~hit] == 0).all()
    # and the winning slot agrees with brute force
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    np.testing.assert_array_equal(bvh.perm[i[hit]],
                                  np.asarray(brute["tri"])[hit])


def test_bvh_intersector_end_to_end_interpret():
    """The full BVHIntersector (padding, dead-masking, perm mapping,
    windowed shadow) through the Pallas path in interpret mode."""
    tris = random_scene(900, seed=15)
    o, d = random_rays(500, seed=16)          # deliberately unaligned

    class _SB:                                 # minimal buffers shim
        tri_verts = tris
    isect = BVHIntersector(_SB, triangles_per_leaf=128, use_pallas=True)
    alive = np.ones(500, bool)
    alive[50:80] = False
    scene = None
    with pltpu.force_tpu_interpret_mode():
        got = isect.query(scene, jnp.asarray(o), jnp.asarray(d),
                          alive=jnp.asarray(alive))
        sh = isect.shadow(scene, jnp.asarray(o), jnp.asarray(d),
                          alive=jnp.asarray(alive))
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    bt, bhit = np.asarray(brute["t"]), np.asarray(brute["hit"])
    ghit = np.asarray(got["hit"])
    np.testing.assert_array_equal(ghit[alive], bhit[alive])
    assert not ghit[~alive].any()
    sel = alive & ghit
    np.testing.assert_allclose(np.asarray(got["t"])[sel], bt[sel], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["tri"])[sel],
                                  np.asarray(brute["tri"])[sel])
    want_sh = bhit & (bt > 0.01) & (bt < 1.0) & alive
    np.testing.assert_array_equal(np.asarray(sh), want_sh)


def test_bvh_streaming_matches_resident():
    """HBM-streaming mode (stream=True: triangle planes in ANY/HBM,
    per-supercluster DMA) must return exactly what the VMEM-resident
    kernel returns."""
    tris = random_scene(3000, seed=31)
    o, d = random_rays(1024, seed=32)
    bvh, args = build(tris, tpl=128)
    t0, u0, v0_, i0 = run_kernel(o, d, args)
    t1, u1, v1, i1 = run_kernel(o, d, args, stream=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    ts = np.asarray(run_kernel(o, d, args, t_limit=1.0, shadow=True,
                               stream=True))
    tr = np.asarray(run_kernel(o, d, args, t_limit=1.0, shadow=True))
    np.testing.assert_array_equal(ts, tr)


def test_bvh_streaming_with_record_planes():
    """Round 5: streaming mode carries the shading-record planes (they
    DMA alongside the triangle rows), so >VMEM-ceiling scenes keep the
    in-kernel winning-record epilogue.  Must match the VMEM-resident
    kernel exactly, including the record outputs."""
    tris = random_scene(3000, seed=31)
    o, d = random_rays(1024, seed=32)
    bvh, args = build(tris, tpl=128)
    rng = np.random.default_rng(41)
    S = bvh.num_leaves * bvh.leaf_size
    records = rng.random((S, 6)).astype(np.float32)
    planes = tuple(jnp.asarray(records[:, k].reshape(bvh.num_leaves,
                                                     bvh.leaf_size))
                   for k in range(6))
    res0 = run_kernel(o, d, args, rec_planes=planes)
    res1 = run_kernel(o, d, args, rec_planes=planes, stream=True)
    assert len(res0) == 4 + 6
    for a, b in zip(res0, res1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bvh_streaming_beyond_vmem_ceiling():
    """A synthetic scene larger than the ~300k-triangle VMEM-resident
    ceiling (ops/pallas_intersect.py budget note): 400k triangles only
    render in streaming mode; correctness vs brute on a ray subset.

    The scene is a 2-D field of small floor tiles; rays shoot straight
    down from above, so the exact-order walk visits O(1) superclusters
    per block and interpret mode stays fast."""
    n = 400_000
    rng = np.random.default_rng(33)
    side = int(np.sqrt(n)) + 1
    ij = np.arange(n)
    cx = (ij % side).astype(np.float32)
    cy = (ij // side).astype(np.float32)
    tris = np.zeros((n, 3, 3), np.float32)
    tris[:, 0] = np.stack([cx, cy, np.zeros_like(cx)], 1)
    tris[:, 1] = np.stack([cx + 0.9, cy, np.zeros_like(cx)], 1)
    tris[:, 2] = np.stack([cx, cy + 0.9, np.zeros_like(cx)], 1)
    bvh, args = build(tris, tpl=128)
    r = 256
    o = np.stack([rng.uniform(0, side, r), rng.uniform(0, side / 2, r),
                  np.full(r, 5.0)], 1).astype(np.float32)
    d = np.tile(np.array([[0.001, 0.002, -1.0]], np.float32), (r, 1))
    o = np.concatenate([o, np.full((1024 - r, 3), DEAD_ORIGIN, np.float32)])
    d = np.concatenate([d, np.ones((1024 - r, 3), np.float32)])
    t, u, v, i = run_kernel(o, d, args, stream=True)
    brute = closest_hit(jnp.asarray(o[:r]), jnp.asarray(d[:r]),
                        jnp.asarray(tris), chunk=4096)
    bt, bhit = np.asarray(brute["t"]), np.asarray(brute["hit"])
    t = np.asarray(t)[:r]
    np.testing.assert_array_equal(t < BIG_T, bhit)
    sel = bhit
    np.testing.assert_allclose(t[sel], bt[sel], rtol=1e-5)
    np.testing.assert_array_equal(bvh.perm[np.asarray(i)[:r][sel]],
                                  np.asarray(brute["tri"])[sel])
