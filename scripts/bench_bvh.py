"""Correctness + throughput sweep for the two-level BVH kernel vs the
round-1 cluster kernel and the brute-force oracle.

Usage: python scripts/bench_bvh.py [quick]
env: SWEEP_TPL, SWEEP_RB (comma lists)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rtx
from raytracer_tpu.core.intersect import closest_hit, BIG_T
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.ops.pallas_bvh import BVHIntersector

W = H = 1024


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def check_correct(isect, scene, sb, n=8192):
    """Compare closest + shadow vs the brute-force oracle on a ray mix."""
    rng = np.random.default_rng(0)
    lo = np.asarray(sb.tri_verts).reshape(-1, 3).min(axis=0)
    hi = np.asarray(sb.tri_verts).reshape(-1, 3).max(axis=0)
    span = hi - lo
    o = jnp.asarray(lo + rng.random((n, 3)) * span * 1.4 - 0.2 * span,
                    jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    got = isect.query(scene, o, d)
    want = closest_hit(o, d, scene.tri_verts)
    t_ok = np.allclose(np.asarray(got["t"]), np.asarray(want["t"]),
                       rtol=1e-4, atol=1e-5)
    hit_ok = np.array_equal(np.asarray(got["hit"]), np.asarray(want["hit"]))
    tri_ok = np.mean(np.asarray(got["tri"]) == np.asarray(want["tri"]))
    sh_got = np.asarray(isect.shadow(scene, o, d))
    sh_want = np.asarray(want["hit"] & (want["t"] > 0.01) & (want["t"] < 1.0))
    sh_ok = np.mean(sh_got == sh_want)
    return t_ok, hit_ok, float(tri_ok), float(sh_ok)


def main():
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="cluster", triangles_per_leaf=512)
    scene, sb = rt.scene_arrays, rt.scene_buffers
    cam = rt.camera.params()
    rt.rows_per_frame = H
    rt._row_block_cache.clear()
    px, py, _ = rt._row_block()
    key = jax.random.PRNGKey(0)
    jitter = jax.random.uniform(key, (px.shape[0], 2), dtype=jnp.float32)
    origins, dirs = generate_rays(cam, px, py, jitter, W, H)
    origins, dirs = jax.block_until_ready((origins, dirs))
    R = origins.shape[0]
    CHUNK = 131072

    # bounce-like rays from primary hit points
    res0 = rt.intersector.query(scene, origins[:CHUNK], dirs[:CHUNK])
    hitp = origins[:CHUNK] + res0["t"][:, None] * dirs[:CHUNK]
    hitp = jnp.where(res0["hit"][:, None], hitp, origins[:CHUNK])
    bd = jax.random.normal(jax.random.PRNGKey(1), (CHUNK, 3))
    bd = bd / jnp.linalg.norm(bd, axis=1, keepdims=True)
    halive = res0["hit"]

    tpls = [int(x) for x in os.environ.get("SWEEP_TPL", "128,256").split(",")]
    rbs = [int(x) for x in os.environ.get("SWEEP_RB", "64,128").split(",")]

    for tpl in tpls:
        for rb in rbs:
            isect = BVHIntersector(sb, triangles_per_leaf=tpl, ray_block=rb)
            tag = f"bvh tpl={tpl} rb={rb} K1={isect.bvh.num_superclusters}"
            c = check_correct(isect, scene, sb)
            print(f"{tag}: t_ok={c[0]} hit_ok={c[1]} tri={c[2]:.4f} "
                  f"shadow={c[3]:.4f}", flush=True)

            qc = jax.jit(lambda o, d, i=isect: i.query(scene, o, d))
            dt = timeit(lambda: [qc(origins[i:i + CHUNK], dirs[i:i + CHUNK])
                                 for i in range(0, R, CHUNK)])
            print(f"  coherent closest : {R/dt/1e6:8.1f} Mq/s", flush=True)

            qb = jax.jit(lambda o, d, a, i=isect: i.query(scene, o, d, alive=a))
            dt = timeit(lambda: qb(hitp, bd, halive))
            print(f"  bounce closest   : {CHUNK/dt/1e6:8.1f} Mq/s", flush=True)

            from raytracer_tpu.core.wavefront import _sort_key, _sort_rays

            def sorted_query(o, d, a, i=isect):
                skey = _sort_key(i, o, d, a)
                orig = jnp.arange(o.shape[0], dtype=jnp.int32)
                o, d, a, orig, _ = _sort_rays(skey, o, d, a, orig, [])
                return i.query(scene, o, d, alive=a)

            qbs = jax.jit(sorted_query)
            dt = timeit(lambda: qbs(hitp, bd, halive))
            print(f"  bounce sorted(+sort cost): {CHUNK/dt/1e6:6.1f} Mq/s",
                  flush=True)

            qs = jax.jit(lambda o, d, a, i=isect: i.shadow(scene, o, d, alive=a))
            lp = scene.light_pos[0]
            sd = lp[None, :] - hitp
            dt = timeit(lambda: qs(hitp, sd, halive))
            print(f"  shadow           : {CHUNK/dt/1e6:8.1f} Mq/s", flush=True)


if __name__ == "__main__":
    main()
