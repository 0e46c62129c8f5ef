"""Stage-by-stage timing of one full 1024x1024 thai2 frame with the BVH
intersector: raygen, per-level closest/shadow/shade/sort, radiance folds.
Each stage is jitted separately and timed with block_until_ready.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rtx
from raytracer_tpu.core.shade import (build_slot_records, finish_shade,
                                      prepare_shade, prepare_shade_fast)
from raytracer_tpu.core.sampler import sample_hemisphere
from raytracer_tpu.core.wavefront import _sort_key, HIT_OFFSET, SHADOW_T_MAX, SHADOW_T_MIN
from raytracer_tpu.models.camera import generate_rays

W = H = 1024
TPL = int(os.environ.get("BENCH_TPL", 128))


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="bvh", triangles_per_leaf=TPL)
    isect = rt.intersector
    scene = rt.scene_arrays
    cam = rt.camera.params()
    rt.rows_per_frame = H
    rt._row_block_cache.clear()
    px, py, _ = rt._row_block()
    key = jax.random.PRNGKey(0)

    def raygen(cam, key):
        kj, kt = jax.random.split(key)
        jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
        return generate_rays(cam, px, py, jitter, W, H)

    o0, d0 = timeit("raygen 1M", jax.jit(raygen), cam, key)
    R = o0.shape[0]

    q0 = timeit("closest L0 (1M coherent)",
                jax.jit(lambda o, d: isect.query(scene, o, d)), o0, d0)

    records = build_slot_records(scene, isect.perm, isect.perm.shape[0])

    ctx0 = timeit("prepare_shade L0 (slow)",
                  jax.jit(lambda o, d, h: prepare_shade(scene, o, d, h)),
                  o0, d0, q0)
    ctx0 = timeit("prepare_shade_fast L0",
                  jax.jit(lambda o, d, h: prepare_shade_fast(
                      scene, o, d, h, records, False)), o0, d0, q0)

    sa0 = ctx0["shadow_alive"]
    bl0 = timeit("shadow L0 (1M)",
                 jax.jit(lambda c, a: isect.shadow(
                     scene, c["shadow_origins"], c["shadow_dirs"], alive=a,
                     t_min=SHADOW_T_MIN, t_max=SHADOW_T_MAX)), ctx0, sa0)

    L = int(ctx0["num_lights"])
    fs = jax.jit(lambda c, b: finish_shade(scene, dict(c, num_lights=L), b))
    timeit("finish_shade L0", fs, ctx0, bl0)

    # spawn level-1 children
    def spawn(ctx, hit, key, b):
        n_rep = jnp.repeat(ctx["normal"], b, axis=0)
        hp_rep = jnp.repeat(ctx["hit_point"], b, axis=0)
        child_d = sample_hemisphere(key, n_rep)
        child_o = hp_rep + HIT_OFFSET * child_d
        alive = jnp.repeat(hit["hit"], b, axis=0)
        return child_o, child_d, alive

    c1o, c1d, c1a = timeit("spawn L1 (2M)",
                           jax.jit(lambda c, h, k: spawn(c, h, k, 2)),
                           ctx0, q0, jax.random.PRNGKey(1))

    def sort1(o, d, a):
        skey = _sort_key(isect, o, d, a)
        perm = jnp.argsort(skey)
        return perm, jnp.argsort(perm)

    perm1, inv1 = timeit("sort L1 keys+argsort x2 (2M)",
                         jax.jit(sort1), c1o, c1d, c1a)

    def apply_perm(o, d, a, p):
        return o[p], d[p], a[p]

    s1o, s1d, s1a = timeit("permute L1 rays (2M gathers)",
                           jax.jit(apply_perm), c1o, c1d, c1a, perm1)

    q1s = timeit("closest L1 sorted (2M)",
                 jax.jit(lambda o, d, a: isect.query(scene, o, d, alive=a)),
                 s1o, s1d, s1a)
    q1u = timeit("closest L1 UNSORTED (2M)",
                 jax.jit(lambda o, d, a: isect.query(scene, o, d, alive=a)),
                 c1o, c1d, c1a)

    ctx1 = timeit("prepare_shade_fast L1 (2M)",
                  jax.jit(lambda o, d, h: prepare_shade_fast(
                      scene, o, d, h, records, False)), s1o, s1d, q1s)
    sa1 = ctx1["shadow_alive"] & jnp.tile(s1a, 1)
    timeit("shadow L1 sorted (2M)",
           jax.jit(lambda c, a: isect.shadow(
               scene, c["shadow_origins"], c["shadow_dirs"], alive=a,
               t_min=SHADOW_T_MIN, t_max=SHADOW_T_MAX)), ctx1, sa1)

    rad = jnp.ones((2 * R, 3), jnp.float32)
    timeit("radiance fold (2M gather + reshape-sum)",
           jax.jit(lambda r, i: r[i].reshape(R, 2, 3).sum(axis=1)), rad, inv1)


if __name__ == "__main__":
    main()
