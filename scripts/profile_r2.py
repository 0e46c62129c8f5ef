"""Round-2 profiling: where does the 65 ms/step go on the real TPU?

Times each stage of the forward path in isolation on thai2.dae:
ray-gen, closest-hit (coherent + incoherent), shadow, sorts, shade,
film update, full step.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rtx
from raytracer_tpu.models.camera import generate_rays

W = H = 1024
TPL = int(os.environ.get("BENCH_TPL", 512))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.2f} ms")
    return dt


def main():
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="cluster", triangles_per_leaf=TPL)
    isect = rt.intersector
    scene = rt.scene_arrays
    cam = rt.camera.params()
    print(f"clusters K={isect.grid.num_clusters} C={isect.grid.cluster_size}")

    # full-frame primary rays, tile-swizzled like the engine
    rt.rows_per_frame = H
    rt._row_block_cache.clear()
    px, py, idx = rt._row_block()
    key = jax.random.PRNGKey(0)
    jitter = jax.random.uniform(key, (px.shape[0], 2), dtype=jnp.float32)
    origins, dirs = generate_rays(cam, px, py, jitter, W, H)
    origins, dirs = jax.block_until_ready((origins, dirs))
    R = origins.shape[0]
    print(f"R = {R}")

    CHUNK = 131072
    alive = jnp.ones((CHUNK,), bool)

    qc = jax.jit(lambda o, d: isect.query(scene, o, d, alive=alive))

    def q_chunked(o, d):
        outs = [qc(o[i:i + CHUNK], d[i:i + CHUNK])
                for i in range(0, o.shape[0], CHUNK)]
        return {k: jnp.concatenate([r[k] for r in outs]) for k in outs[0]}

    q = q_chunked
    dt = timeit("closest 1M coherent primaries", q, origins, dirs, n=3)
    print(f"  -> {R/dt/1e6:.1f} Mqueries/s")

    # incoherent: shuffle rays globally
    perm = np.random.default_rng(0).permutation(R)
    o_sh, d_sh = origins[perm], dirs[perm]
    o_sh, d_sh = jax.block_until_ready((o_sh, d_sh))
    dt = timeit("closest 1M shuffled (worst case)", q, o_sh, d_sh, n=3)
    print(f"  -> {R/dt/1e6:.1f} Mqueries/s")

    # bounce-like: hemisphere dirs from hit points, segment-sorted like wavefront
    res = jax.block_until_ready(q(origins, dirs))
    hitp = origins + res["t"][:, None] * dirs
    hitp = jnp.where(res["hit"][:, None], hitp, origins)
    kd = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    kd = kd / jnp.linalg.norm(kd, axis=1, keepdims=True)
    q2c = jax.jit(lambda o, d, a: isect.query(scene, o, d, alive=a))

    def q2(o, d, a):
        outs = [q2c(o[i:i + CHUNK], d[i:i + CHUNK], a[i:i + CHUNK])
                for i in range(0, o.shape[0], CHUNK)]
        return {k: jnp.concatenate([r[k] for r in outs]) for k in outs[0]}

    halive = res["hit"]
    dt = timeit("closest 1M bounce-like (unsorted)", q2, hitp, kd, halive, n=3)
    print(f"  -> {R/dt/1e6:.1f} Mqueries/s")

    # shadow with t-limit
    qsc = jax.jit(lambda o, d, a: isect.query(scene, o, d, alive=a, t_limit=1.0))

    def qs(o, d, a):
        outs = [qsc(o[i:i + CHUNK], d[i:i + CHUNK], a[i:i + CHUNK])
                for i in range(0, o.shape[0], CHUNK)]
        return {k: jnp.concatenate([r[k] for r in outs]) for k in outs[0]}

    lp = scene.light_pos[0] if hasattr(scene, "light_pos") else jnp.zeros(3)
    sd = lp[None, :] - hitp
    dt = timeit("shadow 1M (t_limit=1)", qs, hitp, sd, halive, n=3)
    print(f"  -> {R/dt/1e6:.1f} Mqueries/s")

    # sorts
    keys32 = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, size=R),
                         jnp.int32)
    f = jax.jit(lambda k: jnp.argsort(k))
    timeit("argsort 1M int32", f, keys32)
    f2 = jax.jit(lambda k: jnp.argsort(k, stable=True))
    timeit("argsort stable 1M int32", f2, keys32)

    # gather/permute
    g = jax.jit(lambda x, p: x[p])
    pj = jnp.asarray(perm, jnp.int32)
    timeit("gather 1M x3 f32 by perm", g, origins, pj)

    # film scatter
    fs = jax.jit(lambda s, i, r: s.at[i].add(r))
    rad = jnp.ones((R, 3), jnp.float32)
    timeit("film scatter-add 1M", fs, rt.film.pixel_sum, idx, rad)

    # full step at current row-block size (50 rows)
    rt2 = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                         accel="cluster", triangles_per_leaf=TPL)
    px2, py2, _ = rt2._row_block()
    k2 = jax.random.PRNGKey(2)
    dt = timeit("full step 50-row block (51200 rays)",
                lambda: rt2._step(scene, cam, px2, py2, k2), n=3)
    print(f"  -> {51200/dt/1e6:.2f} primary Mrays/s equivalent")

    # full step at 128-row blocks (8 steps/frame)
    rt.rows_per_frame = 128
    rt._row_block_cache.clear()
    pxf, pyf, _ = rt._row_block()
    dt = timeit("full step 128-row block (131072 rays)",
                lambda: rt._step(scene, cam, pxf, pyf, k2), n=3)
    print(f"  -> {131072/dt/1e6:.2f} primary Mrays/s equivalent")


if __name__ == "__main__":
    main()
