"""Compare bounce-ray sort keys (dir6 vs dirmajor) by timing the
production BVH kernel on the resulting L1 ray orders (thai2, real
chip).  Query-level: avoids the ~8 min whole-frame tunnel compile.

Round-4 result (recorded in docs/DESIGN.md section 6): a parent-row-major
"leafdir" key measured 168.6 ms vs dir6's 149.9 on L1 closest; the mode
was deleted in round 5."""
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
from raytracer_tpu.core.sampler import hemisphere_from_gaussian
from raytracer_tpu.core.shade import geometric_normal
from raytracer_tpu.core.wavefront import _sort_key, _sort_rays
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.ops.pallas_bvh import DEAD_ORIGIN


def timeit(fn, n=5):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    W = H = 1024
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="bvh")
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

    q0 = isect.query(scene, o0, d0)
    hitp = o0 + jnp.where(q0["hit"], q0["t"], 0.0)[:, None] * d0
    g = jax.random.normal(kt, (2 * R, 3), jnp.float32)
    n0 = geometric_normal(scene.tri_verts, q0["tri"])
    c1d = hemisphere_from_gaussian(g, jnp.repeat(n0, 2, axis=0))
    c1o = jnp.repeat(hitp, 2, axis=0) + 1e-5 * c1d
    c1a = jnp.repeat(q0["hit"], 2, axis=0)
    orig = jnp.arange(2 * R, dtype=jnp.int32)

    for mode in ("dir6", "dirmajor"):
        skey = _sort_key(isect, c1o, c1d, c1a, mode=mode)
        s1o, s1d, s1a, _, _ = _sort_rays(skey, c1o, c1d, c1a, orig, [])
        s1o = jnp.where(s1a[:, None], s1o, DEAD_ORIGIN)
        s1d = jnp.where(s1a[:, None], s1d, 1.0)
        t1c = timeit(lambda: isect.query(scene, s1o, s1d))
        t1s = timeit(lambda: isect.shadow(scene, s1o, s1d))
        print(f"{mode:9s}  L1c {t1c*1e3:7.2f} ms   L1shadow {t1s*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
