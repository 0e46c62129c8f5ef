"""Sweep the packed-BVH shape knobs — row width (TPL -> C), segments per
row, rows per supercluster — on real thai2 ray mixes (coherent primary
L0 and sorted bounce L1), timing the production kernel on chip.

Usage: python scripts/sweep_pack.py [combos as TPL,SEG,G ...]
Default sweeps the cross product TPL x SEG x G below.
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
from raytracer_tpu.core.sampler import hemisphere_from_gaussian
from raytracer_tpu.core.shade import geometric_normal
from raytracer_tpu.core.wavefront import _sort_key, _sort_rays
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.ops.pallas_bvh import BVHIntersector, DEAD_ORIGIN


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

    base = rt.intersector
    q0 = base.query(scene, o0, d0)
    hitp = o0 + jnp.where(q0["hit"], q0["t"], 0.0)[:, None] * d0
    g = jax.random.normal(kt, (2 * R, 3), jnp.float32)
    n0 = geometric_normal(scene.tri_verts, q0["tri"])
    c1d = hemisphere_from_gaussian(g, jnp.repeat(n0, 2, axis=0))
    c1o = jnp.repeat(hitp, 2, axis=0) + 1e-5 * c1d
    c1a = jnp.repeat(q0["hit"], 2, axis=0)
    skey = _sort_key(base, c1o, c1d, c1a)
    orig = jnp.arange(2 * R, dtype=jnp.int32)
    s1o, s1d, s1a, _, _ = _sort_rays(skey, c1o, c1d, c1a, orig, [])
    s1o = jnp.where(s1a[:, None], s1o, DEAD_ORIGIN)
    s1d = jnp.where(s1a[:, None], s1d, 1.0)

    ref_t = None
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    else:
        combos = [(tpl, seg, grp)
                  for tpl in (128, 256)
                  for seg in (2, 4, 8)
                  for grp in (4, 8)]
    for (tpl, seg, grp) in combos:
        isect = BVHIntersector(rt.scene_buffers, triangles_per_leaf=tpl,
                               seg=seg, group=grp)
        NL = isect.v0.shape[0]
        K1 = isect.sc_aabb.shape[0]
        t0c = timeit(lambda: isect.query(scene, o0, d0))
        t1c = timeit(lambda: isect.query(scene, s1o, s1d))
        t1s = timeit(lambda: isect.shadow(scene, s1o, s1d))
        tt = np.asarray(isect.query(scene, o0, d0)["t"])
        if ref_t is None:
            ref_t = tt
        # min-reductions are exact and partition-independent, so t can
        # be compared exactly; u/v/idx tie-breaking depends on packing
        agree = "agree" if (ref_t == tt).all() else "DISAGREE"
        print(f"TPL={tpl:3d} S={seg} G={grp}  NL={NL:4d} K1={K1:3d}  "
              f"L0c {t0c*1e3:7.2f} ms  L1c {t1c*1e3:7.2f} ms  "
              f"L1s {t1s*1e3:7.2f} ms  [{agree}]", flush=True)


if __name__ == "__main__":
    main()
