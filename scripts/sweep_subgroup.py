"""Sweep the leaf-gating subgroup size (and leaf capacity) of the BVH
kernel on real thai2 ray mixes: coherent primaries (L0) and sorted
bounce rays (L1), closest + shadow modes.

Usage: python scripts/sweep_subgroup.py [TPL ...]
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
from raytracer_tpu.ops import pallas_bvh as pb
from raytracer_tpu.ops.pallas_bvh import BVHIntersector

W = H = 1024


import functools

from raytracer_tpu.ops.pallas_bvh import pallas_bvh_closest


@functools.partial(jax.jit, static_argnames=("isect", "shadow", "n"))
def _kernel_loop(o, d, isect, shadow, n):
    """n chained kernel calls on device; each iteration's origins carry a
    zero-valued dependency on the previous result so XLA can neither
    hoist the call out of the loop nor elide iterations.  One fetch at
    the end -> tunnel latency amortizes away."""
    lim = (1.0, True) if shadow else (None, False)

    def body(i, carry):
        o_, acc = carry
        r = pallas_bvh_closest(o_, d, isect.v0, isect.e1, isect.e2,
                               isect.leaf_aabb, isect.sc_aabb, isect.orders,
                               t_limit=lim[0], shadow=lim[1],
                               ray_block=isect.ray_block, group=isect.group,
                               exact_order=isect.exact_order,
                               subgroup=isect.subgroup)
        t = r if shadow else r[0]
        acc = acc + t[0]
        return o_ + 0.0 * acc, acc

    _, acc = jax.lax.fori_loop(0, n, body, (o, jnp.float32(0.0)))
    return acc


def timeit_kernel(o, d, isect, shadow=False, n=10):
    pad = (-o.shape[0]) % (8 * isect.ray_block)
    if pad:
        from raytracer_tpu.ops.pallas_bvh import DEAD_ORIGIN
        o = jnp.concatenate(
            [o, jnp.broadcast_to(jnp.float32(DEAD_ORIGIN), (pad, 3))])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (pad, 3))])
    np.asarray(_kernel_loop(o, d, isect, shadow, n))        # warm + compile
    t0 = time.perf_counter()
    np.asarray(_kernel_loop(o, d, isect, shadow, n))
    return (time.perf_counter() - t0) / n


def main():
    tpls = [int(a) for a in sys.argv[1:]] or [128, 256]
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=W, height=H,
                                        accel="bvh", triangles_per_leaf=256)
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

    isect0 = rt.intersector
    q0 = isect0.query(scene, o0, d0)
    hitp = o0 + jnp.where(q0["hit"], q0["t"], 0.0)[:, None] * d0
    g = jax.random.normal(kt, (2 * R, 3), jnp.float32)
    n0 = geometric_normal(scene.tri_verts, q0["tri"])
    c1d = hemisphere_from_gaussian(g, jnp.repeat(n0, 2, axis=0))
    c1o = jnp.repeat(hitp, 2, axis=0) + 1e-5 * c1d
    c1a = jnp.repeat(q0["hit"], 2, axis=0)
    skey = _sort_key(isect0, c1o, c1d, c1a)
    orig = jnp.arange(2 * R, dtype=jnp.int32)
    s1o, s1d, s1a, _, _ = _sort_rays(skey, c1o, c1d, c1a, orig, [])
    s1o = jnp.where(s1a[:, None], s1o, pb.DEAD_ORIGIN)
    s1d = jnp.where(s1a[:, None], s1d, 1.0)
    # shadow rays from the sorted L1 hit points toward light 0
    lp = scene.light_pos[0]
    q1 = isect0.query(scene, s1o, s1d)
    hp1 = s1o + jnp.where(q1["hit"], q1["t"], 0.0)[:, None] * s1d
    sh_d = lp[None, :] - hp1
    sh_a = s1a & q1["hit"]

    ref = None
    combos = [(tpl, rb, sg) for tpl in tpls
              for rb, sg in ((128, 128), (256, 128), (512, 128), (256, 256))]
    for tpl, rb, sg in combos:
        isect = BVHIntersector(rt.scene_buffers, triangles_per_leaf=tpl,
                               ray_block=rb, subgroup=sg)
        t0c = timeit_kernel(o0, d0, isect)
        t1c = timeit_kernel(s1o, s1d, isect)
        sh_dm = jnp.where(sh_a[:, None], sh_d, 1.0)
        sh_om = jnp.where(sh_a[:, None], hp1, pb.DEAD_ORIGIN)
        t1s = timeit_kernel(sh_om, sh_dm, isect, shadow=True)
        tt = np.asarray(isect.query(scene, s1o, s1d)["t"])
        if ref is None:
            ref = tt
        ok = bool((ref == tt).all())
        print(f"TPL={tpl:4d} RB={rb:4d} SG={sg:4d}: "
              f"L0 closest {t0c*1e3:7.2f} ms  "
              f"L1 closest {t1c*1e3:7.2f} ms  L1 shadow {t1s*1e3:7.2f} ms"
              f"  agree={ok}", flush=True)


if __name__ == "__main__":
    main()
