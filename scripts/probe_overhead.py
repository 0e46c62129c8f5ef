"""Probe fixed per-block overhead of the cluster kernel: time a fully
dead workload (every block skipped) vs a fully alive coherent one."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.core.engine import RayTracer
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.models.collada import ColladaLoader

R = int(os.environ.get("R", 102400))
REPS = int(os.environ.get("REPS", 50))

scene = ColladaLoader.from_file("data/thai2.dae", width=1024, height=1024,
                                verbose=False)
rt = RayTracer(scene, 1024, 1024, accel="cluster", triangles_per_leaf=512)
isect = rt.intersector
dev = rt.scene_arrays


def timeit(label, o, d, alive, t_limit=None):
    r = isect.query(dev, o, d, alive=alive, t_limit=t_limit)
    jax.block_until_ready(r["t"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = isect.query(dev, o, d, alive=alive, t_limit=t_limit)
        jax.block_until_ready(r["t"])
        best = min(best, (time.perf_counter() - t0) / REPS)
    nb = R // 128
    print(f"{label:24s} {best*1e3:8.3f} ms  ({best/nb*1e6:6.2f} us/block)")
    return best


dead = jnp.zeros((R,), dtype=bool)
o = jnp.zeros((R, 3), jnp.float32)
d = jnp.ones((R, 3), jnp.float32)
timeit("all dead", o, d, dead)

# coherent primary rays
px = jnp.asarray(np.tile(np.arange(320, dtype=np.int32), R // 320))
py = jnp.asarray(np.repeat(np.arange(R // 320, dtype=np.int32), 320))
jit2 = jnp.zeros((R, 2), jnp.float32) + 0.5
oo, dd = generate_rays(rt.camera.params(), px, py, jit2, 1024, 1024)
timeit("all alive coherent", oo, dd, None)
timeit("alive, t_limit=1", oo, dd, None, t_limit=1.0)

# 1 alive block at the head, rest dead
alive1 = jnp.arange(R) < 128
timeit("1 alive block", oo, dd, alive1)
