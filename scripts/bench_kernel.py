"""Microbenchmark for the cluster intersection kernel.

Records every acceleration-structure query issued by one real engine
step on thai2 (primary closest hit, per-level shadow batches, bounce
closest hits — the reference fan-out of raytracer/mod.rs:132-176), then
times the Pallas kernel on each recorded workload in isolation.

Usage:  python scripts/bench_kernel.py [--tpl 512] [--rows 50] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


class RecordingIsect:
    """Wraps an intersector, recording (origins, dirs, alive, t_limit)."""

    def __init__(self, inner):
        self.inner = inner
        self.queries = []

    def query(self, scene, origins, dirs, alive=None, t_limit=None):
        self.queries.append((np.asarray(origins), np.asarray(dirs),
                             None if alive is None else np.asarray(alive),
                             t_limit))
        return self.inner.query(scene, origins, dirs, alive=alive,
                                t_limit=t_limit)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpl", type=int, default=512)
    ap.add_argument("--rows", type=int, default=50)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--scene", default="data/thai2.dae")
    ap.add_argument("--size", type=int, nargs=2, default=(1024, 1024))
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracer_tpu.core.intersectors import make_intersector
    from raytracer_tpu.core.wavefront import trace_radiance
    from raytracer_tpu.models.camera import generate_rays
    from raytracer_tpu.models.collada import ColladaLoader
    from raytracer_tpu.core.engine import RayTracer

    W, H = args.size
    scene = ColladaLoader.from_file(args.scene, width=W, height=H,
                                    verbose=False)
    rt = RayTracer(scene, W, H, accel="cluster",
                   triangles_per_leaf=args.tpl, rows_per_frame=args.rows)
    dev = rt.scene_arrays
    cam = rt.camera.params()
    isect = rt.intersector
    print(f"grid: K={isect.grid.num_clusters} C={isect.grid.cluster_size} "
          f"N={isect.grid.num_triangles}", file=sys.stderr)

    px, py, _ = rt._row_block()
    px, py = jnp.asarray(px), jnp.asarray(py)
    key = jax.random.PRNGKey(0)
    kj, kt = jax.random.split(key)
    jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
    origins, dirs = generate_rays(cam, px, py, jitter, W, H)

    rec = RecordingIsect(isect)
    trace_radiance(dev, origins, dirs, kt, rec, 2, 1)  # eager: records all

    labels = ["closest L0", "shadow L0", "closest L1", "shadow L1",
              "closest L2", "shadow L2"]
    # actual order of queries in trace_radiance:
    #   closest L0 | shadow L0, closest L1 | shadow L1, closest L2 | shadow L2
    order = [0, 1, 2, 3, 4, 5]

    def time_jitted(fn, *a):
        """Best-of-3 batches of `reps` calls of a jitted fn."""
        r = fn(*a)
        jax.block_until_ready(r)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                r = fn(*a)
            jax.block_until_ready(r)
            dt = min(dt, (time.perf_counter() - t0) / args.reps)
        return dt

    # -- per-query timings, each query as one jitted fn -------------------
    rows = []
    for qi, lab in zip(order, labels):
        o, d, alive, t_limit = rec.queries[qi]
        o, d = jnp.asarray(o), jnp.asarray(d)
        al = None if alive is None else jnp.asarray(alive)

        @jax.jit
        def one(o, d, al):
            return isect.query(dev, o, d, alive=al, t_limit=t_limit)["t"]

        dt = time_jitted(one, o, d, al)
        if alive is not None:
            nalive = int(alive.sum())
            pad = (-len(alive)) % 1024
            ab = np.concatenate([alive, np.zeros(pad, bool)])
            nblk = int(ab.reshape(-1, 128).any(axis=1).sum())
        else:
            nalive = o.shape[0]
            nblk = (o.shape[0] + 127) // 128
        rows.append((lab, o.shape[0], nalive, nblk, dt))

    for lab, n, nalive, nblk, dt in rows:
        print(f"{lab:12s} R={n:7d} alive={nalive:7d} blk={nblk:4d} "
              f"{dt*1e3:8.3f} ms {nalive/dt/1e6:8.2f} M-alive-rays/s")

    # -- composite: all six queries in ONE jit (the production shape) -----
    qs = [(jnp.asarray(o), jnp.asarray(d),
           None if a is None else jnp.asarray(a), tl)
          for o, d, a, tl in (rec.queries[qi] for qi in order)]

    @jax.jit
    def run_all():
        acc = 0.0
        for o, d, a, tl in qs:
            acc += jnp.sum(isect.query(dev, o, d, alive=a, t_limit=tl)["t"])
        return acc

    dt = time_jitted(run_all)
    prim = rows[0][1]
    print(f"COMPOSITE {dt*1e3:.3f} ms/step -> {prim/dt/1e6:.3f} M primary "
          f"rays/s (isect only, one jit)")


if __name__ == "__main__":
    main()
