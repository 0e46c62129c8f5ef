"""Benchmark sweep: leaf-size (cluster-size) tuning harness.

Successor of the reference's collect.ps1 (reference: collect.ps1:1-14),
which swept `--max_triangles` over {5,10,...,100} at 50 frame
iterations and appended results to result.txt.  Here the same knob is
the cluster size; the sweep measures steady-state primary rays/s per
setting and writes result.txt plus a JSON summary.

Usage: python scripts/collect.py [--scene data/thai2.dae] [--width 512]
       [--height 512] [--iters 12] [--values 128 256 512 1024]
       [--accel bvh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/thai2.dae")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--values", type=int, nargs="+",
                    default=[128, 256, 512, 1024])
    ap.add_argument("--accel", default="bvh",
                    help="production default; 'cluster' for the round-1 grid")
    ap.add_argument("--out", default="result.txt")
    args = ap.parse_args()

    import jax
    import raytracer_tpu as rtx

    rows = []
    for tpl in args.values:
        rt = rtx.create_raytracer_from_file(
            args.scene, width=args.width, height=args.height,
            accel=args.accel, triangles_per_leaf=tpl)
        rt.trace_frame_additive()               # compile + warm
        jax.block_until_ready(rt.film.pixel_sum)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.iters):
            n += rt.trace_frame_additive()
        jax.block_until_ready(rt.film.pixel_sum)
        dt = time.perf_counter() - t0
        rays_per_sec = n / dt
        line = (f"max_triangles={tpl} frames={args.iters} "
                f"rays_per_sec={rays_per_sec:.0f}")
        print(line)
        rows.append({"max_triangles": tpl, "rays_per_sec": rays_per_sec})

    with open(args.out, "a") as f:
        for r in rows:
            f.write(f"{r['max_triangles']}\t{r['rays_per_sec']:.0f}\n")
    best = max(rows, key=lambda r: r["rays_per_sec"])
    print(json.dumps({"best": best, "sweep": rows}))


if __name__ == "__main__":
    main()
