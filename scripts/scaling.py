"""Scaling-efficiency harness: rays/s/device across mesh sizes.

Measures the BASELINE.md target "≥85% rays/s scaling efficiency 1 chip
→ N" by rendering a fixed per-device workload (weak scaling, the
default) or a fixed total frame (strong scaling) on meshes of
{1,2,4,...} devices and reporting rays/s, rays/s/device, and efficiency
relative to the 1-device run.

Weak mode holds each device's shard CONSTANT across mesh sizes: the
frame geometry is fixed at the largest size, and a mesh of n devices
renders exactly the first n row-major shards of it — device k always
renders shard k, so adding devices adds work without changing any
device's content (no framing confound; round-3 review item).

Generalizes the reference's row-cursor decomposition of the pixel
domain (reference: raytracer_lib/src/raytracer/mod.rs:87-115) to a
device mesh: pixels shard over the `rays` axis, the scene replicates,
and the film moments accumulate on device (parallel/render.py).

On a CPU host, pass --virtual 8 to fan out over XLA virtual devices
(functional validation of the sharded path; the numbers only mean
something on a real multi-chip slice).  On a real slice, run one
process per host with the standard multi-host bring-up first — see
docs/SCALING.md for the protocol.

Usage:
  python scripts/scaling.py [--virtual 8] [--sizes 1 2 4 8]
      [--scene data/thai2.dae] [--pixels-per-device 65536]
      [--mode weak|strong] [--iters 5] [--spp 1] [--accel bvh]

Prints one JSON line with the sweep and the 1→max efficiency.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (validation mode)")
    ap.add_argument("--sizes", type=int, nargs="+", default=None)
    ap.add_argument("--scene", default="data/thai2.dae")
    ap.add_argument("--pixels-per-device", type=int, default=65536)
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--accel", default="bvh")
    ap.add_argument("--recursions", type=int, default=2)
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import raytracer_tpu as rtx
    from raytracer_tpu.parallel.mesh import make_mesh
    from raytracer_tpu.parallel.render import (_per_device_keys,
                                               make_sharded_frame_loop,
                                               pixel_grid)

    n_avail = len(jax.devices())
    sizes = args.sizes or [s for s in (1, 2, 4, 8, 16, 32) if s <= n_avail]

    # one fixed frame sized to the largest mesh; strong mode renders all
    # of it at every size, weak mode renders its first n shards
    total = args.pixels_per_device * max(sizes)
    W = 1 << (math.ceil(math.log2(math.sqrt(total))))
    H = max(total // W, 1)

    rt = rtx.create_raytracer_from_file(args.scene, width=W, height=H,
                                        accel=args.accel,
                                        recursions=args.recursions)
    records, has_tex, fused = rt._shade_fast_args()
    fused_spawn = bool(getattr(rt.intersector, "supports_fused_spawn",
                               False))

    rows = []
    for n in sizes:
        mesh = make_mesh(n)
        frame = make_sharded_frame_loop(
            mesh, rt.intersector, W, H, rt.recursions, rt.spread,
            shade_records=records, has_textures=has_tex,
            fused_shade=fused, fused_spawn=fused_spawn)
        px, py, real = pixel_grid(W, H, pad_to=n)
        if args.mode == "weak":
            real = args.pixels_per_device * n
            px, py = px[:real], py[:real]
        pxj, pyj = jnp.asarray(px), jnp.asarray(py)
        spp = jnp.int32(args.spp)

        keys = _per_device_keys(rt._next_key(), mesh)
        out = frame(rt.scene_arrays, rt.camera.params(), pxj, pyj, keys, spp)
        jax.block_until_ready(out)            # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            keys = _per_device_keys(rt._next_key(), mesh)
            out = frame(rt.scene_arrays, rt.camera.params(), pxj, pyj,
                        keys, spp)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        rays = real * args.spp
        rows.append({
            "devices": n, "width": W, "height": H,
            "mrays_per_s": rays / dt / 1e6,
            "mrays_per_s_per_device": rays / dt / 1e6 / n,
        })
        print(f"devices={n:3d}  {W}x{H}  "
              f"{rows[-1]['mrays_per_s']:.3f} Mrays/s  "
              f"{rows[-1]['mrays_per_s_per_device']:.3f} Mrays/s/dev",
              file=sys.stderr, flush=True)

    base = rows[0]["mrays_per_s_per_device"]
    for r in rows:
        r["efficiency_vs_1"] = r["mrays_per_s_per_device"] / base
    print(json.dumps({
        "mode": args.mode, "scene": args.scene, "accel": args.accel,
        "backend": jax.default_backend(),
        "sweep": rows,
        "efficiency_1_to_max": rows[-1]["efficiency_vs_1"],
    }))


if __name__ == "__main__":
    main()
