"""Headline benchmark: primary-ray throughput on thai2.dae (BASELINE
config #4: the 20k-triangle BVH/intersection stress scene).

Measures full forward rendering — jittered ray-gen, cluster-accelerated
closest-hit, Phong shading with shadow rays, two bounce levels
(RECURSIONS=2 / SUB_SPREAD=1 parity), film accumulation — on one chip,
and reports primary Mrays/s (the reference's own metric:
raytracer_lib/src/stats.rs primary rays / second).

vs_baseline is relative to the BASELINE.md north-star target of
100 Mrays/s/chip (the reference publishes no numbers of its own).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

W = int(os.environ.get("BENCH_WIDTH", 1024))
H = int(os.environ.get("BENCH_HEIGHT", 1024))
SPP = int(os.environ.get("BENCH_SPP", 1))
SCENE = os.environ.get("BENCH_SCENE", "data/thai2.dae")
TPL = int(os.environ.get("BENCH_TPL", 512))
TARGET_MRAYS = 100.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/rtx_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import raytracer_tpu as rtx

    rt = rtx.create_raytracer_from_file(SCENE, width=W, height=H,
                                        accel="cluster", triangles_per_leaf=TPL)
    # warmup: compile the step at the row-block shape
    rt.trace_frame_additive()
    jax.block_until_ready(rt.film.pixel_sum)

    blocks_per_frame = -(-H // rt.rows_per_frame)
    n_steps = blocks_per_frame * SPP
    rays = 0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rays += rt.trace_frame_additive()
    jax.block_until_ready(rt.film.pixel_sum)
    dt = time.perf_counter() - t0

    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": f"primary Mrays/s fwd (thai2 {W}x{H}, {SPP}spp, 2 bounces)",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
