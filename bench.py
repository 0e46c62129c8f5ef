"""Headline benchmark: ray throughput on thai2.dae (BASELINE config #4:
the 20k-triangle acceleration-structure stress scene).

Measures full forward rendering — jittered ray-gen, two-level-BVH
closest-hit, Phong shading with shadow rays, two bounce levels
(RECURSIONS=2 / SUB_SPREAD=1 parity), film accumulation — on one chip.

Reports primary Mrays/s (the reference's own metric:
raytracer_lib/src/stats.rs primary rays / second).  Each primary ray
carries the full recursive workload: 5 closest-hit + 5 occlusion
traversals per primary (1 primary + 2+2 bounce rays, each shaded with a
shadow ray), so total traversal throughput is 10x the headline number.

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
# 16 spp is the BASELINE.json north-star config (thai2 @1024^2,
# 16 spp) and amortizes the fixed per-dispatch latency of the
# remote-TPU tunnel (~0.5-0.9 s) over a full device-side spp loop
SPP = int(os.environ.get("BENCH_SPP", 16))
SCENE = os.environ.get("BENCH_SCENE", "data/thai2.dae")
ACCEL = os.environ.get("BENCH_ACCEL", "bvh")
TPL = int(os.environ.get("BENCH_TPL", 256))
ACCEL_OPTS = {k: int(os.environ[e]) for k, e in
              (("seg", "BENCH_SEG"), ("group", "BENCH_GROUP"),
               ("ray_block", "BENCH_RB"))
              if os.environ.get(e)} if ACCEL == "bvh" else {}
SORTKEY = os.environ.get("BENCH_SORTKEY", "dir6")
# spp pooling (engine spp_pool): unset = engine auto (8 on the fused
# TPU path); set to sweep the pool factor
POOL = (int(os.environ["BENCH_POOL"])
        if os.environ.get("BENCH_POOL") else None)
SORT_PAYLOAD = os.environ.get("BENCH_SORT_PAYLOAD", "ride")
RNG_IMPL = os.environ.get("BENCH_RNG", "threefry")
TARGET_MRAYS = 100.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/rtx_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import raytracer_tpu as rtx

    rt = rtx.create_raytracer_from_file(SCENE, width=W, height=H,
                                        accel=ACCEL, triangles_per_leaf=TPL,
                                        sort_key_mode=SORTKEY,
                                        accel_opts=ACCEL_OPTS,
                                        spp_pool=POOL,
                                        sort_payload=SORT_PAYLOAD,
                                        rng_impl=RNG_IMPL)
    # warmup: compile the whole-frame step (retry once — the remote
    # compile tunnel occasionally drops a response mid-read)
    for attempt in (0, 1):
        try:
            rt.render(1)
            jax.block_until_ready(rt.film.pixel_sum)
            break
        except Exception:
            if attempt:
                raise
            time.sleep(5)

    # Repeat-until-stable min: one render() is a single device dispatch,
    # but wall time through the remote-TPU tunnel jitters by hundreds of
    # ms and occasionally DOUBLES (round 4's driver capture recorded
    # 1.27 Mrays/s for a run that reproduces at 2.5).  Keep sampling
    # until two consecutive reps land within 10% of the running min
    # (>= BENCH_REPS reps, <= BENCH_REPS_MAX), so one slow capture
    # can't set the scoreboard.
    reps_min = int(os.environ.get("BENCH_REPS", 3))
    reps_max = int(os.environ.get("BENCH_REPS_MAX", 10))
    times = []
    dt = float("inf")
    stable = 0
    while len(times) < reps_max:
        t0 = time.perf_counter()
        rt.render(SPP)
        jax.block_until_ready(rt.film.pixel_sum)
        ti = time.perf_counter() - t0
        times.append(ti)
        dt = min(dt, ti)
        stable = stable + 1 if ti <= 1.10 * dt else 0
        if len(times) >= reps_min and stable >= 2:
            break

    # Device-time estimate: two renders dispatched back-to-back share
    # one tunnel round-trip, so (pair time) - (best single) isolates
    # roughly one render's pure device time.  A best-single far above
    # this estimate means the capture was tunnel-bound, not
    # device-bound — the self-diagnosis VERDICT r4 asked for.
    t0 = time.perf_counter()
    rt.render(SPP)
    rt.render(SPP)
    jax.block_until_ready(rt.film.pixel_sum)
    pair = time.perf_counter() - t0
    dev_est = max(pair - dt, 0.0)
    print(f"bench reps (s): {[round(t, 3) for t in times]}  "
          f"min {dt:.3f}  device-est {dev_est:.3f}", file=sys.stderr)

    rays = W * H * SPP
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": (f"primary Mrays/s fwd (thai2 {W}x{H}, {SPP}spp, "
                   f"2 bounces; 10 traversals/primary)"),
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "wall_s_min": round(dt, 4),
        "device_s_est": round(dev_est, 4),
        "reps_s": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    sys.exit(main())
