"""Device-trace profile of one fused frame: per-pallas-kernel and
per-op-kind XLA timings from a jax.profiler xplane trace.

This is the ONLY reliable way to cost stages on this setup: per-call
host timing through the axon tunnel carries 30-150 ms of dispatch noise
per dispatch, and device-side fori_loop microbenchmarks get partially
hoisted/overlapped by XLA.  The trace is ground truth.

Usage: python scripts/trace_profile.py [spp]
Env: BENCH_TPL (default 256), BENCH_ACCEL (bvh), RTX_SEG, RTX_RB.
"""
import collections
import glob
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/rtx-trace"


def capture(spp=1):
    import raytracer_tpu as rtx
    tpl = int(os.environ.get("BENCH_TPL", 256))
    accel = os.environ.get("BENCH_ACCEL", "bvh")
    opts = {k: int(os.environ[e]) for k, e in
            (("seg", "RTX_SEG"), ("group", "RTX_GROUP"))
            if os.environ.get(e)} if accel == "bvh" else {}
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=1024,
                                        height=1024, accel=accel,
                                        triangles_per_leaf=tpl,
                                        accel_opts=opts)
    if os.environ.get("RTX_RB"):
        rt.intersector.ray_block = int(os.environ["RTX_RB"])
    rt.render(1)
    jax.block_until_ready(rt.film.pixel_sum)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    rt.render(spp)
    np.asarray(rt.film.pixel_sum[:64])
    jax.profiler.stop_trace()


def report():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        # some installs only expose the proto inside the tensorflow
        # package directory itself
        import sysconfig
        sys.path.insert(0, os.path.join(
            sysconfig.get_paths()["purelib"], "tensorflow"))
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))[-1]
    p = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        p.ParseFromString(f.read())
    for plane in p.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            pallas = []
            tot = 0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                m = re.match(r"%([a-z\-_]+)[.\d]*", name)
                kind = m.group(1) if m else name[:20]
                if kind == "while":
                    continue  # the whole frame loop; children re-counted
                agg[kind] += ev.duration_ps
                cnt[kind] += 1
                tot += ev.duration_ps
                if kind.startswith("pallas_bvh"):
                    shp = re.search(r"f32\[(\d+),(\d+)\]", name)
                    pallas.append((kind, ev.duration_ps / 1e9,
                                   shp.group(0) if shp else "?"))
            print("== per pallas kernel (call order per spp iter) ==")
            for kind, ms, shp in pallas:
                print(f"  {ms:8.2f} ms  {kind:24s} {shp}")
            print("== serialized XLA op-kind totals ==")
            for kind, ps in agg.most_common(18):
                print(f"{ps/1e9:9.2f} ms  x{cnt[kind]:5d}  {kind}")
            print(f"   TOTAL {tot/1e9:.1f} ms")


if __name__ == "__main__":
    # args: [spp] | capture [spp] | report   (split so the slow tunnel
    # compile and the fast proto parse can run as separate jobs)
    args = sys.argv[1:]
    if args and args[0] == "report":
        report()
    elif args and args[0] == "capture":
        capture(int(args[1]) if len(args) > 1 else 1)
    else:
        spp = int(args[0]) if args else 1
        capture(spp)
        report()
