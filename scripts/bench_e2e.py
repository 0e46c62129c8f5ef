import time, jax, numpy as np
import sys, os; sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracer_tpu as rtx

for accel, tpl in [("bvh", 128), ("bvh", 256), ("cluster", 512)]:
    rt = rtx.create_raytracer_from_file("data/thai2.dae", width=1024, height=1024,
                                        accel=accel, triangles_per_leaf=tpl)
    t0 = time.perf_counter()
    rt.render(1)  # warmup/compile
    jax.block_until_ready(rt.film.pixel_sum)
    print(f"{accel} tpl={tpl}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    N = 3
    rt.render(N)
    jax.block_until_ready(rt.film.pixel_sum)
    dt = (time.perf_counter() - t0) / N
    mr = 1024*1024/dt/1e6
    print(f"{accel} tpl={tpl}: {dt*1e3:.1f} ms/frame = {mr:.2f} primary Mrays/s ({mr*10:.1f} total Mrays/s)", flush=True)
