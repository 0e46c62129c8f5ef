import sys, os; sys.path.insert(0, "/root/repo")
import time, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracer_tpu as rtx
tpl = int(os.environ.get("TPL", 256))
rt = rtx.create_raytracer_from_file("data/thai2.dae", width=1024, height=1024,
                                    accel="bvh", triangles_per_leaf=tpl)
rt.render(1); jax.block_until_ready(rt.film.pixel_sum)
t0 = time.perf_counter()
rt.render(6); jax.block_until_ready(rt.film.pixel_sum)
dt = (time.perf_counter() - t0) / 6
print(f"tpl={tpl}: {dt*1e3:.1f} ms/frame = {1024*1024/dt/1e6:.2f} Mrays/s", flush=True)
