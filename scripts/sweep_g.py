import sys, os; sys.path.insert(0, "/root/repo")
import time, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rtx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracer_tpu as rtx
from raytracer_tpu.ops.pallas_bvh import BVHIntersector

for tpl, g in ((256, 8), (256, 4), (128, 8), (128, 16), (512, 4)):
    from raytracer_tpu.models.collada import ColladaLoader
    scene = ColladaLoader.from_file("data/thai2.dae", width=1024, height=1024, verbose=False)
    isect = BVHIntersector(scene.to_buffers(), triangles_per_leaf=tpl, group=g)
    rt = rtx.RayTracer(scene, 1024, 1024, intersector=isect)
    rt.render(1); jax.block_until_ready(rt.film.pixel_sum)
    t0 = time.perf_counter()
    rt.render(4); jax.block_until_ready(rt.film.pixel_sum)
    dt = (time.perf_counter() - t0) / 4
    print(f"tpl={tpl} G={g} K1={isect.bvh.num_superclusters}: {dt*1e3:.1f} ms/frame = {1024*1024/dt/1e6:.2f} Mrays/s", flush=True)
