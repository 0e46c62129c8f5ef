"""raytracer_tpu — a TPU-native, differentiable, wavefront ray-tracing framework.

Re-implements the capabilities of the reference Rust CPU ray tracer
(`raytracer-rs`) as an idiomatic JAX/XLA/Pallas framework:

- COLLADA (.dae) scene ingestion into flat SoA device buffers
  (reference: raytracer_lib/src/scene/loaders/colladaloader.rs)
- Jittered pinhole-camera ray generation (reference: scene/camera.rs)
- Wavefront ray-gen / intersect / shade pipeline over ray batches
  (replaces the per-pixel recursion in raytracer/mod.rs:132-176)
- Pallas TPU kernels for the intersection hot loop with a
  cluster-BVH acceleration structure (replaces the CPU octree in
  raytracer/accel_intersect/oct_tree_intersector.rs)
- Progressive additive film accumulation + Reinhard tonemapping
  (reference: raytracer/film.rs, raytracer/tonemap.rs)
- Multi-chip rendering via jax.sharding.Mesh + shard_map, and
  analytic gradients from pixels back to scene parameters (new
  capabilities; the reference is single-threaded CPU, forward only).

Public facade mirrors the reference library API
(raytracer_lib/src/lib.rs:15-44):
"""

from raytracer_tpu.core.engine import RayTracer, DEFAULT_TRIANGLES_PER_LEAF
from raytracer_tpu.models.collada import ColladaLoader, SceneLoadError
from raytracer_tpu.utils import stats

__version__ = "0.1.0"


def create_raytracer(collada_doc, triangles_per_leaf=DEFAULT_TRIANGLES_PER_LEAF,
                     width=1024, height=768, **kwargs):
    """Build a RayTracer from a COLLADA document string.

    Mirrors `create_raytracer` (reference: raytracer_lib/src/lib.rs:15-20).
    Extra kwargs configure TPU-only features (spp, bounces, mesh, compat).
    """
    scene = ColladaLoader.from_str(collada_doc, data_dir=None, width=width, height=height)
    return RayTracer.from_scene(scene, width, height,
                                triangles_per_leaf=triangles_per_leaf, **kwargs)


def create_raytracer_from_file(collada_filename, triangles_per_leaf=DEFAULT_TRIANGLES_PER_LEAF,
                               width=1024, height=768, **kwargs):
    """Build a RayTracer from a .dae file path.

    Mirrors `create_raytracer_from_file` (reference: raytracer_lib/src/lib.rs:22-27).
    """
    scene = ColladaLoader.from_file(collada_filename, width=width, height=height)
    return RayTracer.from_scene(scene, width, height,
                                triangles_per_leaf=triangles_per_leaf, **kwargs)


__all__ = [
    "RayTracer",
    "DEFAULT_TRIANGLES_PER_LEAF",
    "ColladaLoader",
    "SceneLoadError",
    "create_raytracer",
    "create_raytracer_from_file",
    "stats",
]
