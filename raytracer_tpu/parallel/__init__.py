"""Multi-chip / multi-host parallel rendering (mesh, shard_map, collectives).

The reference has no parallelism beyond a render-thread/GUI-thread split
(reference: raytracer/src/main.rs:194-253).  This package provides the
TPU-native scaling layer: image tiles / ray batches sharded over a
jax.sharding.Mesh, with psum reductions for film statistics and scene
gradients (see SURVEY §2 'Parallelism inventory').
"""
