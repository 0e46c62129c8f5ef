"""Sharded wavefront rendering and the sharded inverse-rendering step.

Multi-chip execution of the core pipeline via shard_map over a
`jax.sharding.Mesh`: pixels (rays) shard across devices, the scene is
replicated, and reductions use XLA collectives (psum) over the mesh
axis — the TPU-native replacement for the reference's single-threaded
render loop + its render/GUI thread handoff
(reference: raytracer/src/main.rs:194-253; see SURVEY §2 parallelism
inventory).

Gradient flow: in `make_sharded_train_step`, per-device pixel-loss terms
psum into the global loss; shard_map's transpose rule then all-reduces
the replicated scene-parameter gradients across devices automatically —
the psum-overlapped-with-backward design from BASELINE.json's north
star.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from raytracer_tpu.core.wavefront import (trace_radiance,
                                          trace_radiance_fused)
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.parallel.mesh import RAY_AXIS


def _per_device_keys(key, mesh):
    """One fold of the frame key per device, laid out (n_dev, 2) so it
    shards one row per device."""
    n = mesh.devices.size
    return jax.random.split(key, n)


def make_sharded_render(mesh, intersector, width: int, height: int,
                        recursions: int = 2, spread: int = 1,
                        shade_records=None, has_textures: bool = True,
                        fused_shade: bool = False):
    """Returns render(scene, cam, px, py, keys) -> radiance (R, 3), with
    px/py/radiance sharded over the `rays` axis and scene/cam replicated.
    R must divide evenly by the mesh size.  shade_records (closure
    constant -> replicated) enables the forward fast shading path."""

    def local(scene, cam, px, py, keys):
        key = keys[0]  # this device's row of the (n_dev, 2) key array
        kj, kt = jax.random.split(key)
        jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
        origins, dirs = generate_rays(cam, px, py, jitter, width, height)
        return trace_radiance(scene, origins, dirs, kt, intersector,
                              recursions, spread,
                              shade_records=shade_records,
                              has_textures=has_textures,
                              fused_shade=fused_shade)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )

    @jax.jit
    def render(scene, cam, px, py, keys):
        return sharded(scene, cam, px, py, keys)

    return render


def make_sharded_frame_loop(mesh, intersector, width: int, height: int,
                            recursions: int = 2, spread: int = 1,
                            shade_records=None, has_textures: bool = True,
                            fused_shade: bool = False,
                            fused_spawn: bool = False,
                            sort_key_mode: str = "dir6",
                            spp_pool: int = 1,
                            sort_payload: str = "ride"):
    """Whole-frame multi-spp render with pixels sharded over the mesh:
    the spp loop and film-moment accumulation run ON DEVICE (one dispatch
    per call, like the single-chip `RayTracer._make_frame_step`), instead
    of one dispatch + host scatter per sample.

    Returns frame(scene, cam, px, py, keys, spp) -> (psum, psq), both
    (R, 3) sharded over rays: the per-pixel radiance sum and sum of
    squares over `spp` samples.  Each device folds its own key stream
    per sample (keys: (n_dev, 2) from `_per_device_keys`).

    spp_pool > 1 (requires fused_spawn, spp divisible by the pool):
    each loop iteration renders `spp_pool` samples in one pooled
    wavefront per device — the single-chip spp-pooling, per shard; the
    key chain matches `spp_pool` unpooled iterations exactly."""
    assert spp_pool == 1 or fused_spawn

    def local(scene, cam, px, py, keys, spp):
        key = keys[0]
        r = px.shape[0]

        def sample_rays(key):
            key, k = jax.random.split(key)
            kj, kt = jax.random.split(k)
            jitter = jax.random.uniform(kj, (r, 2), dtype=jnp.float32)
            origins, dirs = generate_rays(cam, px, py, jitter,
                                          width, height)
            return key, kt, origins, dirs

        def body(_, carry):
            psum, psq, key = carry
            if spp_pool > 1:
                os_, ds_, kts = [], [], []
                for _ in range(spp_pool):
                    key, kt, o, d = sample_rays(key)
                    os_.append(o)
                    ds_.append(d)
                    kts.append(kt)
                rad = trace_radiance_fused(
                    scene, jnp.concatenate(os_), jnp.concatenate(ds_),
                    jnp.stack(kts), intersector, recursions, spread,
                    sort_key_mode=sort_key_mode, pool=spp_pool,
                    sort_payload=sort_payload)
                radp = rad.reshape(spp_pool, r, 3)
                return (psum + radp.sum(axis=0),
                        psq + (radp * radp).sum(axis=0), key)
            key, kt, origins, dirs = sample_rays(key)
            if fused_spawn:
                rad = trace_radiance_fused(scene, origins, dirs, kt,
                                           intersector, recursions, spread,
                                           sort_key_mode=sort_key_mode,
                                           sort_payload=sort_payload)
            else:
                rad = trace_radiance(scene, origins, dirs, kt, intersector,
                                     recursions, spread,
                                     shade_records=shade_records,
                                     has_textures=has_textures,
                                     fused_shade=fused_shade,
                                     sort_key_mode=sort_key_mode)
            return (psum + rad, psq + rad * rad, key)

        init = (jnp.zeros((r, 3), jnp.float32),
                jnp.zeros((r, 3), jnp.float32), key)
        psum, psq, _ = jax.lax.fori_loop(0, spp // spp_pool, body, init)
        return psum, psq

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def frame(scene, cam, px, py, keys, spp):
        return sharded(scene, cam, px, py, keys, spp)

    return frame


def make_sharded_train_step(mesh, intersector, width: int, height: int,
                            optimizer, recursions: int = 2, spread: int = 1):
    """Sharded inverse-rendering step (BASELINE.json config #5 analogue):
    optimize scene parameters against target pixel values.

    Returns step(opt_state, scene, cam, px, py, target, keys) ->
    (loss, new_opt_state, new_scene).  px/py/target shard over rays;
    scene replicates; scene-parameter grads all-reduce via shard_map's
    psum transpose.
    """

    def local_loss_terms(scene, cam, px, py, target, keys):
        key = keys[0]
        kj, kt = jax.random.split(key)
        jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
        origins, dirs = generate_rays(cam, px, py, jitter, width, height)
        rad = trace_radiance(scene, origins, dirs, kt, intersector,
                             recursions, spread)
        err = rad - target
        # psum the per-shard sum so every device holds the global loss
        total = jax.lax.psum(jnp.sum(err * err), RAY_AXIS)
        count = jax.lax.psum(jnp.float32(err.size), RAY_AXIS)
        return total / count

    sharded_loss = shard_map(
        local_loss_terms, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(),
        check_vma=False,
    )

    def loss_fn(diff_scene, scene, cam, px, py, target, keys):
        merged = dataclasses.replace(scene, **diff_scene)
        return sharded_loss(merged, cam, px, py, target, keys)

    @jax.jit
    def step(opt_state, diff_scene, scene, cam, px, py, target, keys):
        loss, grads = jax.value_and_grad(loss_fn)(
            diff_scene, scene, cam, px, py, target, keys)
        updates, opt_state = optimizer.update(grads, opt_state, diff_scene)
        import optax
        diff_scene = optax.apply_updates(diff_scene, updates)
        return loss, opt_state, diff_scene

    return step


def pixel_grid(width: int, height: int, pad_to: int = 1):
    """Full-frame pixel coordinate arrays, padded so R divides the mesh."""
    import numpy as np
    px = np.tile(np.arange(width, dtype=np.int32), height)
    py = np.repeat(np.arange(height, dtype=np.int32), width)
    r = len(px)
    pad = (-r) % pad_to
    if pad:
        px = np.concatenate([px, np.zeros(pad, np.int32)])
        py = np.concatenate([py, np.zeros(pad, np.int32)])
    return px, py, r
