"""Multi-chip tests on the 8-device virtual CPU mesh: sharded forward
render matches single-device, sharded train step reduces loss with
psum'd gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.models.collada import ColladaLoader
from raytracer_tpu.parallel.mesh import make_mesh, ray_sharding
from raytracer_tpu.parallel.render import (
    make_sharded_render, make_sharded_train_step, pixel_grid, _per_device_keys)

W, H = 32, 16


@pytest.fixture(scope="module")
def scene_dev(data_dir):
    scene = ColladaLoader.from_file(data_dir / "4boxes.dae", width=W, height=H,
                                    verbose=False)
    return scene, scene.to_buffers().to_device()


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_matches_unsharded(scene_dev):
    scene, dev = scene_dev
    cam = scene.cameras[0].params()
    mesh = make_mesh()
    isect = BruteForceIntersector()
    render = make_sharded_render(mesh, isect, W, H, recursions=0)

    px, py, r = pixel_grid(W, H, pad_to=mesh.devices.size)
    keys = _per_device_keys(jax.random.PRNGKey(0), mesh)
    rad = render(dev, cam, jnp.asarray(px), jnp.asarray(py), keys)
    assert rad.shape == (len(px), 3)
    assert np.isfinite(np.asarray(rad)).all()

    # compare against the unsharded pipeline with identical per-device keys
    from raytracer_tpu.core.wavefront import trace_radiance
    from raytracer_tpu.models.camera import generate_rays
    n = mesh.devices.size
    shard = len(px) // n
    expected = []
    for di in range(n):
        sl = slice(di * shard, (di + 1) * shard)
        kj, kt = jax.random.split(keys[di])
        jitter = jax.random.uniform(kj, (shard, 2), dtype=jnp.float32)
        o, d = generate_rays(cam, jnp.asarray(px[sl]), jnp.asarray(py[sl]),
                             jitter, W, H)
        expected.append(trace_radiance(dev, o, d, kt, isect, 0, 1))
    expected = jnp.concatenate(expected)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_sharded_render_output_is_ray_sharded(scene_dev):
    scene, dev = scene_dev
    cam = scene.cameras[0].params()
    mesh = make_mesh()
    isect = BruteForceIntersector()
    render = make_sharded_render(mesh, isect, W, H, recursions=0)
    px, py, _ = pixel_grid(W, H, pad_to=mesh.devices.size)
    px = jax.device_put(jnp.asarray(px), ray_sharding(mesh))
    py = jax.device_put(jnp.asarray(py), ray_sharding(mesh))
    keys = _per_device_keys(jax.random.PRNGKey(0), mesh)
    rad = render(dev, cam, px, py, keys)
    # output stays sharded over the rays axis (no implicit gather)
    assert len(rad.sharding.device_set) == 8


def test_sharded_train_step_reduces_loss(scene_dev):
    scene, dev = scene_dev
    cam = scene.cameras[0].params()
    mesh = make_mesh()
    isect = BruteForceIntersector()
    opt = optax.adam(5e-2)
    step = make_sharded_train_step(mesh, isect, W, H, opt, recursions=0)

    px, py, _ = pixel_grid(W, H, pad_to=mesh.devices.size)
    px, py = jnp.asarray(px), jnp.asarray(py)
    keys = _per_device_keys(jax.random.PRNGKey(1), mesh)

    # target: the scene rendered with its true albedo; start from grey
    render = make_sharded_render(mesh, isect, W, H, recursions=0)
    target = render(dev, cam, px, py, keys)

    import dataclasses
    start = dataclasses.replace(dev, mat_diffuse_rgb=jnp.full_like(
        dev.mat_diffuse_rgb, 0.5))
    diff = {"mat_diffuse_rgb": start.mat_diffuse_rgb}
    opt_state = opt.init(diff)

    losses = []
    for i in range(12):
        loss, opt_state, diff = step(opt_state, diff, start, cam, px, py,
                                     target, keys)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    assert np.isfinite(losses).all()
