"""Gradient correctness: analytic pixel gradients vs central finite
differences (the BASELINE.json verification protocol), plus inverse
rendering convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.diff.gradients import pixel_loss, render_pixels
from raytracer_tpu.diff.inverse import optimize
from raytracer_tpu.models.collada import ColladaLoader
from tests import fixtures

W, H = 16, 12


@pytest.fixture(scope="module")
def tri_scene():
    # a single triangle facing the camera, lit from the camera side —
    # well away from visibility discontinuities
    # The identity-node camera looks along scene -y (collada conversion).
    # These collada verts map to scene (-2,-4,-1), (2,-4,-1), (0,-4,2):
    # a wall at y=-4 in front of the camera with geometric normal -y.
    # The light sits behind the wall at scene (0.5,-6,1) so the normal
    # faces it (the reference never flips normals toward the viewer).
    doc = fixtures.make_doc(
        positions=[-2, -1, 4, 2, -1, 4, 0, 2, 4],
        indices=[0, 1, 2],
        light_matrix=fixtures.translate_matrix(0.5, 1.0, -6.0),
        light_color="5 5 5",
        diffuse="0.6 0.3 0.2 1",
    )
    scene = ColladaLoader.from_str(doc, verbose=False)
    return scene, scene.to_buffers().to_device()


def _loss_fn(tri_scene):
    scene, dev = tri_scene
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    jitter = jnp.full((W * H, 2), 0.5, jnp.float32)
    isect = BruteForceIntersector()
    key = jax.random.PRNGKey(0)
    target = render_pixels(dev, cam, px, py, key, W, H, isect,
                           recursions=0, jitter=jitter) * 0.8

    def loss(scene_arrays, cam_params):
        return pixel_loss(scene_arrays, cam_params, px, py, key, W, H,
                          isect, target, recursions=0, jitter=jitter)

    return loss, dev, cam


def _fd_check(loss, args, which_arg, leaf_get, leaf_set, idx, eps=1e-3,
              rtol=0.05, atol=1e-6):
    """Central finite difference on one scalar entry of one leaf."""
    g = jax.grad(loss, argnums=which_arg, allow_int=True)(*args)
    analytic = float(np.asarray(leaf_get(g)).reshape(-1)[idx])

    def perturbed(delta):
        a = list(args)
        leaf = np.asarray(leaf_get(a[which_arg])).copy()
        flat = leaf.reshape(-1)
        flat[idx] += delta
        a[which_arg] = leaf_set(a[which_arg], leaf)
        return float(loss(*a))

    fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
    assert analytic == pytest.approx(fd, rel=rtol, abs=atol), \
        f"analytic {analytic} vs fd {fd}"
    return analytic


def test_grad_wrt_albedo_matches_fd(tri_scene):
    import dataclasses
    loss, dev, cam = _loss_fn(tri_scene)
    g = _fd_check(
        loss, (dev, cam), 0,
        lambda s: s.mat_diffuse_rgb,
        lambda s, v: dataclasses.replace(s, mat_diffuse_rgb=jnp.asarray(v)),
        idx=0)
    assert g != 0.0


def test_grad_wrt_vertices_matches_fd(tri_scene):
    import dataclasses
    loss, dev, cam = _loss_fn(tri_scene)
    # perturb x of the first vertex of the lone triangle
    _fd_check(
        loss, (dev, cam), 0,
        lambda s: s.tri_verts,
        lambda s, v: dataclasses.replace(s, tri_verts=jnp.asarray(v)),
        idx=0, eps=1e-3, rtol=0.08)


def test_grad_wrt_light_matches_fd(tri_scene):
    import dataclasses
    loss, dev, cam = _loss_fn(tri_scene)
    _fd_check(
        loss, (dev, cam), 0,
        lambda s: s.light_color,
        lambda s, v: dataclasses.replace(s, light_color=jnp.asarray(v)),
        idx=1)


def test_grad_wrt_camera_origin_matches_fd(tri_scene):
    import dataclasses as dc
    loss, dev, cam = _loss_fn(tri_scene)
    _fd_check(
        loss, (dev, cam), 1,
        lambda c: c.origin,
        lambda c, v: dc.replace(c, origin=jnp.asarray(v)),
        idx=2, eps=1e-3, rtol=0.08)


def test_inverse_rendering_recovers_albedo(tri_scene):
    import dataclasses
    scene, dev = tri_scene
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    isect = BruteForceIntersector()
    key = jax.random.PRNGKey(0)
    jitter = jnp.full((W * H, 2), 0.5, jnp.float32)
    target = render_pixels(dev, cam, px, py, key, W, H, isect,
                           recursions=0, jitter=jitter)

    start = dataclasses.replace(
        dev, mat_diffuse_rgb=jnp.full_like(dev.mat_diffuse_rgb, 0.5))
    recovered, losses = optimize(
        start, cam, px, py, W, H, isect, target,
        fields=("mat_diffuse_rgb",), steps=120, learning_rate=5e-2,
        jitter=jitter)
    assert losses[-1] < losses[0] * 1e-2
    np.testing.assert_allclose(np.asarray(recovered.mat_diffuse_rgb),
                               np.asarray(dev.mat_diffuse_rgb), atol=0.05)
