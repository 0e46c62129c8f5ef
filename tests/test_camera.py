"""Camera tests: scalar ray-gen conventions + batched/scalar agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu import vecmath as vm
from raytracer_tpu.models.camera import Camera, generate_rays


def test_identity_camera_center_ray():
    cam = Camera(100, 100, vm.mat_ident(), fov_deg=90.0)
    o, d = cam.get_ray(50, 50, jitter=(0.0, 0.0))
    np.testing.assert_allclose(o, [0, 0, 0])
    # center pixel: dir_x = 0, dir_y = 0 (negated), z = 1
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)
    # fov 90 -> max_x = tan(45 deg) = 1
    assert cam.max_x == pytest.approx(1.0)


def test_corner_ray_and_y_flip():
    cam = Camera(100, 100, vm.mat_ident(), fov_deg=90.0)
    o, d = cam.get_ray(0, 0, jitter=(0.0, 0.0))
    # top-left: dir_x = -max_x, dir_y = -max_y, y negated (camera.rs:85)
    np.testing.assert_allclose(d, [-1.0, 1.0, 1.0], atol=1e-6)


def test_aspect_ratio_ignored():
    # quirk parity: xfov drives both axes (camera.rs:41-44)
    cam = Camera(200, 100, vm.mat_ident(), fov_deg=60.0)
    assert cam.max_x == cam.max_y


def test_batched_matches_scalar():
    base = vm.mat_mul(vm.mat_rot_y(0.3), vm.mat_translate(vm.vec3(1, 2, 3)))
    cam = Camera(64, 48, base, fov_deg=40.0)
    cam.add_x_angle(0.1)
    cam.move_rel(0.5, -0.25, 2.0)
    px = np.array([0, 10, 63, 31], np.int32)
    py = np.array([0, 20, 47, 15], np.int32)
    jit = np.array([[0.5, 0.5]] * 4, np.float32)
    o_b, d_b = generate_rays(cam.params(), jnp.asarray(px), jnp.asarray(py),
                             jnp.asarray(jit), 64, 48)
    for i in range(4):
        o_s, d_s = cam.get_ray(int(px[i]), int(py[i]), jitter=(0.5, 0.5))
        np.testing.assert_allclose(np.asarray(o_b[i]), o_s, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_b[i]), d_s, rtol=1e-5, atol=1e-6)


def test_camera_motion_changes_rays():
    cam = Camera(10, 10, vm.mat_ident(), fov_deg=60.0)
    _, d0 = cam.get_ray(5, 5, (0.5, 0.5))
    cam.add_y_angle(0.5)
    _, d1 = cam.get_ray(5, 5, (0.5, 0.5))
    assert not np.allclose(d0, d1)
    o1, _ = cam.get_ray(5, 5, (0.5, 0.5))
    cam.move_rel(1.0, 0.0, 0.0)
    o2, _ = cam.get_ray(5, 5, (0.5, 0.5))
    assert not np.allclose(o1, o2)
