"""Math-layer tests (mirror + extend reference tests at vecmath.rs:342-360
and collada_types.rs:93-126)."""

import numpy as np

from raytracer_tpu import vecmath as vm


def test_mul_identities():
    m = vm.mat_mul(vm.mat_ident(), vm.mat_ident())
    np.testing.assert_array_equal(m, vm.mat_ident())


def test_mul_vec_mat():
    v = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    np.testing.assert_array_equal(vm.mat_mul_vec4(vm.mat_ident(), v), v)


def test_translate_convention():
    # translation lives in elements 12..14 and applies via v @ E
    m = vm.mat_translate(vm.vec3(1, 2, 3))
    p = vm.transform_point(m, vm.vec3(10, 20, 30))
    np.testing.assert_allclose(p, [11, 22, 33])


def test_rot_x_quarter_turn():
    # reference rot_x: e[5]=cos, e[6]=-sin, e[9]=sin, e[10]=cos; with the
    # row-vector convention y-axis maps to (0, cos, -sin) @ ...:
    m = vm.mat_rot_x(np.pi / 2)
    p = vm.transform_point(m, vm.vec3(0, 1, 0))
    np.testing.assert_allclose(p, [0, 0, -1], atol=1e-6)


def test_matmul_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=16).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32)
    np.testing.assert_allclose(
        vm.mat_mul(a, b).reshape(4, 4),
        a.reshape(4, 4) @ b.reshape(4, 4), rtol=1e-6)


def test_collada_mat_translation_remap():
    # reference collada_types.rs:98-109: collada translation (10,20,30)
    # becomes (10,30,20) after the axis swap
    cm = np.zeros(16, np.float32)
    cm[3], cm[7], cm[11], cm[15] = 10.0, 20.0, 30.0, 1.0
    m = vm.collada_to_scene_matrix(cm)
    expected = np.zeros(16, np.float32)
    expected[12], expected[13], expected[14], expected[15] = 10.0, 30.0, 20.0, 1.0
    np.testing.assert_allclose(m, expected)


def test_collada_mat_z_maps_to_neg_y():
    # reference collada_types.rs:111-125: +Z maps to -Y
    m = vm.collada_to_scene_matrix(vm.mat_ident())
    p = vm.transform_point(m, vm.vec3(0, 0, 1))
    np.testing.assert_allclose(p, [0, -1, 0])


def test_cross_dot():
    a, b = vm.vec3(1, 0, 0), vm.vec3(0, 1, 0)
    np.testing.assert_allclose(vm.cross(a, b), [0, 0, 1])
    assert vm.dot(a, b) == 0.0
