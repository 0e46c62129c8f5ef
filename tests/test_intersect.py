"""Intersection tests: MT accept criteria, closest-hit vs the scalar
oracle, cluster accel vs brute force (the reference's oracle pattern:
no_acceleration_intersector.rs as ground truth)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.intersect import BIG_T, any_hit_window, closest_hit
from raytracer_tpu.ops.cluster import build_cluster_grid
from raytracer_tpu.ops.pallas_intersect import (
    pallas_cluster_closest, xla_cluster_closest)
from tests import oracle


def single_tri():
    return np.array([[[0, 0, 5], [2, 0, 5], [0, 2, 5]]], np.float32)


def test_hit_simple():
    tris = single_tri()
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    res = closest_hit(o, d, jnp.asarray(tris))
    assert bool(res["hit"][0])
    assert res["t"][0] == pytest.approx(5.0)
    assert res["u"][0] == pytest.approx(0.25)
    assert res["v"][0] == pytest.approx(0.25)


def test_miss_behind():
    tris = single_tri()
    o = jnp.array([[0.5, 0.5, 10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])  # triangle is behind (t < 0)
    res = closest_hit(o, d, jnp.asarray(tris))
    assert not bool(res["hit"][0])
    assert res["t"][0] == BIG_T


def test_parallel_ray_rejected():
    tris = single_tri()
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])  # parallel to triangle plane
    res = closest_hit(o, d, jnp.asarray(tris))
    assert not bool(res["hit"][0])


def test_closest_of_two():
    tris = np.array([
        [[0, 0, 5], [2, 0, 5], [0, 2, 5]],
        [[0, 0, 3], [2, 0, 3], [0, 2, 3]],
    ], np.float32)
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    res = closest_hit(o, d, jnp.asarray(tris))
    assert res["t"][0] == pytest.approx(3.0)
    assert int(res["tri"][0]) == 1


def test_any_hit_window_semantics():
    # closest hit below the window unblocks even with an occluder inside —
    # exact reproduction of the reference shadow quirk (mod.rs:224-230)
    tris = np.array([
        [[-9, -9, 0.005], [9, -9, 0.005], [0, 9, 0.005]],   # t = 0.005 < 0.01
        [[-9, -9, 0.5], [9, -9, 0.5], [0, 9, 0.5]],         # t = 0.5 in window
    ], np.float32)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    blocked = any_hit_window(o, d, jnp.asarray(tris))
    assert not bool(blocked[0])  # closest (0.005) is outside the window
    blocked2 = any_hit_window(o, d, jnp.asarray(tris[1:]))
    assert bool(blocked2[0])


def random_scene(n=300, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, size=(n, 1, 3))
    tris = base + rng.uniform(-0.8, 0.8, size=(n, 3, 3))
    return tris.astype(np.float32)


def random_rays(r=64, seed=2):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    return o, d


def test_closest_hit_matches_scalar_oracle():
    tris = random_scene()
    o, d = random_rays()
    res = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    for i in range(len(o)):
        expect = oracle.closest_hit(o[i], d[i], tris)
        if expect is None:
            assert not bool(res["hit"][i])
        else:
            assert bool(res["hit"][i])
            assert float(res["t"][i]) == pytest.approx(expect[0], rel=1e-4)
            assert int(res["tri"][i]) == expect[3]


def test_cluster_grid_covers_all_triangles():
    tris = random_scene(500)
    grid = build_cluster_grid(tris, triangles_per_leaf=70)
    valid = grid.perm[grid.perm >= 0]
    assert sorted(valid.tolist()) == list(range(500))
    # every real triangle is inside its cluster AABB
    K, C = grid.num_clusters, grid.cluster_size
    for k in range(K):
        lanes = grid.perm.reshape(K, C)[k]
        mask = lanes >= 0
        if not mask.any():
            continue
        tv = tris[lanes[mask]]
        assert (tv.min(axis=(0, 1)) >= grid.aabb_min[k] - 1e-5).all()
        assert (tv.max(axis=(0, 1)) <= grid.aabb_max[k] + 1e-5).all()


def test_xla_cluster_matches_brute():
    tris = random_scene(700, seed=7)
    o, d = random_rays(128, seed=8)
    grid = build_cluster_grid(tris, triangles_per_leaf=70)
    t, u, v, i = xla_cluster_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(grid.v0),
        jnp.asarray(grid.e1), jnp.asarray(grid.e2),
        jnp.asarray(grid.aabb_min), jnp.asarray(grid.aabb_max))
    brute = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    hit = np.asarray(t) < BIG_T
    np.testing.assert_array_equal(hit, np.asarray(brute["hit"]))
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(brute["t"])[hit],
                               rtol=1e-5)
    # triangle identity maps back through the permutation
    perm = np.maximum(grid.perm, 0)
    np.testing.assert_array_equal(perm[np.asarray(i)[hit]],
                                  np.asarray(brute["tri"])[hit])


def test_pallas_interpret_matches_xla():
    tris = random_scene(300, seed=11)
    o, d = random_rays(1024, seed=12)  # 8 ray-blocks = one output block
    grid = build_cluster_grid(tris, triangles_per_leaf=70)
    aabb8 = np.zeros((grid.num_clusters, 8), np.float32)
    aabb8[:, :3], aabb8[:, 3:6] = grid.aabb_min, grid.aabb_max
    tp, up, vp, ip = pallas_cluster_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(grid.v0),
        jnp.asarray(grid.e1), jnp.asarray(grid.e2), jnp.asarray(aabb8),
        jnp.asarray(grid.orders), interpret=True)
    tx, ux, vx, ix = xla_cluster_closest(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(grid.v0),
        jnp.asarray(grid.e1), jnp.asarray(grid.e2),
        jnp.asarray(grid.aabb_min), jnp.asarray(grid.aabb_max))
    # the MXU formulation reassociates the MT arithmetic -> small f32 drift
    np.testing.assert_allclose(np.asarray(tp), np.asarray(tx), rtol=1e-4)
    hit = np.asarray(tx) < BIG_T
    np.testing.assert_array_equal(np.asarray(ip)[hit], np.asarray(ix)[hit])
    np.testing.assert_allclose(np.asarray(up)[hit], np.asarray(ux)[hit], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp)[hit], np.asarray(vx)[hit], rtol=1e-4, atol=1e-5)
