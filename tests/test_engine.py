"""End-to-end engine tests: the vectorized wavefront vs the independent
scalar oracle (direct lighting), progressive film semantics, tonemap
packing, brute-vs-cluster image equality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu import create_raytracer_from_file
from raytracer_tpu.core.engine import RayTracer
from raytracer_tpu.core.tonemap import pack_u32, simple_map
from raytracer_tpu.core.wavefront import trace_radiance
from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.models.camera import generate_rays
from raytracer_tpu.models.collada import ColladaLoader
from tests import oracle

W, H = 32, 24


@pytest.fixture(scope="module")
def boxes_scene(data_dir):
    return ColladaLoader.from_file(data_dir / "4boxes.dae", width=W, height=H,
                                   verbose=False)


def test_direct_lighting_matches_oracle(boxes_scene):
    """Config #1 analogue at tiny res: direct lighting, fixed jitter,
    vectorized pipeline == scalar per-pixel oracle."""
    buf = boxes_scene.to_buffers()
    scene_dev = buf.to_device()
    cam = boxes_scene.cameras[0]
    isect = BruteForceIntersector()

    px = np.tile(np.arange(W, dtype=np.int32), H)
    py = np.repeat(np.arange(H, dtype=np.int32), W)
    jit = np.full((W * H, 2), 0.5, np.float32)
    o, d = generate_rays(cam.params(), jnp.asarray(px), jnp.asarray(py),
                         jnp.asarray(jit), W, H)
    rad = trace_radiance(scene_dev, o, d, jax.random.PRNGKey(0),
                         isect, recursions=0, spread=1)
    img = np.asarray(rad).reshape(H, W, 3)

    expect = oracle.render_direct(buf, cam, W, H, jitter=(0.5, 0.5))
    # Most pixels must agree tightly; a small fraction may differ at
    # geometric edges from f32 associativity differences.
    diff = np.abs(img - expect).max(axis=-1)
    agree = (diff < 1e-2 * (1.0 + np.abs(expect).max(axis=-1))).mean()
    assert agree > 0.98, f"only {agree:.3f} of pixels agree"
    assert img.max() > 0.0  # scene is actually lit


def test_brute_and_cluster_render_identically(data_dir):
    rt_b = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                      width=W, height=H, accel="brute", seed=3)
    rt_c = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                      width=W, height=H, accel="cluster", seed=3)
    rt_b.render(spp=1)
    rt_c.render(spp=1)
    a, b = rt_b.get_hdr(), rt_c.get_hdr()
    # same seeds -> identical rngs -> images should match closely
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_trace_frame_additive_progression(data_dir):
    rt = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                    width=W, height=H, accel="brute",
                                    rows_per_frame=10)
    n = rt.trace_frame_additive()
    assert n == 10 * W  # num_primary_rays = rows * width (mod.rs:113-116)
    assert rt.current_row == 10
    samples = np.asarray(rt.film.num_samples).reshape(H, W)
    assert (samples[:10] == 1).all() and (samples[10:] == 0).all()
    # cursor wraps (mod.rs:114)
    for _ in range(2):
        rt.trace_frame_additive()
    assert rt.current_row == 30 % H


def test_tonemap_pack_white_for_unsampled(data_dir):
    rt = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                    width=W, height=H, accel="brute",
                                    rows_per_frame=4)
    rt.trace_frame_additive()
    pix = rt.get_tonemapped_pixels()
    assert pix.dtype == np.uint32
    # unsampled rows pack as opaque white (Rust NaN min/max chain parity)
    assert (pix[-W:] == 0xFFFFFFFF).all()


def test_pack_u32_layout():
    rgb = jnp.array([[1.0, 0.0, 0.0]])
    assert int(pack_u32(rgb)[0]) == 0xFFFF0000  # 0xAARRGGBB
    rgb = jnp.array([[0.0, 1.0, 0.0]])
    assert int(pack_u32(rgb)[0]) == 0xFF00FF00
    rgb = jnp.array([[0.0, 0.0, 1.0]])
    assert int(pack_u32(rgb)[0]) == 0xFF0000FF
    nanpix = jnp.array([[jnp.nan, jnp.nan, jnp.nan]])
    assert int(pack_u32(nanpix)[0]) == 0xFFFFFFFF


def test_camera_motion_clears_film(data_dir):
    rt = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                    width=W, height=H, accel="brute")
    rt.trace_frame_additive()
    assert float(rt.film.num_samples.sum()) > 0
    rt.move_camera(0.1, 0.0, 0.0)
    assert float(rt.film.num_samples.sum()) == 0.0


def test_bounces_add_radiance(data_dir):
    rt0 = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                     width=W, height=H, accel="brute",
                                     recursions=0, seed=5)
    rt2 = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                     width=W, height=H, accel="brute",
                                     recursions=2, seed=5)
    img0 = rt0.render(spp=2)
    img2 = rt2.render(spp=2)
    # indirect light only adds energy (all terms non-negative)
    assert img2.sum() > img0.sum()


def test_simple_map_reinhard():
    x = jnp.array([[0.0, 1.0, 3.0]])
    np.testing.assert_allclose(np.asarray(simple_map(x)),
                               [[0.0, 0.5, 0.75]], rtol=1e-6)


def test_sorting_is_result_invariant(data_dir):
    """Ray sorting must not change the image: sampling draws are assigned
    in canonical pixel order and carried through the sort as payload
    (wavefront._sort_rays), so sorted and unsorted traversal orders
    produce bit-equal radiance."""
    import jax
    from raytracer_tpu.core.wavefront import trace_radiance
    from raytracer_tpu.models.camera import generate_rays
    from raytracer_tpu.models.collada import ColladaLoader
    from raytracer_tpu.ops.pallas_bvh import BVHIntersector

    scene = ColladaLoader.from_file(str(data_dir / "4boxes.dae"),
                                    width=W, height=H, verbose=False)
    buf = scene.to_buffers()
    dev = buf.to_device()
    isect = BVHIntersector(buf, use_pallas=False)
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), 4))
    py = jnp.asarray(np.repeat(np.arange(4, dtype=np.int32), W))
    key = jax.random.PRNGKey(11)
    jitter = jax.random.uniform(jax.random.PRNGKey(12), (px.shape[0], 2),
                                dtype=jnp.float32)
    o, d = generate_rays(cam, px, py, jitter, W, H)
    r_sorted = trace_radiance(dev, o, d, key, isect, 2, 1, sort_rays=True)
    r_unsorted = trace_radiance(dev, o, d, key, isect, 2, 1, sort_rays=False)
    np.testing.assert_array_equal(np.asarray(r_sorted),
                                  np.asarray(r_unsorted))
