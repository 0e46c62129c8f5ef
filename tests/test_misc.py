"""Misc parity tests: compat v-bug, inline scene, stats/timing utils,
film variance hook, png io."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.film import Film
from raytracer_tpu.core.tonemap import gamma_map, luminance_simple_map, to_rgb, to_xyz
from raytracer_tpu.inline_scene import create_inline_raytracer
from raytracer_tpu.models.collada import ColladaLoader
from raytracer_tpu.utils.png_io import u32_to_rgba8, write_png
from raytracer_tpu.utils.stats import Stats
from raytracer_tpu.utils.timing import BenchMark


def test_compat_v_bug_changes_rays(data_dir):
    """mod.rs:96 — with width != height the reference's v = idx/height
    scrambles ray rows; the compat flag must reproduce a different image
    than the corrected mapping."""
    from raytracer_tpu import create_raytracer_from_file
    kw = dict(width=32, height=24, accel="brute", seed=7)
    rt_fixed = create_raytracer_from_file(str(data_dir / "4boxes.dae"), **kw)
    rt_bug = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                        compat_v_bug=True, **kw)
    a = rt_fixed.render(spp=1)
    b = rt_bug.render(spp=1)
    assert not np.allclose(a, b)


def test_compat_v_bug_noop_on_square(data_dir):
    from raytracer_tpu import create_raytracer_from_file
    kw = dict(width=16, height=16, accel="brute", seed=7)
    a = create_raytracer_from_file(str(data_dir / "4boxes.dae"), **kw).render(1)
    b = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                   compat_v_bug=True, **kw).render(1)
    np.testing.assert_allclose(a, b)


def test_inline_scene_renders():
    rt = create_inline_raytracer(width=32, height=24, accel="brute")
    img = rt.render_image(spp=1)
    assert (img.max(axis=-1) > 0).mean() > 0.5  # octahedron + backdrop


def test_stats_meter():
    s = Stats()
    time.sleep(0.01)
    line = s.stats(1000)
    assert "fps" in line and "primary rays/s" in line
    assert "mean fps" in s.mean_stats()
    assert s.num_measurements == 1


def test_timing_benchmark():
    bm = BenchMark()
    bm.start("a")
    time.sleep(0.01)
    bm.stop("a")
    with bm.time_scope("b"):
        time.sleep(0.002)
    rows = bm.collect_timing_results()
    assert rows[0][0] == "a"  # sorted by total desc
    assert rows[0][2] >= rows[1][2]
    assert "a:" in bm.report()
    with pytest.raises(KeyError):
        bm.stop("never-started")


def test_film_variance_hook():
    f = Film(4)
    idx = jnp.array([0, 0, 0], dtype=jnp.int32)
    for v in (1.0, 2.0, 3.0):
        f.add_samples(idx[:1], jnp.full((1, 3), v))
    var = np.asarray(f.get_estimated_variances())[0]
    # reference formula is the variance of the MEAN: for {1,2,3}:
    # 14/(3*2) - 36/(9*2) = 1/3, scaled by 50 (film.rs:50-67)
    np.testing.assert_allclose(var, 50.0 / 3.0, rtol=1e-4)


def test_tonemap_color_space_roundtrip():
    # tonemap.rs:53-70 parity test
    rgb = jnp.array([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(to_rgb(to_xyz(rgb))), np.asarray(rgb),
                               atol=1e-5)
    # the unused maps execute and return finite values
    assert np.isfinite(np.asarray(luminance_simple_map(rgb))).all()
    assert np.isfinite(np.asarray(gamma_map(rgb))).all()


def test_png_io_roundtrip(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 255, (8, 12, 3))).astype(np.uint8)
    p = tmp_path / "x.png"
    write_png(p, img)
    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


def test_u32_unpack():
    pix = np.array([0xFF112233], dtype=np.uint32)
    rgba = u32_to_rgba8(pix, 1, 1)
    np.testing.assert_array_equal(rgba[0, 0], [0x11, 0x22, 0x33, 0xFF])
