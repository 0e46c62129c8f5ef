"""Native C++ runtime tests: parsers and Morton ordering vs numpy
fallbacks (both paths must agree exactly)."""

import numpy as np
import pytest

from raytracer_tpu import native
from raytracer_tpu.ops.cluster import morton_codes


def test_native_library_compiles():
    native._load()
    assert native.available, "g++ toolchain present but native lib failed"


def test_parse_floats():
    out = native.parse_floats("1 2.5 -3e2\n4.25\t0.001")
    np.testing.assert_allclose(out, [1, 2.5, -300, 4.25, 0.001], rtol=1e-6)
    assert out.dtype == np.float32


def test_parse_floats_matches_python(data_dir):
    import re
    text = (data_dir / "thai2.dae").read_text()
    m = re.search(r'<float_array[^>]*>([^<]*)<', text)
    payload = m.group(1)
    fast = native.parse_floats(payload)
    slow = np.array([float(x) for x in payload.split()], dtype=np.float32)
    np.testing.assert_array_equal(fast, slow)


def test_parse_ints():
    out = native.parse_ints("0 1 42 100000 7")
    np.testing.assert_array_equal(out, [0, 1, 42, 100000, 7])
    assert out.dtype == np.int64


def test_deindex():
    verts = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([2, 0, 3, 1, 1, 2], dtype=np.int64)
    out = native.deindex(verts, idx)
    np.testing.assert_array_equal(out, verts[idx])


def test_morton_order_matches_numpy():
    rng = np.random.default_rng(3)
    tris = rng.uniform(-4, 4, size=(500, 3, 3)).astype(np.float32)
    fast = native.morton_order(tris)
    centroids = tris.mean(axis=1)
    lo = tris.reshape(-1, 3).min(axis=0)
    hi = tris.reshape(-1, 3).max(axis=0)
    slow = np.argsort(morton_codes(centroids, lo, hi), kind="stable")
    # orders must both be valid Morton sorts; codes of the sorted
    # sequences must be identical (centroid rounding can differ by ULPs,
    # so compare the induced code sequences, not raw indices)
    codes = morton_codes(centroids, lo, hi)
    np.testing.assert_array_equal(np.sort(fast), np.arange(500))
    assert (np.diff(codes[fast].astype(np.int64)) >= 0).all()
    assert (codes[fast] == codes[slow]).mean() > 0.99
