"""Golden-image regression tests: deterministic direct-lighting renders
(fixed jitter 0.5, no bounces) against committed reference arrays.

These lock the end-to-end forward semantics (ray-gen -> intersect ->
shade) across refactors; the goldens were produced by this pipeline and
cross-checked against the scalar oracle (tests/test_engine.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.diff.gradients import render_pixels
from raytracer_tpu.models.collada import ColladaLoader


@pytest.mark.parametrize("name", ["4boxes", "ico2"])
def test_golden_direct_render(data_dir, name):
    W, H = 64, 48
    golden = np.load(f"tests/golden/{name}_{W}x{H}_direct.npy")
    scene = ColladaLoader.from_file(data_dir / f"{name}.dae", width=W,
                                    height=H, verbose=False)
    dev = scene.to_buffers().to_device()
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    jit = jnp.full((W * H, 2), 0.5, jnp.float32)
    rad = render_pixels(dev, cam, px, py, jax.random.PRNGKey(0), W, H,
                        BruteForceIntersector(), recursions=0, jitter=jit)
    img = np.asarray(rad).reshape(H, W, 3)
    # tight overall, with a tiny allowance for edge pixels under
    # cross-platform f32 differences
    close = np.isclose(img, golden, rtol=1e-4, atol=1e-5).all(axis=-1)
    assert close.mean() > 0.995, f"golden mismatch on {(~close).sum()} pixels"
