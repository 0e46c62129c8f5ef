"""Texture-path tests: textured rendering (BASELINE config #3 scene) and
gradients with respect to texels."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.diff.gradients import pixel_loss, render_pixels
from raytracer_tpu.models.collada import ColladaLoader

W, H = 24, 18


@pytest.fixture(scope="module")
def tex_scene(data_dir):
    scene = ColladaLoader.from_file(data_dir / "ico3_tex.dae", width=W,
                                    height=H, verbose=False)
    return scene, scene.to_buffers().to_device()


def test_textured_render_uses_texture(tex_scene):
    scene, dev = tex_scene
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    jitter = jnp.full((W * H, 2), 0.5, jnp.float32)
    isect = BruteForceIntersector()
    key = jax.random.PRNGKey(0)
    base = render_pixels(dev, cam, px, py, key, W, H, isect,
                         recursions=0, jitter=jitter)
    # zeroing the texture must change the image (texture actually sampled)
    dark = dataclasses.replace(dev, tex_atlas=jnp.zeros_like(dev.tex_atlas))
    changed = render_pixels(dark, cam, px, py, key, W, H, isect,
                            recursions=0, jitter=jitter)
    assert float(jnp.abs(base - changed).max()) > 1e-3


def test_gradient_wrt_texels_nonzero_and_matches_fd(tex_scene):
    scene, dev = tex_scene
    cam = scene.cameras[0].params()
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    jitter = jnp.full((W * H, 2), 0.5, jnp.float32)
    isect = BruteForceIntersector()
    key = jax.random.PRNGKey(0)
    target = render_pixels(dev, cam, px, py, key, W, H, isect,
                           recursions=0, jitter=jitter) * 0.7

    def loss(atlas):
        s = dataclasses.replace(dev, tex_atlas=atlas)
        return pixel_loss(s, cam, px, py, key, W, H, isect, target,
                          recursions=0, jitter=jitter)

    g = jax.grad(loss)(dev.tex_atlas)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    nz = np.nonzero(np.abs(g) > 1e-10)
    assert len(nz[0]) > 0, "no texel received gradient"

    # FD-check the largest-gradient texel
    flat = np.abs(g).reshape(-1)
    idx = int(flat.argmax())
    eps = 1e-2
    a = np.asarray(dev.tex_atlas).copy().reshape(-1)
    a_plus, a_minus = a.copy(), a.copy()
    a_plus[idx] += eps
    a_minus[idx] -= eps
    fd = (float(loss(jnp.asarray(a_plus.reshape(dev.tex_atlas.shape))))
          - float(loss(jnp.asarray(a_minus.reshape(dev.tex_atlas.shape))))) / (2 * eps)
    assert g.reshape(-1)[idx] == pytest.approx(fd, rel=0.05)
