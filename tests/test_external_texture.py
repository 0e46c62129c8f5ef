"""External-artifact validation: the one binary artifact in the
reference repo that this build did NOT generate is
data/blender_cycles_ico3.png — the texture ico3_tex.dae binds via
<init_from> (reference: data/ico3_tex.dae library_images).

NOTE (documented in docs/PARITY.md): despite the filename, the PNG is
NOT a Blender Cycles render of the scene — it is a scribble-pattern
texture (uniform 0xED1C24-ish red background, hand-drawn strokes).  No
rendered ground-truth image exists anywhere in the reference, so
"allclose vs a Cycles render" is not a test anyone can write.  What CAN
be validated against the raw external bytes is the whole texture chain:

  PNG bytes -> loader (/256 quirk, texture.rs:34-50)
            -> scene flattening / atlas packing
            -> per-hit barycentric texel lookup in the render
               (mod.rs:244-247 + texture.rs:21-27)

These tests recompute every step with independent numpy on the raw PNG
and require exact equality with the pipeline's values.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from raytracer_tpu.models.collada import ColladaLoader

W, H = 96, 96


@pytest.fixture(scope="module")
def scene(data_dir):
    return ColladaLoader.from_file(data_dir / "ico3_tex.dae",
                                   width=W, height=H, verbose=False)


@pytest.fixture(scope="module")
def png(data_dir):
    return np.asarray(Image.open(
        data_dir / "blender_cycles_ico3.png").convert("RGB"))


def test_texture_atlas_matches_external_png_bytes(scene, png):
    """Loaded atlas == raw PNG / 256 (the reference's off-by-one-ish
    normalization, texture.rs:44: u8 as f32 / 256.0), exactly."""
    buf = scene.to_buffers()
    th, tw = buf.tex_hw[0]
    assert (th, tw) == png.shape[:2]
    np.testing.assert_array_equal(
        np.asarray(buf.tex_atlas[0, :th, :tw]),
        (png.astype(np.float32) / 256.0))


def test_rendered_texels_match_independent_png_lookup(scene, png):
    """End-to-end: trace primary rays, take each textured hit's
    barycentric (u, v), and check the pipeline's diffuse color equals an
    INDEPENDENT numpy nearest-neighbour lookup straight into the raw
    external PNG (x = int(u*w), y = int(v*h); mod.rs:244-247)."""
    import jax

    from raytracer_tpu.core.intersectors import BruteForceIntersector
    from raytracer_tpu.core.shade import sample_diffuse

    buf = scene.to_buffers()
    dev = buf.to_device()
    cam = scene.cameras[0].params()
    from raytracer_tpu.models.camera import generate_rays
    px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
    py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
    jit = jnp.full((W * H, 2), 0.5, jnp.float32)
    o, d = generate_rays(cam, px, py, jit, W, H)
    hit = BruteForceIntersector().query(dev, o, d)

    geom = np.asarray(dev.tri_geom)[np.asarray(hit["tri"])]
    tex_id = np.asarray(dev.mat_tex_id)[geom]
    sel = np.asarray(hit["hit"]) & (tex_id >= 0)
    assert sel.sum() > 100, "expected many textured hits on ico3_tex"

    got = np.asarray(sample_diffuse(dev, hit["tri"], hit["u"], hit["v"]))[sel]

    # independent reimplementation on the raw bytes
    th, tw = png.shape[:2]
    u = np.asarray(hit["u"])[sel]
    v = np.asarray(hit["v"])[sel]
    x = np.clip((u * tw).astype(np.int64), 0, tw - 1)
    y = np.clip((v * th).astype(np.int64), 0, th - 1)
    want = png[y, x].astype(np.float32) / 256.0
    np.testing.assert_array_equal(got, want)
    # and the lookup actually exercises the external content: the
    # scribble texture has many distinct texel values
    assert len(np.unique((want * 256).astype(np.uint8).reshape(-1, 3),
                         axis=0)) > 10
