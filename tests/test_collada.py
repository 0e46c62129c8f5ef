"""COLLADA loader tests: dialect behavior + bundled-scene golden counts
(the reference's only parse test is an embedded Blender cube doc,
colladaloader.rs:720-908; we test the same dialect via synthetic
fixtures plus the real bundled scenes)."""

import numpy as np
import pytest

from raytracer_tpu.models.collada import Collada, ColladaError, ColladaLoader
from tests import fixtures


def test_parse_synthetic_doc():
    doc = fixtures.make_doc(
        positions=[0, 0, 0, 1, 0, 0, 0, 1, 0],
        indices=[0, 1, 2],
    )
    collada = Collada.parse(doc)
    assert len(collada.cameras) == 1
    assert collada.cameras[0].fov == pytest.approx(39.59775)
    assert len(collada.lights) == 1
    np.testing.assert_allclose(collada.lights[0].color, [10, 10, 10])
    assert len(collada.geometries) == 1
    assert list(collada.geometries[0].triangles) == [0, 1, 2]
    assert len(collada.nodes) == 3


def test_strict_library_order_enforced():
    doc = fixtures.make_doc(positions=[0, 0, 0, 1, 0, 0, 0, 1, 0],
                            indices=[0, 1, 2])
    # swap cameras and lights libraries -> order error like the reference
    swapped = doc.replace("<library_cameras>", "<TMP>") \
                 .replace("</library_cameras>", "</TMP>") \
                 .replace("<library_lights>", "<library_cameras>") \
                 .replace("</library_lights>", "</library_cameras>") \
                 .replace("<TMP>", "<library_lights>") \
                 .replace("</TMP>", "</library_lights>")
    with pytest.raises(ColladaError):
        Collada.parse(swapped)


def test_not_collada_doc():
    with pytest.raises(ColladaError) as e:
        Collada.parse("<notcollada/>")
    assert e.value.variant == "NotColladaDoc"


def test_flatten_bakes_node_matrix():
    doc = fixtures.make_doc(
        positions=[0, 0, 0, 1, 0, 0, 0, 1, 0],
        indices=[0, 1, 2],
        geom_matrix=fixtures.translate_matrix(10, 20, 30),
    )
    scene = ColladaLoader.from_str(doc, verbose=False)
    g = scene.geometries[0]
    # collada translation (10,20,30) maps to scene (10,30,20) with the
    # axis swap (collada_types.rs tests) and vertex (1,0,0) keeps +x
    np.testing.assert_allclose(g.vertices[1], [11, 30, 20], atol=1e-5)


def test_flatten_light_position_transformed():
    doc = fixtures.make_doc(
        positions=[0, 0, 0, 1, 0, 0, 0, 1, 0],
        indices=[0, 1, 2],
        light_matrix=fixtures.translate_matrix(1, 2, 3),
    )
    scene = ColladaLoader.from_str(doc, verbose=False)
    np.testing.assert_allclose(scene.lights[0].pos, [1, 3, 2], atol=1e-6)


def test_material_resolution():
    doc = fixtures.make_doc(positions=[0, 0, 0, 1, 0, 0, 0, 1, 0],
                            indices=[0, 1, 2], diffuse="0.8 0.2 0.1 1")
    scene = ColladaLoader.from_str(doc, verbose=False)
    m = scene.geometries[0].material
    np.testing.assert_allclose(m.diffuse_rgb, [0.8, 0.2, 0.1], atol=1e-6)
    assert m.diffuse_tex_id == -1
    assert m.index_of_refraction == pytest.approx(1.45)
    assert m.specular is None  # no <reflectivity> in fixture


@pytest.mark.parametrize("name,tris,geoms,textures", [
    ("4boxes.dae", 48, 4, 0),
    ("ico2.dae", 608, 5, 0),
    ("ico3_tex.dae", 608, 5, 1),
    ("thai2.dae", 20049, 2, 0),
])
def test_bundled_scene_counts(data_dir, name, tris, geoms, textures):
    scene = ColladaLoader.from_file(data_dir / name, verbose=False)
    assert scene.num_triangles == tris
    assert len(scene.geometries) == geoms
    assert len(scene.textures) == textures
    assert len(scene.cameras) == 1
    assert len(scene.lights) == 1


def test_ico3_texture_material(data_dir):
    scene = ColladaLoader.from_file(data_dir / "ico3_tex.dae", verbose=False)
    tex_ids = [g.material.diffuse_tex_id for g in scene.geometries]
    assert max(tex_ids) == 0  # one geometry references texture 0
    assert scene.textures[0].ndim == 3
    # /256 normalization keeps texels strictly below 1.0 (texture.rs:34-50)
    assert scene.textures[0].max() < 1.0


def test_scene_buffers_roundtrip(data_dir):
    scene = ColladaLoader.from_file(data_dir / "4boxes.dae", verbose=False)
    buf = scene.to_buffers()
    assert buf.tri_verts.shape == (48, 3, 3)
    assert buf.tri_geom.shape == (48,)
    assert buf.tri_geom.max() == 3
    assert buf.light_pos.shape == (1, 3)
    arrays = buf.to_device()
    assert arrays.num_triangles == 48
