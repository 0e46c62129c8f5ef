"""Synthetic COLLADA fixture builder (Blender-2.80 export dialect).

Generates minimal .dae documents with the same library order and element
structure the reference loader requires (colladaloader.rs:59-135), so
parser tests don't depend on the bundled scene files.
"""

TEMPLATE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset>
    <up_axis>Z_UP</up_axis>
  </asset>
  <library_cameras>
    <camera id="Camera-camera" name="Camera">
      <optics><technique_common><perspective>
        <xfov sid="xfov">{xfov}</xfov>
        <aspect_ratio>1.777778</aspect_ratio>
        <znear sid="znear">0.1</znear>
        <zfar sid="zfar">100</zfar>
      </perspective></technique_common></optics>
    </camera>
  </library_cameras>
  <library_lights>
    <light id="Light-light" name="Light">
      <technique_common><point>
        <color sid="color">{light_color}</color>
        <constant_attenuation>1</constant_attenuation>
      </point></technique_common>
    </light>
  </library_lights>
  <library_effects>
    <effect id="Material-effect">
      <profile_COMMON>
        <technique sid="common"><lambert>
          <emission><color sid="emission">0 0 0 1</color></emission>
          <diffuse><color sid="diffuse">{diffuse}</color></diffuse>
          <index_of_refraction><float sid="ior">1.45</float></index_of_refraction>
        </lambert></technique>
      </profile_COMMON>
    </effect>
  </library_effects>
  <library_images/>
  <library_materials>
    <material id="Material-material" name="Material">
      <instance_effect url="#Material-effect"/>
    </material>
  </library_materials>
  <library_geometries>
    <geometry id="Tri-mesh" name="Tri">
      <mesh>
        <source id="Tri-mesh-positions">
          <float_array id="Tri-mesh-positions-array" count="{n_floats}">{positions}</float_array>
          <technique_common>
            <accessor source="#Tri-mesh-positions-array" count="{n_verts}" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="Tri-mesh-vertices">
          <input semantic="POSITION" source="#Tri-mesh-positions"/>
        </vertices>
        <triangles material="Material-material" count="{n_tris}">
          <input semantic="VERTEX" source="#Tri-mesh-vertices" offset="0"/>
          <input semantic="NORMAL" source="#Tri-mesh-normals" offset="1"/>
          <input semantic="TEXCOORD" source="#Tri-mesh-map-0" offset="2" set="0"/>
          <p>{indices}</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="Scene" name="Scene">
      <node id="Camera" name="Camera" type="NODE">
        <matrix sid="transform">{cam_matrix}</matrix>
        <instance_camera url="#Camera-camera"/>
      </node>
      <node id="Light" name="Light" type="NODE">
        <matrix sid="transform">{light_matrix}</matrix>
        <instance_light url="#Light-light"/>
      </node>
      <node id="Tri" name="Tri" type="NODE">
        <matrix sid="transform">{geom_matrix}</matrix>
        <instance_geometry url="#Tri-mesh" name="Tri"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene>
    <instance_visual_scene url="#Scene"/>
  </scene>
</COLLADA>"""

IDENT = "1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1"


def make_doc(positions, indices, xfov=39.59775, light_color="10 10 10",
             diffuse="0.8 0.2 0.1 1", cam_matrix=IDENT, light_matrix=IDENT,
             geom_matrix=IDENT):
    """positions: flat list of floats; indices: per-corner POSITION indices
    (NORMAL/TEXCOORD indices are synthesized as 0)."""
    tri_stream = " ".join(f"{i} 0 0" for i in indices)
    return TEMPLATE.format(
        xfov=xfov, light_color=light_color, diffuse=diffuse,
        positions=" ".join(str(p) for p in positions),
        n_floats=len(positions), n_verts=len(positions) // 3,
        n_tris=len(indices) // 3, indices=tri_stream,
        cam_matrix=cam_matrix, light_matrix=light_matrix,
        geom_matrix=geom_matrix,
    )


def translate_matrix(x, y, z):
    """COLLADA (column-major listing) translation matrix string."""
    return f"1 0 0 {x} 0 1 0 {y} 0 0 1 {z} 0 0 0 1"
