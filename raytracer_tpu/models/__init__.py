"""Scene model: containers, camera, textures, and loaders.

TPU-native equivalent of the reference scene layer
(reference: raytracer_lib/src/scene/).  The in-memory representation is
flat SoA numpy buffers (`SceneBuffers`) that upload to a single device
pytree (`SceneArrays`) — no per-object pointer chasing on device.
"""

from raytracer_tpu.models.types import (
    Material, Light, Scene, Geometry, SceneBuffers, SceneArrays,
    DEBUG_MAGENTA,
)
from raytracer_tpu.models.camera import Camera
from raytracer_tpu.models.texture import Texture, load_texture

__all__ = [
    "Material", "Light", "Scene", "Geometry", "SceneBuffers", "SceneArrays",
    "Camera", "Texture", "load_texture", "DEBUG_MAGENTA",
]
