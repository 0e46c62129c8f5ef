"""Pinhole camera with interactive rotate/move and batched jittered ray-gen.

Capability parity with the reference camera (reference:
raytracer_lib/src/scene/camera.rs:5-99), with two deliberate quirk
reproductions:

- `xfov` drives BOTH axes; the COLLADA aspect ratio is parsed but ignored
  (camera.rs:41-44), so max_x == max_y == tan(fov/2).
- The y direction is negated in ray dirs (camera.rs:85) and ray dirs are
  NOT normalized (z component fixed at 1 pre-rotation).

The TPU-first difference: ray generation is batched.  `CameraParams` is a
small pytree (rotation matrix + origin + film half-extents) consumed by
the jitted `generate_rays` over whole pixel blocks, so it is
differentiable with respect to camera pose for inverse rendering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from raytracer_tpu import vecmath as vm

F = np.float32


@dataclass
class CameraParams:
    """Pytree consumed by jitted ray generation.

    rot:    (4, 4) float32 — current rotation matrix (row-vector convention)
    origin: (3,)   float32 — camera position ((0,0,0,1) @ orientation)
    max_x, max_y: half-extents of the film plane at z=1 (camera.rs:41-44)
    """
    rot: object
    origin: object
    max_x: object
    max_y: object


def _register():
    import jax
    jax.tree_util.register_pytree_node(
        CameraParams,
        lambda c: ((c.rot, c.origin, c.max_x, c.max_y), None),
        lambda _, ch: CameraParams(*ch),
    )


_register()


class Camera:
    """Interactive camera state (host side).

    Construction mirrors `Camera::from_orientation_matrix`
    (camera.rs:22-61): the rotation matrix is the orientation matrix with
    its translation row (e[12..14]) and last column (e[3], e[7], e[11])
    zeroed, e[15] = 1.
    """

    def __init__(self, width: int, height: int, orientation_matrix: np.ndarray,
                 fov_deg: float):
        rot = np.array(orientation_matrix, dtype=F).reshape(-1).copy()
        rot[3] = rot[7] = rot[11] = 0.0
        rot[12] = rot[13] = rot[14] = 0.0
        rot[15] = 1.0

        fov = F(fov_deg) * np.pi / 180.0
        self.max_x = F(np.tan(0.5 * fov))
        self.max_y = F(np.tan(0.5 * fov))  # aspect ratio ignored, camera.rs:41-44

        self.width = width
        self.height = height
        self.x_angle_radians = 0.0
        self.y_angle_radians = 0.0
        self.pos = np.zeros(3, dtype=F)
        self.base_orientation_matrix = np.array(orientation_matrix, dtype=F).reshape(-1)
        self.base_rotation_matrix = rot
        self.orientation_matrix = vm.mat_ident()
        self.rotation_matrix = vm.mat_ident()
        self._update_matrices()

    @staticmethod
    def from_orientation_matrix(width, height, orientation_matrix, fov_deg):
        return Camera(width, height, orientation_matrix, fov_deg)

    # -- interactive controls (each invalidates the film upstream,
    #    reference: raytracer/src/main.rs:123-163) ------------------------

    def add_x_angle(self, radians: float):
        """camera.rs:63-66"""
        self.x_angle_radians += radians
        self._update_matrices()

    def add_y_angle(self, radians: float):
        """camera.rs:68-71"""
        self.y_angle_radians += radians
        self._update_matrices()

    def move_rel(self, x: float, y: float, z: float):
        """camera.rs:73-78"""
        self.pos = self.pos + np.array([x, y, z], dtype=F)
        self._update_matrices()

    def _update_matrices(self):
        """camera.rs:92-98"""
        self.rotation_matrix = vm.mat_mul(
            vm.mat_mul(vm.mat_rot_x(self.x_angle_radians),
                       vm.mat_rot_y(self.y_angle_radians)),
            self.base_rotation_matrix,
        )
        self.orientation_matrix = vm.mat_mul(
            vm.mat_mul(self.rotation_matrix, vm.mat_translate(self.pos)),
            self.base_orientation_matrix,
        )

    # -- device params ----------------------------------------------------

    def params(self) -> CameraParams:
        import jax.numpy as jnp
        origin = self.orientation_matrix[12:15]  # (0,0,0,1) @ O, camera.rs:88
        return CameraParams(
            rot=jnp.asarray(self.rotation_matrix.reshape(4, 4)),
            origin=jnp.asarray(origin),
            max_x=jnp.asarray(self.max_x),
            max_y=jnp.asarray(self.max_y),
        )

    def get_ray(self, u: int, v: int, jitter=(0.5, 0.5)):
        """Scalar single-ray generation (host/numpy) — the direct analogue
        of Camera::get_ray (camera.rs:80-90).  Used by tests/oracles; the
        hot path is `generate_rays` below."""
        dir_x = -self.max_x + 2.0 * self.max_x * ((u + jitter[0]) / self.width)
        dir_y = -self.max_y + 2.0 * self.max_y * ((v + jitter[1]) / self.height)
        d4 = np.array([dir_x, -dir_y, 1.0, 1.0], dtype=F)
        d = vm.mat_mul_vec4(self.rotation_matrix, d4)[:3]
        pos = self.orientation_matrix[12:15].copy()
        return pos, d


def generate_rays(cam: CameraParams, px: "jnp.ndarray", py: "jnp.ndarray",
                  jitter: "jnp.ndarray", width: int, height: int):
    """Batched jittered primary-ray generation (jit/differentiable).

    px, py: (R,) integer pixel coordinates; jitter: (R, 2) in [0, 1).
    Returns (origins (R, 3), dirs (R, 3)); dirs are unnormalized with the
    pre-rotation z component = 1, exactly like camera.rs:80-90.
    """
    import jax.numpy as jnp
    dir_x = -cam.max_x + 2.0 * cam.max_x * ((px.astype(jnp.float32) + jitter[:, 0]) / width)
    dir_y = -cam.max_y + 2.0 * cam.max_y * ((py.astype(jnp.float32) + jitter[:, 1]) / height)
    d = jnp.stack([dir_x, -dir_y, jnp.ones_like(dir_x)], axis=-1)  # (R, 3)
    dirs = d @ cam.rot[:3, :3]  # row-vector convention, w term is zero
    origins = jnp.broadcast_to(cam.origin, dirs.shape)
    return origins, dirs
