"""Inverse rendering demo (BASELINE config #5 shape): recover material
albedo from a target image by pixel-gradient descent, optionally
sharded over every visible device.

    python examples/inverse_rendering.py [--sharded] [--steps 150]

On a CPU dev box run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 to simulate a
multi-chip mesh (add `import jax; jax.config.update("jax_platforms",
"cpu")` if a TPU platform is pinned).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracer_tpu.core.intersectors import BruteForceIntersector
from raytracer_tpu.diff.gradients import render_pixels
from raytracer_tpu.diff.inverse import optimize
from raytracer_tpu.models.collada import ColladaLoader
from raytracer_tpu.parallel.mesh import make_mesh
from raytracer_tpu.parallel.render import (
    _per_device_keys, make_sharded_render, make_sharded_train_step, pixel_grid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/4boxes.dae")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    args = ap.parse_args()
    W, H = args.width, args.height

    scene = ColladaLoader.from_file(args.scene, width=W, height=H, verbose=False)
    dev = scene.to_buffers().to_device()
    cam = scene.cameras[0].params()
    isect = BruteForceIntersector()
    true_albedo = np.asarray(dev.mat_diffuse_rgb)

    if args.sharded:
        mesh = make_mesh()
        print(f"mesh: {mesh.devices.size} devices")
        px, py, _ = pixel_grid(W, H, pad_to=mesh.devices.size)
        px, py = jnp.asarray(px), jnp.asarray(py)
        keys = _per_device_keys(jax.random.PRNGKey(0), mesh)
        render = make_sharded_render(mesh, isect, W, H, recursions=0)
        target = render(dev, cam, px, py, keys)
        opt = optax.adam(5e-2)
        step = make_sharded_train_step(mesh, isect, W, H, opt, recursions=0)
        start = dataclasses.replace(
            dev, mat_diffuse_rgb=jnp.full_like(dev.mat_diffuse_rgb, 0.5))
        diff = {"mat_diffuse_rgb": start.mat_diffuse_rgb}
        st = opt.init(diff)
        for i in range(args.steps):
            loss, st, diff = step(st, diff, start, cam, px, py, target, keys)
            if i % 20 == 0:
                print(f"step {i:4d}  loss {float(loss):.6f}")
        recovered = np.asarray(diff["mat_diffuse_rgb"])
    else:
        px = jnp.asarray(np.tile(np.arange(W, dtype=np.int32), H))
        py = jnp.asarray(np.repeat(np.arange(H, dtype=np.int32), W))
        jitter = jnp.full((W * H, 2), 0.5, jnp.float32)
        target = render_pixels(dev, cam, px, py, jax.random.PRNGKey(0),
                               W, H, isect, recursions=0, jitter=jitter)
        start = dataclasses.replace(
            dev, mat_diffuse_rgb=jnp.full_like(dev.mat_diffuse_rgb, 0.5))
        recovered_scene, losses = optimize(
            start, cam, px, py, W, H, isect, target,
            fields=("mat_diffuse_rgb",), steps=args.steps,
            learning_rate=5e-2, jitter=jitter, verbose=True)
        recovered = np.asarray(recovered_scene.mat_diffuse_rgb)

    err = np.abs(recovered - true_albedo).max()
    print("true albedo:\n", np.round(true_albedo, 3))
    print("recovered:\n", np.round(recovered, 3))
    print("max abs error:", round(float(err), 4))


if __name__ == "__main__":
    main()
