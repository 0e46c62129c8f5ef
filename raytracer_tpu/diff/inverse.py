"""Inverse rendering: optimize scene parameters from target images.

The BASELINE.json config #5 workload: recover vertex positions and
material albedo (any differentiable scene leaves) by gradient descent
on pixel loss, optionally sharded over a device mesh
(parallel.render.make_sharded_train_step).
"""

from __future__ import annotations

import dataclasses
import jax
import optax

from raytracer_tpu.diff.gradients import pixel_loss


def extract_params(scene, fields):
    """Pull the optimized leaves out of a SceneArrays pytree."""
    return {f: getattr(scene, f) for f in fields}


def merge_params(scene, params: dict):
    return dataclasses.replace(scene, **params)


def make_train_step(optimizer, cam, px, py, width, height, intersector,
                    target, recursions: int = 0, spread: int = 1,
                    jitter=None):
    """Single-device jitted train step over a dict of optimized leaves.
    Pass a fixed `jitter` (matching the target render) for deterministic
    optimization; otherwise each step re-jitters (stochastic loss)."""

    def loss_fn(params, scene, key):
        merged = merge_params(scene, params)
        return pixel_loss(merged, cam, px, py, key, width, height,
                          intersector, target, recursions, spread, jitter)

    @jax.jit
    def step(params, opt_state, scene, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def optimize(scene, cam, px, py, width, height, intersector, target,
             fields=("mat_diffuse_rgb",), steps: int = 100,
             learning_rate: float = 1e-2, seed: int = 0,
             recursions: int = 0, spread: int = 1, jitter=None,
             verbose: bool = False):
    """Run inverse rendering; returns (optimized scene, loss history)."""
    optimizer = optax.adam(learning_rate)
    params = extract_params(scene, fields)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, cam, px, py, width, height,
                           intersector, target, recursions, spread, jitter)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, scene, sub)
        losses.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"step {i}: loss {losses[-1]:.6f}")
    return merge_params(scene, params), losses
