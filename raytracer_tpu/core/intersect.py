"""Batched Möller–Trumbore ray-triangle intersection (pure jnp).

Capability parity with the reference intersection layer
(reference: raytracer_lib/src/raytracer/intersect.rs:62-98,
`intersect_late_out`) and the brute-force intersector it feeds
(no_acceleration_intersector.rs:13-41), re-designed batch-first: one call
intersects a whole ray wavefront against the whole (or a tile of the)
triangle buffer, scanning triangle chunks to bound memory.

Accept criteria match the reference exactly:
  |det| >= f32::EPSILON  (parallel rejection, intersect.rs:70-75)
  0 <= u <= 1, v >= 0, u + v <= 1, t >= 0  (intersect.rs:88-96)
Closest hit = smallest accepted t; ties resolve to the lower triangle
index (the reference keeps the first strict minimum, intersect order =
buffer order, `<` comparison at no_acceleration_intersector.rs:33).

This is the correctness oracle; the production path is the Pallas kernel
in ops.pallas_intersect, property-tested against this module (the same
oracle pattern as the reference's NoAccelerationIntersector).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

F32_EPSILON = 1.1920929e-07  # f32::EPSILON, matches intersect.rs:70
BIG_T = 3.0e38  # sentinel "no hit" distance (< f32 max, safe in arithmetic)


def _mt_block(origins, dirs, v0, v1, v2):
    """Möller–Trumbore for all (ray, tri) pairs of a block.

    origins/dirs: (R, 3); v0/v1/v2: (T, 3).
    Returns (t, u, v, hit) each (R, T); t is BIG_T where hit is False.
    """
    v0v1 = v1 - v0                       # (T, 3)
    v0v2 = v2 - v0                       # (T, 3)
    d = dirs[:, None, :]                 # (R, 1, 3)
    pvec = jnp.cross(d, v0v2[None, :, :])            # (R, T, 3)
    det = jnp.einsum("tc,rtc->rt", v0v1, pvec)       # (R, T)
    non_parallel = jnp.abs(det) >= F32_EPSILON
    inv_det = 1.0 / jnp.where(non_parallel, det, 1.0)
    tvec = origins[:, None, :] - v0[None, :, :]      # (R, T, 3)
    u = jnp.einsum("rtc,rtc->rt", tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, v0v1[None, :, :])         # (R, T, 3)
    v = jnp.einsum("rc,rtc->rt", dirs, qvec) * inv_det
    t = jnp.einsum("tc,rtc->rt", v0v2, qvec) * inv_det
    hit = (non_parallel
           & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0)
           & (t >= 0.0))
    return jnp.where(hit, t, BIG_T), u, v, hit


@partial(jax.jit, static_argnames=("chunk",))
def closest_hit(origins, dirs, tri_verts, chunk: int = 512):
    """Closest-hit query of R rays against all N triangles.

    Returns dict with t (R,), u (R,), v (R,), tri (R,) int32 (closest
    triangle index, 0 when no hit), hit (R,) bool.
    """
    R = origins.shape[0]
    N = tri_verts.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return dict(t=jnp.full((R,), BIG_T), u=z, v=z,
                    tri=jnp.zeros((R,), jnp.int32),
                    hit=jnp.zeros((R,), bool))

    pad = (-N) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    n_chunks = tv.shape[0] // chunk
    tv = tv.reshape(n_chunks, chunk, 3, 3)
    # Padded (degenerate, all-zero) triangles always fail the |det| test.

    def body(carry, tri_block):
        best_t, best_u, best_v, best_i, ci = carry
        v0, v1, v2 = tri_block[:, 0], tri_block[:, 1], tri_block[:, 2]
        t, u, v, hit = _mt_block(origins, dirs, v0, v1, v2)
        # per-block argmin; ties -> lowest index (jnp.argmin is first-min)
        j = jnp.argmin(t, axis=1)                                # (R,)
        rows = jnp.arange(R)
        tj, uj, vj = t[rows, j], u[rows, j], v[rows, j]
        idx = ci * chunk + j
        better = tj < best_t
        carry = (jnp.where(better, tj, best_t),
                 jnp.where(better, uj, best_u),
                 jnp.where(better, vj, best_v),
                 jnp.where(better, idx.astype(jnp.int32), best_i),
                 ci + 1)
        return carry, None

    init = (jnp.full((R,), BIG_T), jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.int32),
            jnp.int32(0))
    (t, u, v, i, _), _ = jax.lax.scan(body, init, tv)
    hit = t < BIG_T
    return dict(t=t, u=u, v=v, tri=jnp.where(hit, i, 0), hit=hit)


@partial(jax.jit, static_argnames=("chunk",))
def any_hit_window(origins, dirs, tri_verts, t_min=0.01, t_max=1.0,
                   chunk: int = 512):
    """Occlusion query: does ANY triangle intersect with t_min < t < t_max?

    Matches the reference shadow test exactly (raytracer/mod.rs:224-230):
    the occluder window is strict on both ends and t is measured along the
    *unnormalized* direction.  Returns blocked (R,) bool.

    Note the reference runs a full closest-hit for shadows and then
    window-checks the closest t.  A closer occluder outside the window
    (t <= t_min) therefore UNBLOCKS the light even if a farther occluder
    is inside it.  We reproduce that: find closest t, then window-check.
    """
    res = closest_hit(origins, dirs, tri_verts, chunk=chunk)
    return res["hit"] & (res["t"] > t_min) & (res["t"] < t_max)
