"""Independent scalar reference tracer (numpy, per-pixel loops).

A from-scratch implementation of the reference semantics
(raytracer/mod.rs:80-261) used as a correctness oracle for the
vectorized wavefront pipeline: direct Phong lighting with shadow rays,
geometric normals, the exact accept criteria of intersect.rs:62-98.
Deliberately slow and simple; only run on tiny images in tests.
"""

from __future__ import annotations

import numpy as np

F32_EPS = np.float32(1.1920929e-07)


def mt_intersect(o, d, v0, v1, v2):
    """Scalar Möller–Trumbore with the reference accept criteria.
    Returns (t, u, v) or None."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(d, e2)
    det = np.dot(e1, pvec)
    if abs(det) < F32_EPS:
        return None
    inv_det = 1.0 / det
    tvec = o - v0
    u = np.dot(tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1)
    v = np.dot(d, qvec) * inv_det
    t = np.dot(e2, qvec) * inv_det
    if u < 0.0 or u > 1.0:
        return None
    if v < 0.0 or u + v > 1.0:
        return None
    if t < 0.0:
        return None
    return t, u, v


def closest_hit(o, d, tris):
    """tris: (N, 3, 3). Returns (t, u, v, idx) or None."""
    best = None
    for i, tri in enumerate(tris):
        res = mt_intersect(o, d, tri[0], tri[1], tri[2])
        if res is not None and (best is None or res[0] < best[0]):
            best = (res[0], res[1], res[2], i)
    return best


def shade_direct(buf, o, d, hit):
    """Scalar Phong shading of one hit (mod.rs:207-261).
    buf: SceneBuffers."""
    t, u, v, idx = hit
    tri = buf.tri_verts[idx]
    n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
    n = n / np.linalg.norm(n)
    hp = o + t * d
    accum = np.zeros(3, np.float64)
    view = d / np.linalg.norm(d)
    geom = buf.tri_geom[idx]
    for lpos, lcol in zip(buf.light_pos, buf.light_color):
        to_light = lpos - hp
        tln = to_light / np.linalg.norm(to_light)
        dot_ln = float(np.dot(n, tln))
        if dot_ln < 0.0:
            continue
        shadow_o = hp + 0.01 * to_light
        sh = closest_hit(shadow_o, to_light, buf.tri_verts)
        blocked = sh is not None and 0.01 < sh[0] < 1.0
        if blocked:
            continue
        tex_id = buf.mat_tex_id[geom]
        if tex_id >= 0:
            h, w = buf.tex_hw[tex_id]
            x = min(max(int(u * w), 0), w - 1)
            y = min(max(int(v * h), 0), h - 1)
            diffuse = buf.tex_atlas[tex_id, y, x]
        else:
            diffuse = buf.mat_diffuse_rgb[geom]
        reflected = 2.0 * dot_ln * n - tln
        spec = float(np.dot(view, reflected)) ** 32
        accum += (diffuse * dot_ln + spec) * lcol
    return accum


def render_direct(buf, camera, width, height, jitter=(0.5, 0.5)):
    """Direct-lighting-only image (recursions=0 equivalent), fixed jitter.
    Returns (height, width, 3) float64 radiance."""
    img = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            o, d = camera.get_ray(x, y, jitter)
            hit = closest_hit(o, d, buf.tri_verts)
            if hit is not None:
                img[y, x] = shade_direct(buf, o, d, hit)
    return img
