"""Batched Phong direct-lighting with shadow rays.

Capability parity with the reference shading (reference:
raytracer_lib/src/raytracer/mod.rs:198-261), with every quirk preserved:

- Geometric normals only: normalize(cross(v1-v0, v2-v0)), no vertex
  normals (mod.rs:198-205); the normal is NOT flipped toward the viewer.
- Per light: the triangle is skipped when dot(normal, to_light) < 0
  (strictly; == 0 still contributes specular, mod.rs:218-220).
- Shadow ray: origin offset by 0.01 * unnormalized to-light direction;
  blocked iff the *closest* hit satisfies 0.01 < t < 1.0 (mod.rs:224-230).
- Phong: diffuse (color or texture) * dot_ln + WHITE specular *
  dot(view, reflected)^32 with view = normalize(ray.dir) pointing INTO
  the surface and the dot not clamped before the power (mod.rs:239-257).
  The reference's powf(x, 32.0) is even-integer exact, so we use repeated
  squaring (x^32 >= 0 even for negative dot) — jnp.power would NaN on
  negative bases.
- Texture lookup: barycentric (u, v) straight into nearest-neighbour texel
  coords (mod.rs:244-247 + texture.rs:21-27); the reference panics
  out-of-bounds, we clamp.
- Emissive is loaded but unused by shading, exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def pow32(x):
    """x**32 via repeated squaring — exact even-power semantics for
    negative bases (Rust powf(x, 32.0), mod.rs:255)."""
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return x16 * x16


def geometric_normal(tri_verts, tri_idx):
    """Face normal per hit (mod.rs:198-205). tri_idx: (R,) int32."""
    tv = tri_verts[tri_idx]                 # (R, 3, 3)
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    n = jnp.cross(e1, e2)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.where(norm > 0, norm, 1.0)


def _normalize(v):
    # explicit component form (bit-identical to the in-kernel
    # pallas_bvh._norm3; jnp.linalg.norm differs by 1 ulp)
    n = jnp.sqrt(v[..., 0:1] * v[..., 0:1] + v[..., 1:2] * v[..., 1:2]
                 + v[..., 2:3] * v[..., 2:3])
    return v / jnp.where(n > 0, n, 1.0)


def sample_diffuse(scene, tri_idx, u, v):
    """Material diffuse per hit: flat color or nearest-neighbour texel at
    the barycentric (u, v) (mod.rs:242-248).  Returns (R, 3)."""
    geom = scene.tri_geom[tri_idx]                     # (R,)
    rgb = scene.mat_diffuse_rgb[geom]                  # (R, 3)
    tex_id = scene.mat_tex_id[geom]                    # (R,)
    safe_tex = jnp.maximum(tex_id, 0)
    hw = scene.tex_hw[safe_tex]                        # (R, 2)
    h, w = hw[:, 0], hw[:, 1]
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    texel = scene.tex_atlas[safe_tex, y, x]            # (R, 3)
    return jnp.where((tex_id >= 0)[:, None], texel, rgb)


def build_slot_records(scene, perm, num_slots):
    """Packed per-slot shading records for the forward fast path:
    one (S, 8) row per intersector slot = [unit normal (3), diffuse rgb
    (3), tex_id (1), material/geometry id (1)].  Built once on device
    (the gathers here run once per scene, not once per ray), so
    `prepare_shade_fast` needs a single (R, 8) row gather per level
    instead of five scattered ones.  Column 7 (the material id) backs
    the compact in-kernel record format: the fused kernels extract
    [normal, matid] only, and the driver resolves diffuse/texture from
    the tiny per-material tables in XLA.

    NOT differentiable w.r.t. scene parameters by design — training
    paths use `prepare_shade`, which reads the live scene arrays.
    """
    safe = jnp.clip(perm, 0, scene.tri_verts.shape[0] - 1)
    tv = scene.tri_verts[safe]                              # (S, 3, 3)
    n = jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm > 0, norm, 1.0)
    geom = scene.tri_geom[safe]
    rgb = scene.mat_diffuse_rgb[geom]                       # (S, 3)
    tex = scene.mat_tex_id[geom].astype(jnp.float32)        # (S,)
    gid = geom.astype(jnp.float32)
    return jnp.concatenate([n, rgb, tex[:, None], gid[:, None]], axis=1)


def prepare_shade_fused(scene, origins, dirs, hit, has_textures):
    """Forward-only variant of `prepare_shade` for intersectors that
    extract the winning triangle's shading record IN-KERNEL
    (hit["rec"] = (R, 6|7): normal xyz, diffuse rgb[, tex id]) — no
    slot-record gather at all.  Semantics identical to
    `prepare_shade`."""
    t, u, v = hit["t"], hit["u"], hit["v"]
    hit_mask = hit["hit"]
    rec = hit["rec"]
    normal = rec[:, 0:3]
    diffuse_rgb = rec[:, 3:6]

    if has_textures:
        tex_id = rec[:, 6].astype(jnp.int32)
        safe_tex = jnp.maximum(tex_id, 0)
        hw = scene.tex_hw[safe_tex]
        h, w = hw[:, 0], hw[:, 1]
        x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
        texel = scene.tex_atlas[safe_tex, y, x]
        diffuse_rgb = jnp.where((tex_id >= 0)[:, None], texel, diffuse_rgb)

    t = jnp.where(hit_mask, t, 0.0)
    hit_point = origins + t[:, None] * dirs
    view = _normalize(dirs)

    L = scene.light_pos.shape[0]
    to_light = scene.light_pos[:, None, :] - hit_point[None, :, :]
    tl_n = _normalize(to_light)
    dot_ln = jnp.sum(normal[None] * tl_n, axis=-1)
    facing = dot_ln >= 0.0
    shadow_origin = hit_point[None] + 0.01 * to_light
    shadow_alive = hit_mask[None] & facing

    return dict(
        hit_mask=hit_mask, normal=normal, hit_point=hit_point,
        diffuse_rgb=diffuse_rgb, view=view, tl_n=tl_n, dot_ln=dot_ln,
        facing=facing, num_lights=L,
        shadow_origins=shadow_origin.reshape(L * hit_point.shape[0], 3),
        shadow_dirs=to_light.reshape(L * hit_point.shape[0], 3),
        shadow_alive=shadow_alive.reshape(-1),
    )


def prepare_shade_fast(scene, origins, dirs, hit, records, has_textures):
    """Forward-only variant of `prepare_shade`: all per-hit scene
    lookups come from one (R, 8) gather of the packed slot records
    (normal, diffuse, tex id).  Texture sampling (the only remaining
    scattered lookup) happens only when the scene actually has textures
    (static flag).  Semantics identical to `prepare_shade`."""
    t, u, v = hit["t"], hit["u"], hit["v"]
    hit_mask = hit["hit"]
    rec = records[hit["slot"]]                               # (R, 8)
    normal = rec[:, 0:3]
    diffuse_rgb = rec[:, 3:6]

    if has_textures:
        tex_id = rec[:, 6].astype(jnp.int32)
        safe_tex = jnp.maximum(tex_id, 0)
        hw = scene.tex_hw[safe_tex]
        h, w = hw[:, 0], hw[:, 1]
        x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
        texel = scene.tex_atlas[safe_tex, y, x]
        diffuse_rgb = jnp.where((tex_id >= 0)[:, None], texel, diffuse_rgb)

    t = jnp.where(hit_mask, t, 0.0)
    hit_point = origins + t[:, None] * dirs
    view = _normalize(dirs)

    L = scene.light_pos.shape[0]
    to_light = scene.light_pos[:, None, :] - hit_point[None, :, :]
    tl_n = _normalize(to_light)
    dot_ln = jnp.sum(normal[None] * tl_n, axis=-1)
    facing = dot_ln >= 0.0
    shadow_origin = hit_point[None] + 0.01 * to_light
    shadow_alive = hit_mask[None] & facing

    return dict(
        hit_mask=hit_mask, normal=normal, hit_point=hit_point,
        diffuse_rgb=diffuse_rgb, view=view, tl_n=tl_n, dot_ln=dot_ln,
        facing=facing, num_lights=L,
        shadow_origins=shadow_origin.reshape(L * hit_point.shape[0], 3),
        shadow_dirs=to_light.reshape(L * hit_point.shape[0], 3),
        shadow_alive=shadow_alive.reshape(-1),
    )


def prepare_shade(scene, origins, dirs, hit):
    """Phase 1 of Phong shading (mod.rs:207-261): everything except the
    occlusion results.  Returns a context dict including the shadow-ray
    batch for all lights, flattened light-major to (L*R, 3), so the
    caller can fold the occlusion queries into a larger traversal batch.
    """
    t, u, v = hit["t"], hit["u"], hit["v"]
    tri_idx, hit_mask = hit["tri"], hit["hit"]

    # Sanitize t for missed rays (t = BIG_T sentinel): their radiance is
    # masked to zero in phase 2, but letting BIG_T reach the position
    # math creates inf intermediates whose cotangents become NaN under
    # autodiff even through jnp.where.
    t = jnp.where(hit_mask, t, 0.0)
    normal = geometric_normal(scene.tri_verts, tri_idx)      # (R, 3)
    hit_point = origins + t[:, None] * dirs                  # (R, 3)
    diffuse_rgb = sample_diffuse(scene, tri_idx, u, v)       # (R, 3)
    view = _normalize(dirs)                                  # (R, 3)

    L = scene.light_pos.shape[0]
    to_light = scene.light_pos[:, None, :] - hit_point[None, :, :]  # (L,R,3)
    tl_n = _normalize(to_light)
    dot_ln = jnp.sum(normal[None] * tl_n, axis=-1)           # (L, R)
    facing = dot_ln >= 0.0                                   # mod.rs:218
    shadow_origin = hit_point[None] + 0.01 * to_light        # mod.rs:224-225

    # only rays that hit AND face the light need occlusion tests
    # (the reference culls back-facing before its shadow test too,
    # mod.rs:218-221); aliveness lets block-skipping intersectors skip
    shadow_alive = hit_mask[None] & facing                   # (L, R)

    return dict(
        hit_mask=hit_mask, normal=normal, hit_point=hit_point,
        diffuse_rgb=diffuse_rgb, view=view, tl_n=tl_n, dot_ln=dot_ln,
        facing=facing, num_lights=L,
        shadow_origins=shadow_origin.reshape(L * hit_point.shape[0], 3),
        shadow_dirs=to_light.reshape(L * hit_point.shape[0], 3),
        shadow_alive=shadow_alive.reshape(-1),
    )


def finish_shade(scene, ctx, blocked_flat):
    """Phase 2: combine occlusion results (blocked_flat: (L*R,)) into
    radiance (R, 3), zero where the primary ray missed."""
    R = ctx["hit_point"].shape[0]
    blocked = blocked_flat.reshape(ctx["num_lights"], R)
    accum = jnp.zeros((R, 3), dtype=ctx["hit_point"].dtype)
    for li in range(ctx["num_lights"]):
        dot_ln = ctx["dot_ln"][li]
        reflected = (2.0 * dot_ln[:, None] * ctx["normal"]
                     - ctx["tl_n"][li])                      # mod.rs:252-253
        spec = pow32(jnp.sum(ctx["view"] * reflected, axis=-1))
        contrib = (ctx["diffuse_rgb"] * dot_ln[:, None]
                   + spec[:, None]) * scene.light_color[li]
        lit = ctx["facing"][li] & ~blocked[li] & ctx["hit_mask"]
        accum = accum + jnp.where(lit[:, None], contrib, 0.0)
    return jnp.where(ctx["hit_mask"][:, None], accum, 0.0)


def shade(scene, origins, dirs, hit, shadow_query):
    """Phong direct lighting for a wavefront of hits (mod.rs:207-261) —
    the single-call form: runs the occlusion queries immediately via
    shadow_query(origins, dirs, alive) -> blocked.  The wavefront
    pipeline uses prepare_shade/finish_shade instead to batch occlusion
    into larger traversals."""
    ctx = prepare_shade(scene, origins, dirs, hit)
    blocked = shadow_query(ctx["shadow_origins"], ctx["shadow_dirs"],
                           ctx["shadow_alive"])
    return finish_shade(scene, ctx, blocked)
