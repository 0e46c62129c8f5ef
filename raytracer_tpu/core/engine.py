"""The RayTracer engine: progressive additive rendering over ray batches.

Capability parity with the reference tracer driver (reference:
raytracer_lib/src/raytracer/mod.rs:32-129):

- `trace_frame_additive()` renders `rows_per_frame` (default 50,
  mod.rs:87) rows, one jittered sample per pixel, additively into the
  film, advancing a progressive row cursor with wraparound
  (mod.rs:80-117), and returns the number of primary rays traced.
- `get_tonemapped_pixels()` = film mean -> Reinhard -> packed u32
  (mod.rs:120-129).
- Camera motion helpers clear the film, like the keyboard handlers in
  the native frontend (raytracer/src/main.rs:123-163).

TPU-native design: one jitted step function renders a whole row-block
wavefront (ray-gen + bounce levels + shadows) on device; the film is
updated with a dense per-row-block add.  `render(spp)` is the batch-mode
API the reference lacks (it only has the progressive loop).

Known reference bug, reproduced only behind `compat_v_bug=True`: the
reference computes the pixel row for ray generation as `idx / height`
instead of `idx / width` (mod.rs:96), which scrambles ray rows whenever
width != height.  Default is the corrected mapping (v = actual row).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from raytracer_tpu.core.film import Film
from raytracer_tpu.core.intersectors import make_intersector
from raytracer_tpu.core.tonemap import pack_u32, simple_map
from raytracer_tpu.core.wavefront import (RECURSIONS, SUB_SPREAD,
                                          trace_radiance,
                                          trace_radiance_fused)
from raytracer_tpu.models.camera import generate_rays

# reference: oct_tree_intersector.rs:12
DEFAULT_TRIANGLES_PER_LEAF = 70


class RayTracer:
    def __init__(self, scene, width: int, height: int,
                 intersector=None,
                 triangles_per_leaf: int = DEFAULT_TRIANGLES_PER_LEAF,
                 accel: str = "bvh",
                 recursions: int = RECURSIONS, spread: int = SUB_SPREAD,
                 rows_per_frame: int = 50,
                 compat_v_bug: bool = False,
                 sort_key_mode: str = "dir6",
                 accel_opts: dict | None = None,
                 spp_pool: int | None = None,
                 sort_payload: str = "ride",
                 rng_impl: str = "threefry",
                 seed: int = 0):
        self.width = width
        self.height = height
        self.scene = scene
        self.scene_buffers = scene.to_buffers()
        self.scene_arrays = self.scene_buffers.to_device()
        if not scene.cameras:
            raise ValueError("scene has no camera (reference uses scene.cameras[0], lib.rs:36)")
        self.camera = scene.cameras[0]
        self.film = Film(width * height)
        self.current_row = 0
        self.rows_per_frame = rows_per_frame
        self.recursions = recursions
        self.spread = spread
        self.compat_v_bug = compat_v_bug
        self.sort_key_mode = sort_key_mode
        self.sort_payload = sort_payload
        self.intersector = intersector or make_intersector(
            accel, self.scene_buffers, triangles_per_leaf=triangles_per_leaf,
            **(accel_opts or {}))
        # "threefry" (default) is JAX's reference PRNG; "rbg" swaps in
        # the TPU-native rng_bit_generator (cheaper draws — the threefry
        # Gaussians cost ~19 ms/frame at 1 spp, round-4 trace).  Both
        # wavefront paths draw from the same keys, so fused/unfused and
        # pooled/unpooled equivalences hold under either impl; absolute
        # images differ between impls.
        if rng_impl == "threefry":
            self._key = jax.random.PRNGKey(seed)
        else:
            self._key = jax.random.key(seed, impl=rng_impl)
        self._row_block_cache = {}
        self._sharded_render = None
        self._sharded_mesh = None
        self._sharded_pool = None
        self._step = self._make_step()
        self._frame_steps = {}
        # spp pooling: render `pool` spp samples per wavefront so every
        # level's bounce rays share ONE global sort (pool-times denser
        # key bins -> tighter 128-ray blocks at L1/L2, where the
        # MT-volume coherence wall is).  None = auto (8 when the
        # intersector supports whole-level fusion, else 1).
        self.spp_pool = spp_pool

    @classmethod
    def from_scene(cls, scene, width, height, **kwargs):
        """reference: build_raytracer (lib.rs:29-44)"""
        return cls(scene, width, height, **kwargs)

    # -- jitted wavefront step -------------------------------------------

    def _shade_fast_args(self):
        """Forward-only shading fast path: packed slot records + static
        has-textures flag (None/True when the intersector has no packed
        slot layout) + whether the intersector extracts records
        IN-KERNEL (fused, no gather).  Built once; the engine treats
        scene materials as fixed (training paths construct their own
        steps without it)."""
        if getattr(self.intersector, "perm", None) is None:
            return None, True, False
        from raytracer_tpu.core.shade import build_slot_records
        has_tex = bool((np.asarray(self.scene_buffers.mat_tex_id) >= 0).any())
        if getattr(self, "_slot_records", None) is None:
            self._slot_records = build_slot_records(
                self.scene_arrays, self.intersector.perm,
                self.intersector.perm.shape[0])
            if hasattr(self.intersector, "set_shade_records"):
                # full record format: normal xyz + diffuse rgb (+ tex
                # id).  The compact "mat" format (normal + material id,
                # diffuse via an XLA table gather) measured 2.72 vs
                # 2.82 Mrays/s on thai2 (round 5) — the masked (RB, C)
                # record reductions are effectively free on the VPU
                # while the 16.7M-row table gather is not.
                self.intersector.set_shade_records(
                    self._slot_records[:, :7 if has_tex else 6])
        fused = bool(getattr(self.intersector, "supports_fused_shade", False))
        return self._slot_records, has_tex, fused

    def _radiance_fn(self):
        """The per-batch radiance closure: whole-level fused kernels when
        the intersector supports them (TPU, texture-free scenes), the
        composable wavefront otherwise."""
        isect = self.intersector
        rec, spread = self.recursions, self.spread
        records, has_tex, fused = self._shade_fast_args()
        if getattr(isect, "supports_fused_spawn", False):
            def fn(scene, origins, dirs, kt):
                return trace_radiance_fused(
                    scene, origins, dirs, kt, isect, rec, spread,
                    sort_key_mode=self.sort_key_mode,
                    sort_payload=self.sort_payload)
        else:
            def fn(scene, origins, dirs, kt):
                return trace_radiance(scene, origins, dirs, kt, isect,
                                      rec, spread, shade_records=records,
                                      has_textures=has_tex,
                                      fused_shade=fused,
                                      sort_key_mode=self.sort_key_mode)
        return fn

    def _make_step(self):
        W, H = self.width, self.height
        radiance = self._radiance_fn()

        def step(scene, cam, px, py, key):
            kj, kt = jax.random.split(key)
            jitter = jax.random.uniform(kj, (px.shape[0], 2), dtype=jnp.float32)
            origins, dirs = generate_rays(cam, px, py, jitter, W, H)
            return radiance(scene, origins, dirs, kt)

        return jax.jit(step)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # Spatial tile size for ray ordering: rays that share a 128-lane
    # kernel block come from a compact 16x8 pixel tile, so cluster-AABB
    # culling and early-t pruning act on coherent bundles instead of
    # 128-pixel scanline strips.
    TILE_W, TILE_H = 16, 8

    def _row_block(self):
        """Pixel coordinates for the next `rows_per_frame` rows (host),
        tile-swizzled for block coherence.  Cached per cursor position
        (the cursor cycles through a small set of start rows)."""
        cached = self._row_block_cache.get(self.current_row)
        if cached is not None:
            return cached
        rows = (self.current_row + np.arange(self.rows_per_frame)) % self.height
        px = np.tile(np.arange(self.width, dtype=np.int32), self.rows_per_frame)
        py_actual = np.repeat(rows.astype(np.int32), self.width)
        order = np.lexsort((px % self.TILE_W, py_actual % self.TILE_H,
                            px // self.TILE_W, py_actual // self.TILE_H))
        px, py_actual = px[order], py_actual[order]
        idx = py_actual * self.width + px
        if self.compat_v_bug:
            # mod.rs:96 — v = idx / height with idx = row*width + i
            py_ray = (idx // self.height).astype(np.int32)
        else:
            py_ray = py_actual
        out = (jnp.asarray(px), jnp.asarray(py_ray), jnp.asarray(idx))
        self._row_block_cache[self.current_row] = out
        return out

    # -- reference API ----------------------------------------------------

    def trace_frame_additive(self) -> int:
        """One progressive frame: rows_per_frame rows, 1 spp, additive
        (mod.rs:80-117).  Returns num primary rays (= rows * width)."""
        px, py, idx = self._row_block()
        radiance = self._step(self.scene_arrays, self.camera.params(),
                              px, py, self._next_key())
        self.film.add_samples(idx, radiance)
        self.current_row = (self.current_row + self.rows_per_frame) % self.height
        return self.rows_per_frame * self.width

    def get_tonemapped_pixels(self) -> np.ndarray:
        """Film mean -> Reinhard -> 0xAARRGGBB u32 (mod.rs:120-129)."""
        hdr = self.film.get_pixels()
        return np.asarray(pack_u32(simple_map(hdr)))

    # -- camera controls (main.rs:123-163: every move clears the film) ----

    def move_camera(self, x: float, y: float, z: float):
        self.camera.move_rel(x, y, z)
        self.film.clear()

    def rotate_camera(self, x_radians: float = 0.0, y_radians: float = 0.0):
        if x_radians:
            self.camera.add_x_angle(x_radians)
        if y_radians:
            self.camera.add_y_angle(y_radians)
        self.film.clear()

    # -- batch-mode API (TPU-native; no reference equivalent) -------------

    def _make_frame_step(self, pool: int = 1):
        """One jitted call per full frame: swizzled ray-gen, the whole
        wavefront, and the un-swizzle back to pixel order as a pure
        reshape/transpose (no gather), so the film update is a dense add
        (no scatter).

        pool > 1: each loop iteration renders `pool` spp samples in ONE
        pooled wavefront (trace_radiance_fused pool mode) — the key
        chain, per-sample RNG streams and film moments are identical to
        `pool` unpooled iterations; only the float summation grouping of
        the film add differs."""
        W, H = self.width, self.height
        TW, TH = self.TILE_W, self.TILE_H
        Wp, Hp = -(-W // TW) * TW, -(-H // TH) * TH

        # tile-swizzled pixel coordinates (baked constants)
        ys, xs = np.meshgrid(np.arange(Hp, dtype=np.int32),
                             np.arange(Wp, dtype=np.int32), indexing="ij")
        swz = lambda a: (a.reshape(Hp // TH, TH, Wp // TW, TW)
                         .transpose(0, 2, 1, 3).reshape(-1))
        px = jnp.asarray(swz(xs))
        py_actual = swz(ys)
        if self.compat_v_bug:
            idx = py_actual * W + px  # mod.rs:96 (v = idx / height)
            py = jnp.asarray((np.asarray(idx) // H).astype(np.int32))
        else:
            py = jnp.asarray(py_actual)

        if pool > 1:
            # pooled mode runs the fused wavefront directly (the only
            # radiance path with a pool axis)
            self._shade_fast_args()
            assert getattr(self.intersector, "supports_fused_spawn", False)
            isect, rec, spread = self.intersector, self.recursions, self.spread

            def render_pool(scene, cam, key):
                os_, ds_, kts = [], [], []
                for _ in range(pool):
                    key, k = jax.random.split(key)
                    kj, kt = jax.random.split(k)
                    jitter = jax.random.uniform(kj, (px.shape[0], 2),
                                                dtype=jnp.float32)
                    o, d = generate_rays(cam, px, py, jitter, W, H)
                    os_.append(o)
                    ds_.append(d)
                    kts.append(kt)
                rad = trace_radiance_fused(
                    scene, jnp.concatenate(os_), jnp.concatenate(ds_),
                    jnp.stack(kts), isect, rec, spread,
                    sort_key_mode=self.sort_key_mode, pool=pool,
                    sort_payload=self.sort_payload)
                img = (rad.reshape(pool, Hp // TH, Wp // TW, TH, TW, 3)
                       .transpose(0, 1, 3, 2, 4, 5)
                       .reshape(pool, Hp, Wp, 3))
                return img[:, :H, :W].reshape(pool, H * W, 3), key

            def frame_loop(scene, cam, psum, psq, ns, key, iters):
                def body(_, carry):
                    psum, psq, ns, key = carry
                    radp, key = render_pool(scene, cam, key)
                    return (psum + radp.sum(axis=0),
                            psq + (radp * radp).sum(axis=0),
                            ns + float(pool), key)
                return jax.lax.fori_loop(0, iters, body,
                                         (psum, psq, ns, key))

            return jax.jit(frame_loop, donate_argnums=(2, 3, 4))

        radiance = self._radiance_fn()

        def render_once(scene, cam, key):
            kj, kt = jax.random.split(key)
            jitter = jax.random.uniform(kj, (px.shape[0], 2),
                                        dtype=jnp.float32)
            origins, dirs = generate_rays(cam, px, py, jitter, W, H)
            rad = radiance(scene, origins, dirs, kt)
            img = (rad.reshape(Hp // TH, Wp // TW, TH, TW, 3)
                   .transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, 3))
            return img[:H, :W].reshape(H * W, 3)

        def frame_loop(scene, cam, psum, psq, ns, key, spp):
            # whole spp loop + film accumulation on device: ONE dispatch
            # per render() call (host round-trips cost ~30 ms each here)
            def body(_, carry):
                psum, psq, ns, key = carry
                key, k = jax.random.split(key)
                rad = render_once(scene, cam, k)
                return (psum + rad, psq + rad * rad, ns + 1.0, key)
            return jax.lax.fori_loop(0, spp, body, (psum, psq, ns, key))

        return jax.jit(frame_loop, donate_argnums=(2, 3, 4))

    def _choose_pool(self, spp: int) -> int:
        """Largest divisor of spp within the pool budget (auto: 8 on
        the fused TPU path — measured round 5 — else 1)."""
        budget = self.spp_pool
        if budget is None:
            self._shade_fast_args()
            budget = (8 if getattr(self.intersector,
                                   "supports_fused_spawn", False) else 1)
        budget = max(1, min(budget, spp))
        for p in range(budget, 0, -1):
            if spp % p == 0:
                return p
        return 1

    def render(self, spp: int = 1) -> np.ndarray:
        """Render the full frame at `spp` samples per pixel; returns HDR
        (H, W, 3) float32 mean radiance.  One jitted whole-frame loop
        with dense film accumulation (the progressive row loop is only
        for reference-parity interactive use)."""
        pool = self._choose_pool(spp)
        step = self._frame_steps.get(pool)
        if step is None:
            step = self._frame_steps[pool] = self._make_frame_step(pool)
        f = self.film
        psum, psq, ns, self._key = step(
            self.scene_arrays, self.camera.params(),
            f.pixel_sum, f.pixel_sum_sq, f.num_samples, self._key,
            jnp.int32(spp // pool))
        f.pixel_sum, f.pixel_sum_sq, f.num_samples = psum, psq, ns
        return self.get_hdr()

    def get_hdr(self) -> np.ndarray:
        return np.asarray(self.film.get_pixels()).reshape(self.height, self.width, 3)

    def get_tonemapped_image(self) -> np.ndarray:
        """Current film as a tonemapped uint8 (H, W, 3) image (unsampled
        pixels white, like the u32 path)."""
        ldr = simple_map(self.film.get_pixels())
        ldr = jnp.where(jnp.isnan(ldr), 1.0, jnp.clip(ldr, 0.0, 1.0))
        return np.asarray((ldr * 255.0).astype(jnp.uint8)).reshape(
            self.height, self.width, 3)

    def render_image(self, spp: int = 1) -> np.ndarray:
        """Tonemapped uint8 (H, W, 3) image."""
        self.render(spp)
        return self.get_tonemapped_image()

    # -- multi-chip rendering (parallel/render.py) ------------------------

    def render_sharded(self, spp: int = 1, mesh=None) -> np.ndarray:
        """Full-frame render with pixels sharded over a device mesh
        (rays data-parallel, scene replicated).  The spp loop and film
        moments accumulate on device — ONE dispatch per call, like
        `render` — then fold into the film with a dense add (pixel_grid
        is row-major, so shard slices line up with film indices)."""
        from raytracer_tpu.parallel.mesh import make_mesh
        from raytracer_tpu.parallel.render import (
            _per_device_keys, make_sharded_frame_loop, pixel_grid)
        mesh = mesh or make_mesh()
        fused_spawn = bool(getattr(self.intersector,
                                   "supports_fused_spawn", False))
        pool = self._choose_pool(spp) if fused_spawn else 1
        if (self._sharded_render is None or self._sharded_mesh is not mesh
                or self._sharded_pool != pool):
            records, has_tex, fused = self._shade_fast_args()
            self._sharded_render = make_sharded_frame_loop(
                mesh, self.intersector, self.width, self.height,
                self.recursions, self.spread,
                shade_records=records, has_textures=has_tex,
                fused_shade=fused,
                fused_spawn=fused_spawn,
                sort_key_mode=self.sort_key_mode,
                spp_pool=pool, sort_payload=self.sort_payload)
            self._sharded_mesh = mesh
            self._sharded_pool = pool
        px, py, real = pixel_grid(self.width, self.height,
                                  pad_to=mesh.devices.size)
        keys = _per_device_keys(self._next_key(), mesh)
        psum, psq = self._sharded_render(
            self.scene_arrays, self.camera.params(),
            jnp.asarray(px), jnp.asarray(py), keys, jnp.int32(spp))
        f = self.film
        f.pixel_sum = f.pixel_sum + psum[:real]
        f.pixel_sum_sq = f.pixel_sum_sq + psq[:real]
        f.num_samples = f.num_samples + float(spp)
        return self.get_hdr()
