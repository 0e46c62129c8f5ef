"""PNG write/read helpers for headless output.

The reference shows frames in a native window / browser canvas
(raytracer/src/main.rs:221-253, raytracer_wasm); the TPU-world
equivalent is headless PNG output plus the live viewer in
raytracer_tpu.viewer.  Uses PIL when present, falling back to a
minimal pure-stdlib PNG encoder (zlib) so the framework has no hard
imaging dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path, image: np.ndarray):
    """image: (H, W, 3) uint8."""
    image = np.ascontiguousarray(image, dtype=np.uint8)
    try:
        from PIL import Image
        Image.fromarray(image).save(path)
        return
    except ImportError:
        pass

    h, w, _ = image.shape
    raw = b"".join(b"\x00" + image[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def u32_to_rgba8(pixels_u32: np.ndarray, width: int, height: int) -> np.ndarray:
    """Unpack 0xAARRGGBB u32 pixels into (H, W, 4) uint8 — the repack the
    WASM frontend does before putImageData (raytracer_wasm/src/lib.rs:46-52)."""
    p = pixels_u32.reshape(height, width).astype(np.uint32)
    r = (p >> 16) & 0xFF
    g = (p >> 8) & 0xFF
    b = p & 0xFF
    a = (p >> 24) & 0xFF
    return np.stack([r, g, b, a], axis=-1).astype(np.uint8)
