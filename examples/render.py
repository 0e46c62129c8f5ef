"""Render a bundled scene to PNG.

    python examples/render.py [scene.dae] [out.png]

Equivalent of running the reference's native frontend headlessly
(raytracer/src/main.rs) — same progressive engine underneath.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rtx
from raytracer_tpu.utils.png_io import write_png
from raytracer_tpu.utils.stats import Stats


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "data/ico2.dae"
    out = sys.argv[2] if len(sys.argv) > 2 else "render.png"
    rt = rtx.create_raytracer_from_file(scene, width=800, height=600)
    stats = Stats()
    for _ in range(-(-rt.height // rt.rows_per_frame) * 4):   # 4 spp
        n = rt.trace_frame_additive()
        print(stats.stats(n))
    print(stats.mean_stats())
    write_png(out, rt.get_tonemapped_image())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
