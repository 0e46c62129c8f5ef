"""Engine-level sharded rendering on the 8-device CPU mesh."""

import numpy as np

from raytracer_tpu import create_raytracer_from_file
from raytracer_tpu.parallel.mesh import make_mesh


def test_render_sharded_matches_single(data_dir):
    W, H = 32, 16
    rt = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                    width=W, height=H, accel="brute",
                                    recursions=0, seed=11)
    mesh = make_mesh()
    hdr = rt.render_sharded(spp=1, mesh=mesh)
    assert hdr.shape == (H, W, 3)
    samples = np.asarray(rt.film.num_samples)
    assert (samples == 1).all()

    rt2 = create_raytracer_from_file(str(data_dir / "4boxes.dae"),
                                     width=W, height=H, accel="brute",
                                     recursions=0, seed=11)
    hdr2 = rt2.render(spp=1)
    # different RNG partitioning (per-device keys vs per-frame key), but
    # the same scene and deterministic shading structure: image stats
    # must agree closely on a direct-lighting render
    assert abs(float(hdr.mean()) - float(hdr2.mean())) < 0.05 * (abs(float(hdr2.mean())) + 1e-3)
    # silhouette pixels flip with different jitter draws at 1 spp
    assert ((hdr.max(-1) > 0) == (np.asarray(hdr2).max(-1) > 0)).mean() > 0.9
