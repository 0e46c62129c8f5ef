"""CLI frontend tests (flag parity with raytracer/src/main.rs:26-100)."""

import subprocess
import sys

import numpy as np
import pytest

from raytracer_tpu.cli import build_parser


def test_default_flags_match_reference():
    args = build_parser().parse_args([])
    assert args.file == "./data/thai2.dae"      # main.rs:13-15
    assert args.max_triangles == 70
    assert args.frame_iterations == 0
    assert args.width == 1024
    assert args.height == 768


def test_short_flags():
    args = build_parser().parse_args(
        ["-f", "x.dae", "-m", "30", "-i", "5", "--width", "64", "--height", "48"])
    assert (args.file, args.max_triangles, args.frame_iterations) == ("x.dae", 30, 5)
    assert (args.width, args.height) == (64, 48)


def test_cli_end_to_end(tmp_path, data_dir):
    out = tmp_path / "out.png"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from raytracer_tpu.cli import main; import sys;"
         f"sys.exit(main(['-f', '{data_dir}/4boxes.dae', '-m', '70',"
         f" '-i', '2', '--width', '32', '--height', '24',"
         f" '--accel', 'brute', '--out', '{out}']))"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "fps" in proc.stdout and "mean fps" in proc.stdout
    assert "max triangles: 70" in proc.stdout
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (24, 32, 3)
    # rows_per_frame=50 wraps a 24-row image, so everything is sampled:
    # scene content (lit boxes) and black background must both appear
    assert (img.max(axis=-1) > 0).any()
    assert (img.max(axis=-1) == 0).any()


def test_cli_bad_file():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from raytracer_tpu.cli import main; import sys;"
         "sys.exit(main(['-f', 'missing.dae']))"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
