"""Checkpoint/resume tests for inverse-rendering state."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracer_tpu.diff.checkpoint import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    params = {"mat_diffuse_rgb": jnp.array([[0.1, 0.2, 0.3]])}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, params, opt_state)
    assert mgr.latest_step() == 3

    zeros = {"mat_diffuse_rgb": jnp.zeros((1, 3))}
    step, p, s = CheckpointManager(str(tmp_path / "ckpt")).restore(
        zeros, opt.init(zeros))
    assert step == 3
    np.testing.assert_allclose(np.asarray(p["mat_diffuse_rgb"]),
                               [[0.1, 0.2, 0.3]], rtol=1e-6)


def test_restore_empty_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "none"))
    with pytest.raises(FileNotFoundError):
        mgr.restore({}, {})


def test_max_to_keep(tmp_path):
    params = {"x": jnp.zeros((2,))}
    opt = optax.sgd(1e-2)
    st = opt.init(params)
    mgr = CheckpointManager(str(tmp_path / "k"), max_to_keep=2)
    for i in range(4):
        mgr.save(i, params, st)
    assert mgr.latest_step() == 3
    assert len(mgr.manager.all_steps()) <= 2
