"""Checkpoint/resume for inverse-rendering runs.

The reference has no persistence at all (its film lives in memory and
dies on exit; SURVEY §5 'Checkpoint/resume: none').  Long inverse
renderings on pod slices need it, so this wraps orbax: the optimized
parameter dict, optimizer state, and step counter round-trip to disk.

    mgr = CheckpointManager("/tmp/run1")
    mgr.save(step, params, opt_state)
    step, params, opt_state = mgr.restore(params, opt_state)
"""

from __future__ import annotations

import os


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params, opt_state) -> None:
        self.manager.save(
            step,
            args=self._ocp.args.Composite(
                params=self._ocp.args.StandardSave(params),
                opt_state=self._ocp.args.StandardSave(opt_state),
            ),
        )
        self.manager.wait_until_finished()

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, params_like, opt_state_like):
        """Restore the latest checkpoint using templates for structure.
        Returns (step, params, opt_state); raises if none exist."""
        step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                params=self._ocp.args.StandardRestore(params_like),
                opt_state=self._ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return step, restored["params"], restored["opt_state"]
