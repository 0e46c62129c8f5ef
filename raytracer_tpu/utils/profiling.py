"""Device-side profiling hooks.

The reference's opt-in `timing` crate covers host phases
(utils/timing.py); this module adds the TPU-side equivalent the
reference could not have: jax.profiler traces viewable in
TensorBoard/Perfetto, plus named step annotations.

    from raytracer_tpu.utils.profiling import trace, annotate
    with trace("/tmp/rtx-trace"):
        with annotate("render-frame"):
            rt.trace_frame_additive()
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def trace(log_dir: str):
    """Capture a device trace into log_dir (open with TensorBoard's
    profile plugin or Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)
