"""jax.profiler integration (--profile flag on cli.main / cli.dino).

The reference's only observability is MetricLogger step timing
(dino-main/utils.py:348-400); this adds on-demand XLA/TPU traces viewable
in TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib
import logging

LOGGER = logging.getLogger("tpu_ac.profiling")


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """Trace everything inside the block into ``trace_dir`` (no-op if None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    LOGGER.info("jax.profiler trace -> %s", trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info("jax.profiler trace written to %s", trace_dir)


def step_annotation(name: str, step: int | None = None):
    """Label a region in the trace: with step -> StepTraceAnnotation."""
    import jax

    if step is not None:
        return jax.profiler.StepTraceAnnotation(name, step_num=step)
    return jax.profiler.TraceAnnotation(name)
