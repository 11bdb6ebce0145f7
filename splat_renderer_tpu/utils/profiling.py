"""Profiling hooks: jax.profiler traces for the frame pipeline.

The reference has no profiling at all (SURVEY.md section 5); its plan docs
asked for per-pass monitoring and never built it.  Usage:

    with trace("/tmp/splat-trace"):
        engine.frame(camera, key)
    # then: xprof / tensorboard --logdir /tmp/splat-trace
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)
