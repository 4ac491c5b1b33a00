"""Tracing / profiling helpers (SURVEY.md §5 tracing row).

The reference had nothing beyond optional TF summaries; the TPU-native
equivalents are ``jax.profiler`` traces (viewable in TensorBoard/Perfetto)
plus a steady-state timing harness that is honest about asynchronous
dispatch (it synchronizes through a device-side checksum, which also works
on tunneled backends whose ``block_until_ready`` does not block).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): run_steps()``.

    Open the directory in TensorBoard (profile plugin) or Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


def time_jitted(
    fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    *,
    repeats: int = 5,
) -> Dict[str, float]:
    """Steady-state wall timing of ``fn(key) -> scalar-ish array``.

    ``fn`` must return something small whose host fetch forces execution
    (a checksum). The first call (compile) is excluded. Returns stats in
    seconds.
    """
    float(jnp.sum(fn(key)))  # compile + warm
    times = []
    for i in range(repeats):
        sub = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        float(jnp.sum(fn(sub)))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": float(np.median(times)),
        "min_s": float(np.min(times)),
        "mean_s": float(np.mean(times)),
    }
