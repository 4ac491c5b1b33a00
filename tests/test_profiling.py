"""Profiling utilities (SURVEY.md §5 tracing row)."""

import os

import jax
import jax.numpy as jnp

from gansynth_tpu.utils.profiling import annotate, time_jitted, trace
from gansynth_tpu.utils.platform import enable_compile_cache


def test_time_jitted_reports_stats():
    @jax.jit
    def f(key):
        x = jax.random.normal(key, (64, 64))
        return jnp.sum(x @ x)

    stats = time_jitted(f, jax.random.key(0), repeats=3)
    assert set(stats) == {"median_s", "min_s", "mean_s"}
    assert 0 < stats["min_s"] <= stats["median_s"]


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "tb")
    with trace(logdir):
        with annotate("test_region"):
            jnp.ones((8, 8)).sum().block_until_ready()
    # jax writes plugins/profile/<ts>/ under the logdir
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no profile artifacts written"


def test_enable_compile_cache(tmp_path):
    d = enable_compile_cache(str(tmp_path / "cache"))
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
