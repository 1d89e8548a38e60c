"""Profiling utilities: trace context manager writes a trace, Throughput meters."""
import glob
import os

import jax
import jax.numpy as jnp

from self_play_racing_tpu.utils import profiling


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        with profiling.annotate("tiny-op"):
            jnp.sum(jnp.arange(128.0)).block_until_ready()
    found = glob.glob(os.path.join(log_dir, "**", "*.pb*"), recursive=True) + \
        glob.glob(os.path.join(log_dir, "**", "*.trace*"), recursive=True)
    assert found, f"no trace artifacts written under {log_dir}"


def test_throughput_meter():
    m = profiling.Throughput(alpha=0.5)
    r1 = m.update(1000)
    assert m.total_steps == 1000
    r2 = m.update(1000)
    assert m.total_steps == 2000
    assert r2 > 0
