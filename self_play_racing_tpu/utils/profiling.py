"""Profiling/observability: jax.profiler trace hooks + throughput meters.

The reference has no profiling at all (SURVEY §5); these are the TPU-native
equivalents: capture XLA/TPU traces viewable in TensorBoard/Perfetto, and cheap
steps-per-second accounting for the training loop.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace (open with TensorBoard's profile plugin/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Running steps/s meter with exponential window, for per-update logging."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self._last_t = None
        self._rate = None
        self.total_steps = 0

    def update(self, steps: int) -> float:
        now = time.perf_counter()
        self.total_steps += steps
        if self._last_t is not None:
            inst = steps / max(now - self._last_t, 1e-9)
            self._rate = (inst if self._rate is None
                          else self.alpha * inst + (1 - self.alpha) * self._rate)
        self._last_t = now
        return self._rate or 0.0

    @property
    def rate(self) -> float:
        return self._rate or 0.0


def canonical_bench_pool(num_tracks=16, dtype=None, sensor_lod=1):
    """The pinned canonical benchmark track pool (the bench.py convention):
    ``gen_tracks(seed=1)`` + per-index ``RandomState(i)`` widths in [6, 10).

    Every bench/profiling script draws its pool through this helper so the
    "canonical pinned pool (W=512, S=896)" cross-references between artifacts
    (BASELINE.md, data/*.json) are guaranteed to be the same geometry — a
    drifted copy of the recipe would silently invalidate cross-script
    comparisons.
    """
    import numpy as np

    import jax.numpy as jnp

    from ..envs import track as trk

    np.random.seed(1)
    cps = trk.gen_tracks(num_tracks=num_tracks, seed=1)
    widths = [float(np.random.RandomState(i).randint(6, 10))
              for i in range(num_tracks)]
    return trk.make_track_pool(cps, widths, dtype=dtype or jnp.float32,
                               sensor_lod=sensor_lod)
