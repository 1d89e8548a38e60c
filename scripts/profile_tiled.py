"""Hypothesis test: does building the per-env track view as broadcast_to+reshape from
the [T, ...] pool inside jit (instead of pre-gathered [N, ...] arrays in HBM) make the
env step faster? Requires env->track assignment i % T with N = G*T.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk

NUM_ENVS = 4096
T = 16
G = NUM_ENVS // T
REPS = 50
K = 20


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:42s} {min(ts)*1e6:9.0f} us  (/step {min(ts)/K*1e6:.0f})",
          file=sys.stderr)
    return min(ts)


def tile_track(pool: trk.TrackArrays) -> trk.TrackArrays:
    """[T, ...] pool -> logical [N, ...] view via broadcast+reshape (no gather).

    Env i gets track i % T, matching gather_tracks(pool, arange(N) % T) when laid
    out as reshape([G, T, ...]) row-major.
    """
    def tile(x):
        if x.ndim == 0:
            return x
        return jnp.broadcast_to(x[None], (G,) + x.shape).reshape(
            (G * x.shape[0],) + x.shape[1:])
    return jax.tree.map(tile, pool)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool(T)

    # note: gather order arange(N) % T == tiled order (g*T + t -> track t)
    track_gathered = trk.gather_tracks(pool, np.arange(NUM_ENVS) % T)

    scfg = senv.RacingConfig(num_sensors=11)
    sstate = senv.reset_state(scfg, track_gathered)
    action = jnp.tile(jnp.asarray([[0.1, 0.8]], jnp.float32), (NUM_ENVS, 1))

    def loop(track, state):
        def body(s, _):
            s2, r, te, tr, info = senv.transition(scfg, track, s, action)
            o = senv.observe(scfg, track, s2)
            return s2, r.sum() + o.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    @jax.jit
    def f_gathered(track, state):
        return loop(track, state)

    @jax.jit
    def f_tiled(pool, state):
        return loop(tile_track(pool), state)

    # sanity: identical results
    a = f_gathered(track_gathered, sstate)
    b = f_tiled(pool, sstate)
    print(f"parity: gathered={float(a):.6f} tiled={float(b):.6f}", file=sys.stderr)
    assert float(a) == float(b), "tiled view diverged from gathered arrays"

    timeit(f"single step x{K} (pre-gathered [N,...])", f_gathered,
           track_gathered, sstate)
    timeit(f"single step x{K} (broadcast-tiled view)", f_tiled, pool, sstate)


if __name__ == "__main__":
    main()
