"""Micro-profile of the env hot functions on the real chip (observe vs transition).

Times each jitted function standalone with a scalar-reduced output (so the host sync
transfers 4 bytes, not the tensor). Absolute numbers include the ~1-2 ms dispatch
floor of a lone program; deltas between rows are the signal.
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

from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk

NUM_ENVS = 4096
REPS = 50


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
    print(f"{name:42s} {min(ts)*1e6:9.0f} us", file=sys.stderr)
    return min(ts)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()
    track = trk.gather_tracks(pool, np.arange(NUM_ENVS) % 16)
    print(f"segments: {track.seg_sx.shape}, waypoints: {track.wp_x.shape}",
          file=sys.stderr)

    scfg = senv.RacingConfig(num_sensors=11)
    sstate = senv.reset_state(scfg, track)
    action = jnp.tile(jnp.asarray([[0.1, 0.8]], jnp.float32), (NUM_ENVS, 1))

    # chain K iterations inside one program so dispatch cost amortizes
    K = 20

    @jax.jit
    def s_observe(track, state):
        def body(s, _):
            o = senv.observe(scfg, track, s)
            return s.replace(car=s.car.replace(x=s.car.x + o[:, 0] * 1e-6)), o.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    @jax.jit
    def s_transition(track, state):
        def body(s, _):
            s2, r, te, tr, info = senv.transition(scfg, track, s, action)
            return s2, r.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    @jax.jit
    def s_full(track, state):
        def body(s, _):
            s2, r, te, tr, info = senv.transition(scfg, track, s, action)
            o = senv.observe(scfg, track, s2)
            return s2, r.sum() + o.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    t_o = timeit(f"single observe x{K}", s_observe, track, sstate) / K
    t_t = timeit(f"single transition x{K}", s_transition, track, sstate) / K
    t_f = timeit(f"single observe+transition x{K}", s_full, track, sstate) / K
    print(f"  per step: observe {t_o*1e6:.0f} us, transition {t_t*1e6:.0f} us, "
          f"both {t_f*1e6:.0f} us", file=sys.stderr)

    mcfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    mstate = menv.reset_state(mcfg, track, jax.random.key(0))
    mact = jnp.tile(jnp.asarray([[[0.1, 0.8]]], jnp.float32), (NUM_ENVS, 2, 1))

    @jax.jit
    def m_observe(track, state):
        def body(s, _):
            o = menv.observe(mcfg, track, s)
            return s.replace(x=s.x + o[:, :, 0] * 1e-6), o.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    @jax.jit
    def m_transition(track, state):
        def body(s, _):
            s2, r, te, tr, info = menv.transition(mcfg, track, s, mact)
            return s2, r.sum()
        s, outs = jax.lax.scan(body, state, None, length=K)
        return outs.sum()

    t_mo = timeit(f"multi observe x{K}", m_observe, track, mstate) / K
    t_mt = timeit(f"multi transition x{K}", m_transition, track, mstate) / K
    print(f"  per step: multi observe {t_mo*1e6:.0f} us, multi transition "
          f"{t_mt*1e6:.0f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
