"""Measure the PooledTracks memory-scaling geometry layout on the real chip.

Two questions, answered into data/pooled_geometry.json:
 1. Overhead at the standard operating point: full single-agent PPO update at
    4096 envs x 256 steps, eager per-env geometry vs the lazy pooled layout.
 2. Capacity at 65536 envs x 256 steps (16.7M-sample batch), both layouts.
    (Historical note: this config OOM'd before init_runner's first
    reset+observe was jitted — the eager init, not the update or the geometry,
    was the limit. Both layouts now fit; pooled trades ~1.6-2.4x update time
    for O(tracks) geometry residency.)

  python scripts/bench_pooled_geometry.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.agent.ppo import unpack_metrics
from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def measure(num_envs, num_steps, pooled, n_windows=3, n_reps=3):
    cps = trk.gen_tracks(16, seed=1)
    widths = [float(np.random.RandomState(i).randint(6, 10)) for i in range(16)]
    pool = trk.make_track_pool(cps, widths, dtype=jnp.float32)
    ids = np.arange(num_envs) % 16
    track = trk.pooled_tracks(pool, ids) if pooled else trk.gather_tracks(pool, ids)
    cfg = base_config(num_envs=num_envs, num_steps=num_steps,
                      total_timesteps=num_envs * num_steps * 100)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    t0 = time.perf_counter()
    tr.runner, m = tr.update_step(tr.runner, tr.aux)
    unpack_metrics(m)
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    dts = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_reps):
            tr.runner, m = tr.update_step(tr.runner, tr.aux)
        unpack_metrics(m)
        dts.append((time.perf_counter() - t0) / n_reps)
    d = min(dts)
    return {"num_envs": num_envs, "num_steps": num_steps, "pooled": pooled,
            "ms_per_update": d * 1e3, "env_steps_per_s": cfg.batch_size / d}


def main():
    device = str(jax.devices()[0])
    print(f"device: {device}", file=sys.stderr)
    rows = []
    for num_envs, num_steps, pooled in [
        (4096, 256, False),
        (4096, 256, True),
        (65536, 256, False),
        (65536, 256, True),
    ]:
        label = "pooled" if pooled else "eager"
        print(f"{num_envs} envs x {num_steps} steps [{label}]", file=sys.stderr)
        try:
            row = measure(num_envs, num_steps, pooled)
        except Exception as e:  # RESOURCE_EXHAUSTED is data here, not failure
            row = {"num_envs": num_envs, "num_steps": num_steps, "pooled": pooled,
                   "error": type(e).__name__,
                   "detail": str(e).splitlines()[0][:200]}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    os.makedirs("data", exist_ok=True)
    with open("data/pooled_geometry.json", "w") as f:
        json.dump({
            "platform": device,
            "note": "full single-agent PPO update, best of 3 chained-dispatch "
                    "windows; 'pooled' = PooledTracks lazy [tracks,...] pool "
                    "(O(tracks) geometry HBM), 'eager' = per-env gather_tracks. "
                    "Both layouts fit at 65536 x 256 now that trainer init is "
                    "jitted; pooled trades update time for geometry residency.",
            "results": rows}, f, indent=2)
    print("wrote data/pooled_geometry.json")


if __name__ == "__main__":
    main()
