"""Measure the capacity (pool-resident) geometry layouts on the real chip.

Three questions, answered into data/pooled_geometry.json:
 1. Overhead at the standard operating point (4096 envs x 256 steps, full
    single-agent PPO update): eager per-env geometry vs the two pool-resident
    layouts — ``gather`` (PooledTracks: arbitrary env->track ids, per-env
    in-step gather) and ``grouped`` (GroupedPooledTracks: block-grouped envs,
    fused broadcast expansion — designed to close gather's 1.6-2.5x gap).
 2. The same at 65536 envs x 256 steps (16.7M-sample batch).
 3. The fits-only-pooled frontier: eager per-env geometry costs ~26 KB/env
    (4x[W=512] + 5x[S=896] f32 = 6528 f32), i.e. ~6.8 GB at 262144 envs before
    rollout buffers — approaching the v5e's 16 GB HBM. Short rollouts
    (64 steps) keep the buffers small so geometry is the binding constraint:
    the 262144/393216-env rows record where eager dies (RESOURCE_EXHAUSTED is
    data, not failure) while grouped keeps running at O(tracks) residency.

  python scripts/bench_pooled_geometry.py [--quick]
"""
from __future__ import annotations

import argparse
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

NUM_TRACKS = 16


def make_layout(pool, num_envs, layout):
    if layout == "eager":
        return trk.gather_tracks(pool, np.arange(num_envs) % NUM_TRACKS)
    if layout == "gather":
        return trk.pooled_tracks(pool, np.arange(num_envs) % NUM_TRACKS)
    if layout == "grouped":
        assert num_envs % NUM_TRACKS == 0
        return trk.grouped_pooled_tracks(pool, np.arange(NUM_TRACKS),
                                         num_envs // NUM_TRACKS)
    if layout == "tiled":
        return trk.tiled_pooled_tracks(pool, num_envs)
    raise ValueError(layout)


def measure(num_envs, num_steps, layout, n_windows=3, n_reps=3):
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool(NUM_TRACKS)
    track = make_layout(pool, num_envs, layout)
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
    return {"num_envs": num_envs, "num_steps": num_steps, "layout": layout,
            "ms_per_update": d * 1e3, "env_steps_per_s": cfg.batch_size / d}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="skip the capacity-frontier rows")
    args = p.parse_args(argv)

    device = str(jax.devices()[0])
    print(f"device: {device}", file=sys.stderr)
    grid = [
        (4096, 256, "eager"), (4096, 256, "gather"), (4096, 256, "grouped"),
        (4096, 256, "tiled"),
        (65536, 256, "eager"), (65536, 256, "gather"), (65536, 256, "grouped"),
        (65536, 256, "tiled"),
    ]
    if not args.quick:
        # capacity frontier: short rollouts so geometry (not buffers) binds;
        # 589824 is the fits-only-pooled regime (eager OOMs — that row's
        # RESOURCE_EXHAUSTED is the capacity claim's evidence)
        grid += [
            (262144, 64, "eager"), (262144, 64, "grouped"), (262144, 64, "tiled"),
            (589824, 64, "eager"), (589824, 64, "grouped"), (589824, 64, "tiled"),
        ]
    rows = []
    for num_envs, num_steps, layout in grid:
        print(f"{num_envs} envs x {num_steps} steps [{layout}]", file=sys.stderr)
        try:
            row = measure(num_envs, num_steps, layout)
        except Exception as e:  # RESOURCE_EXHAUSTED is data here, not failure
            row = {"num_envs": num_envs, "num_steps": num_steps,
                   "layout": layout, "error": type(e).__name__,
                   "detail": str(e).splitlines()[0][:200]}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    os.makedirs("data", exist_ok=True)
    with open("data/pooled_geometry.json", "w") as f:
        json.dump({
            "platform": device,
            "note": "full single-agent PPO update, best of 3 chained-dispatch "
                    "windows. layouts: eager = per-env gather_tracks copies "
                    "(~26 KB/env geometry HBM); gather = PooledTracks per-env "
                    "in-step gather (O(tracks) residency, arbitrary ids); "
                    "grouped = GroupedPooledTracks block-grouped broadcast "
                    "(O(tracks) residency, near-eager speed). The 262144/"
                    "393216-env 64-step rows probe the eager HBM wall: an "
                    "error entry there is the measured capacity limit, not a "
                    "bench failure.",
            "results": rows}, f, indent=2)
    print("wrote data/pooled_geometry.json")


if __name__ == "__main__":
    main()
