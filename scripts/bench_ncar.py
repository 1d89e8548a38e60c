"""N-car self-play throughput on the real chip (VERDICT r1 weak #4 follow-up).

Measures the full self-play PPO update (rollout + GAE + minibatch updates) at
num_agents in {2, 4, 8} with the batched [N, A, A] multi-env paths, and writes
data/ncar_throughput.json. Env-steps count vector steps (one per env per step);
agent-steps multiply by A.

  python scripts/bench_ncar.py [--num-envs 4096] [--num-steps 128]
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
from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import track as trk


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--agents", type=int, nargs="+", default=[2, 4, 8])
    args = p.parse_args(argv)

    device = str(jax.devices()[0])
    print(f"device: {device}", file=sys.stderr)
    N, T = args.num_envs, args.num_steps
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()
    track = trk.gather_tracks(pool, np.arange(N) % 16)

    rows = []
    for a in args.agents:
        cfg = self_play_config(num_envs=N, num_steps=T,
                               total_timesteps=N * T * 100,
                               opponent_per_env=True,
                               reset_envs_each_update=False)
        env_cfg = menv.MultiRacingConfig(num_agents=a, num_sensors=11)
        sp = SelfPlayTrainer(cfg, env_cfg, track)
        sp.snapshot_agent()
        sp.select_opponent()
        t0 = time.perf_counter()
        sp.runner, m = sp.update_step(sp.runner, sp.aux)
        unpack_metrics(m)
        print(f"A={a}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                sp.runner, m = sp.update_step(sp.runner, sp.aux)
            unpack_metrics(m)
            dts.append((time.perf_counter() - t0) / 3)
        d = min(dts)
        row = {"num_agents": a, "obs_dim": env_cfg.obs_dim,
               "ms_per_update": d * 1e3,
               "env_steps_per_s": cfg.batch_size / d,
               "agent_steps_per_s": cfg.batch_size * a / d}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    os.makedirs("data", exist_ok=True)
    with open("data/ncar_throughput.json", "w") as f:
        json.dump({"platform": device, "num_envs": N, "num_steps": T,
                   "note": "full self-play PPO update, best of 3 chained-"
                           "dispatch windows; learner + (A-1) frozen-pool "
                           "opponent seats per env",
                   "results": rows}, f, indent=2)
    print("wrote data/ncar_throughput.json")


if __name__ == "__main__":
    main()
