"""Diagnose VERDICT #2: does the PPO minibatch gather emit cross-device
collectives when the rollout batch is sharded over the 'data' mesh axis?

Compiles the full jitted update_step under an 8-device virtual CPU mesh with the
round-1 shardings (env batch on 'data', params replicated) and counts collective
ops in the optimized HLO, attributing them to phases where possible.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/inspect_minibatch_hlo.py
"""
from __future__ import annotations

import collections
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from self_play_racing_tpu.agent import ppo as jppo
from self_play_racing_tpu.agent.trainer import PPOTrainer, make_single_env_hooks
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.parallel import mesh as pmesh

COLLECTIVES = (
    "all-to-all", "all-gather", "all-reduce", "collective-permute",
    "reduce-scatter", "collective-broadcast",
)


def count_collectives(hlo_text: str):
    counts = collections.Counter()
    lines = collections.defaultdict(list)
    for line in hlo_text.splitlines():
        s = line.strip()
        for op in COLLECTIVES:
            # match op as the rhs instruction (e.g. "%x = f32[...] all-gather(" or
            # a tuple-typed variadic "%x = (f32[..], f32[..]) all-reduce(")
            if re.search(rf"= (\S+|\(.*?\)) {op}\(", s) or re.search(rf"= {op}\(", s):
                counts[op] += 1
                lines[op].append(s[:200])
    return counts, lines


def main():
    num_envs = 256
    cfg = base_config(
        num_envs=num_envs, num_steps=64,
        total_timesteps=256 * 64 * 10,
        shuffle_block_size=64,
        **(dict(data_shards=8) if "--local" in sys.argv else {}),
    )
    env_cfg = senv.RacingConfig(num_sensors=11)

    cps = trk.gen_tracks(4, seed=1)
    pool = trk.make_track_pool(cps, [6.0, 7.0, 8.0, 9.0], dtype=jnp.float32)
    track = trk.gather_tracks(pool, np.arange(num_envs) % 4)

    mesh = pmesh.make_mesh()
    print(f"mesh: {mesh}", file=sys.stderr)
    trainer = PPOTrainer(cfg, env_cfg, track)
    trainer.runner, trainer.aux = pmesh.shard_runner(
        trainer.runner, trainer.aux, mesh, num_envs)

    lowered = jax.jit(jppo.make_update_step(cfg, trainer.hooks,
                                            env_cfg.action_dim)).lower(
        trainer.runner, trainer.aux)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts, lines = count_collectives(hlo)
    print(f"optimized HLO: {len(hlo.splitlines())} lines")
    if not counts:
        print("NO collectives found")
        return
    for op, c in sorted(counts.items()):
        print(f"{op}: {c}")
        for s in lines[op][:6]:
            print(f"   {s}")


if __name__ == "__main__":
    main()
