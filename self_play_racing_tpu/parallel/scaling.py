"""Scaling-efficiency measurement harness.

Measures full-PPO-update throughput across mesh sizes on whatever devices the current
process sees (real chips on a pod slice, or the virtual CPU mesh for plumbing checks),
holding the *per-device* env count constant (weak scaling — the deployment regime:
more chips host more envs). Efficiency(n) = throughput(n) / (n * throughput(1)).

On a multi-host slice run one process per host with ``jax.distributed.initialize``
(parallel.mesh.distributed_init) and the same script; the mesh then spans all hosts
and the env batch is sharded over ICI+DCN automatically.

Usage:
  python -m self_play_racing_tpu.parallel.scaling --envs-per-device 512
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax

from ..agent.ppo import unpack_metrics
from ..agent.trainer import PPOTrainer
from ..configs import base_config
from ..envs import single as senv
from ..envs import track as trk
from . import mesh as pmesh


def measure(num_devices: int, envs_per_device: int = 512, num_steps: int = 128,
            reps: int = 3, seed: int = 1, shard_local: bool = True):
    """Updates/s + env-steps/s for a data-parallel PPO update on n devices.

    ``shard_local`` uses the per-shard minibatch shuffle (cfg.data_shards =
    num_devices; zero data collectives in the update phase); False measures the
    reference-parity global shuffle, whose per-minibatch all-gathers bound DP
    scaling (scripts/inspect_minibatch_hlo.py)."""
    devices = jax.devices()[:num_devices]
    num_envs = envs_per_device * num_devices
    cfg = base_config(num_envs=num_envs, num_steps=num_steps,
                      total_timesteps=num_envs * num_steps * 100, seed=seed,
                      data_shards=num_devices if shard_local else 1)
    cps = trk.gen_tracks(16, seed=seed)
    pool = trk.make_track_pool(cps, [7.0] * 16)
    track = trk.gather_tracks(pool, np.arange(num_envs) % 16)
    trainer = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)

    m = pmesh.make_mesh(devices)
    runner, aux = pmesh.shard_runner(trainer.runner, trainer.aux, m, num_envs)

    runner, metrics = trainer.update_step(runner, aux)
    unpack_metrics(metrics)  # forced sync (block_until_ready lies over tunnels)
    t0 = time.perf_counter()
    for _ in range(reps):
        runner, metrics = trainer.update_step(runner, aux)
        unpack_metrics(metrics)
    dt = (time.perf_counter() - t0) / reps
    return {
        "devices": num_devices,
        "num_envs": num_envs,
        "shard_local_minibatch": shard_local,
        "ms_per_update": dt * 1e3,
        "env_steps_per_s": cfg.batch_size / dt,
        "updates_per_s": 1.0 / dt,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--envs-per-device", type=int, default=512)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--max-devices", type=int, default=None)
    p.add_argument("--global-shuffle", action="store_true",
                   help="measure the reference-parity global minibatch shuffle "
                        "(per-minibatch all-gathers) instead of shard-local")
    args = p.parse_args(argv)

    total = len(jax.devices())
    if args.max_devices:
        total = min(total, args.max_devices)
    if jax.process_count() > 1:
        # multi-controller: every process must participate in every collective, so
        # a mesh over a device-prefix (which excludes some hosts' devices) would
        # desync the processes. Measure only the full mesh; sweep sub-sizes by
        # launching on smaller slices.
        sizes = [total]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total]
    results = []
    for n in sizes:
        r = measure(n, args.envs_per_device, args.num_steps,
                    shard_local=not args.global_shuffle)
        base = results[0]["env_steps_per_s"] if results else r["env_steps_per_s"]
        r["efficiency"] = r["env_steps_per_s"] / (r["devices"] * base)
        results.append(r)
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
