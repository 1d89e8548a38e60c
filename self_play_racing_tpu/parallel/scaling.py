"""Scaling-efficiency measurement harness + multi-host launch wrapper.

Measures full-PPO-update throughput across mesh sizes on whatever devices the current
process sees (real chips on a pod slice, or the virtual CPU mesh for plumbing checks),
holding the *per-device* env count constant (weak scaling — the deployment regime:
more chips host more envs). Efficiency(n) = throughput(n) / (n * throughput(1)).

Single host:
  python -m self_play_racing_tpu.parallel.scaling --envs-per-device 512 \\
      --out data/scaling_1host.json

Multi-host slice — ONE command per host (the north-star ≥80%-at-2-hosts
measurement; see docs/MULTIHOST.md for the full playbook). ``--coordinator`` is
host 0's address on the slice-internal network; every process runs the same
command with its own ``--process-id``:

  # on host i of H:
  python -m self_play_racing_tpu.parallel.scaling \\
      --coordinator 10.0.0.1:8476 --num-processes H --process-id i \\
      --envs-per-device 512 \\
      --baseline-json data/scaling_1host.json --out data/scaling_Hhost.json

The mesh then spans all hosts (data axis over ICI+DCN); process 0 writes the
artifact. ``--baseline-json`` points at the single-host artifact so the H-host
run records efficiency against it (schema below, "scaling_sweep_v1"):

  {"schema": "scaling_sweep_v1", "platform": ..., "num_processes": H,
   "devices_total": D, "envs_per_device": E, "num_steps": T,
   "shard_local_minibatch": true, "rows": [measure() dicts],
   "baseline_env_steps_per_s": <1-host full-mesh steps/s or null>,
   "efficiency_vs_baseline": <steps/s / (H * baseline) or null>}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
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
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: host 0's coordinator address; every process "
                        "passes the same value (jax.distributed.initialize)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count (one per host)")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank, 0..num-processes-1")
    p.add_argument("--out", default=None, metavar="JSON",
                   help="artifact path (scaling_sweep_v1 schema); written by "
                        "process 0 only")
    p.add_argument("--baseline-json", default=None, metavar="JSON",
                   help="single-host artifact to compute multi-host efficiency "
                        "against (its full-mesh env_steps_per_s row)")
    args = p.parse_args(argv)

    pmesh.distributed_init(args.coordinator, args.num_processes, args.process_id)

    total = len(jax.devices())
    if jax.process_count() > 1:
        # multi-controller: every process must participate in every collective, so
        # a mesh over a device-prefix (which excludes some hosts' devices) would
        # desync the processes. Measure only the full mesh; sweep sub-sizes by
        # launching on smaller slices. --max-devices is ignored here for the same
        # reason: capping would carve a device-prefix mesh out of the global set.
        if args.max_devices and jax.process_index() == 0:
            print(f"--max-devices={args.max_devices} ignored on a multi-host "
                  "run (full-mesh-only; launch on a smaller slice instead)",
                  file=sys.stderr)
        sizes = [total]
    else:
        if args.max_devices:
            total = min(total, args.max_devices)
        sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total]
    results = []
    for n in sizes:
        r = measure(n, args.envs_per_device, args.num_steps,
                    shard_local=not args.global_shuffle)
        base = results[0]["env_steps_per_s"] if results else r["env_steps_per_s"]
        r["efficiency"] = r["env_steps_per_s"] / (r["devices"] * base)
        results.append(r)
        if jax.process_index() == 0:
            print(json.dumps(r))

    baseline = None
    if args.baseline_json and os.path.exists(args.baseline_json):
        with open(args.baseline_json) as f:
            bl = json.load(f)
        # the baseline's full-mesh (largest-device) row is the per-host reference
        baseline = max(bl["rows"], key=lambda r: r["devices"])["env_steps_per_s"]

    if args.out and jax.process_index() == 0:
        full = results[-1]
        nproc = jax.process_count()
        artifact = {
            "schema": "scaling_sweep_v1",
            "platform": str(jax.devices()[0]),
            "num_processes": nproc,
            "devices_total": len(jax.devices()),
            "envs_per_device": args.envs_per_device,
            "num_steps": args.num_steps,
            "shard_local_minibatch": not args.global_shuffle,
            "rows": results,
            "baseline_env_steps_per_s": baseline,
            "efficiency_vs_baseline": (
                full["env_steps_per_s"] / (nproc * baseline) if baseline else None
            ),
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
