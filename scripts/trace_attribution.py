"""Source-line attribution of a benched update from a jax.profiler trace.

The ablation instrument (profile_selfplay_phases.py) measures marginal phase
costs but cannot split phases whose ablation perturbs downstream fusions (the
GAE stub reproducibly made the minibatch phase ~20 ms slower) and cannot see
costs below its ~5 ms noise floor. This instrument is exact: it traces the
real update, takes the LEAF device events (hlo_category in fusions/slices/
dus/...; container `while`/`jit` events excluded), and aggregates device time
by the `source` file:line XLA recorded for each op — so every microsecond of
the update lands on a line of this repo. Trace overhead inflates wall time
~5%; the table reports raw trace us and the fraction of leaf total.

    python scripts/trace_attribution.py selfplay|ppo [--envs 4096] [--steps 256]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

LEAF_CATEGORIES = {
    "loop fusion", "custom fusion", "convolution fusion", "output fusion",
    "input fusion", "dynamic-update-slice", "data formatting", "slice",
    "broadcast", "dynamic-slice", "sort", "non-fusion elementwise", "iota",
    "concatenate", "reduce", "copy", "transpose", "reshape", "scatter",
    "gather", "all-reduce", "rng",
}


def build(leg, num_envs, num_steps):
    from self_play_racing_tpu.envs import track as trk

    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()
    if leg == "selfplay":
        from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
        from self_play_racing_tpu.configs import self_play_config
        from self_play_racing_tpu.envs import multi as menv

        track = trk.gather_tracks(pool, np.arange(num_envs) % 16)
        cfg = self_play_config(num_envs=num_envs, num_steps=num_steps,
                               total_timesteps=num_envs * num_steps * 100)
        tr = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2,
                                                         num_sensors=11), track)
        tr.snapshot_agent()
        tr.select_opponent()
        return tr
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.configs import base_config
    from self_play_racing_tpu.envs import single as senv

    # single-env bench leg uses the eager per-env layout (bench.py:230-235)
    track = trk.gather_tracks(pool, np.arange(num_envs) % 16)
    cfg = base_config(num_envs=num_envs, num_steps=num_steps,
                      total_timesteps=num_envs * num_steps * 100)
    return PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("leg", choices=["selfplay", "ppo"])
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--updates", type=int, default=2)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from self_play_racing_tpu.agent.ppo import unpack_metrics

    tr = build(args.leg, args.envs, args.steps)
    tr.runner, m = tr.update_step(tr.runner, tr.aux)
    unpack_metrics(m)  # compile + warm + sync

    trace_dir = f"/tmp/jax_trace_{args.leg}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        mm = None
        for _ in range(args.updates):
            tr.runner, mm = tr.update_step(tr.runner, tr.aux)
        unpack_metrics(mm)

    trace_files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                                   recursive=True), key=os.path.getmtime)
    if not trace_files:
        sys.exit(f"no trace file written under {trace_dir}")
    trace_file = trace_files[-1]  # newest wins if a run dumps one per process
    with gzip.open(trace_file) as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    pid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name")
    dev = [e for e in ev if e.get("ph") == "X"
           and pid_names.get(e["pid"], "").startswith("/device:")]
    leaves = [e for e in dev
              if e.get("args", {}).get("hlo_category") in LEAF_CATEGORIES]
    agg = collections.Counter()
    cnt = collections.Counter()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/"
    for e in leaves:
        src = e["args"].get("source", "?").replace(root, "")
        agg[src] += e["dur"]
        cnt[src] += 1
    u = args.updates
    total = sum(agg.values())
    span = (max(e["ts"] + e["dur"] for e in dev) - min(e["ts"] for e in dev))
    print(f"trace span {span/u/1e3:.1f} ms/update; leaf device time "
          f"{total/u/1e3:.1f} ms/update ({len(leaves)//u} leaf ops/update)",
          file=sys.stderr)
    rows = []
    for src, dur in agg.most_common():
        rows.append({"source": src, "ms_per_update": dur / u / 1e3,
                     "ops_per_update": cnt[src] // u,
                     "pct_of_leaf": 100.0 * dur / total})
        if dur / u / 1e3 >= 0.1:
            print(f"{dur/u/1e3:9.2f} ms/u {100*dur/total:5.1f}%  "
                  f"n={cnt[src]//u:6d}  {src}", file=sys.stderr)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", f"trace_attribution_{args.leg}.json")
    with open(out, "w") as f:
        json.dump({
            "description": "Leaf device-time by source line from a "
                           "jax.profiler trace of the benched update "
                           f"({args.leg} leg). scripts/trace_attribution.py",
            "num_envs": args.envs, "num_steps": args.steps,
            "leaf_ms_per_update": total / u / 1e3,
            "trace_span_ms_per_update": span / u / 1e3,
            "rows": rows,
        }, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
