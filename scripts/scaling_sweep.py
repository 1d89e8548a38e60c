"""Scaling evidence (VERDICT r1 weak #5): committed artifacts for (a) the
virtual-mesh plumbing sweep and (b) a real-chip env-count sweep.

  python scripts/scaling_sweep.py mesh   # 8-device virtual CPU mesh (plumbing:
                                         # collective paths + efficiency formula;
                                         # CPU timings are NOT TPU predictions)
  python scripts/scaling_sweep.py envs   # one real chip: 1k/4k/16k/64k envs

Both append their section into data/scaling.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "data/scaling.json"


def _merge(section: str, payload):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[section] = payload
    os.makedirs("data", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=2)
    print(f"wrote {OUT}[{section!r}]")


def run_mesh():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from self_play_racing_tpu.parallel import scaling

    results = scaling.main(["--envs-per-device", "256", "--num-steps", "64"])
    _merge("virtual_mesh_plumbing", {
        "platform": "cpu (8 virtual devices; plumbing check, not a TPU "
                    "performance prediction)",
        "note": "weak scaling, 256 envs/device, shard-local minibatching; "
                "efficiency(n) = steps_per_s(n) / (n * steps_per_s(1))",
        "results": results,
    })


def run_envs():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import jax.numpy as jnp

    from self_play_racing_tpu.agent.ppo import unpack_metrics
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.configs import base_config
    from self_play_racing_tpu.envs import single as senv
    from self_play_racing_tpu.envs import track as trk

    device = str(jax.devices()[0])
    print(f"device: {device}", file=sys.stderr)
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()

    results = []
    for num_envs in (1024, 4096, 16384, 65536):
        # 65536 x 256 (a 16.7M-sample batch) fits in v5e HBM now that
        # init_runner's first reset+observe runs under jit — the earlier OOM
        # here was the *eager* init materializing [envs, rays, segments]
        # intermediates, not the update itself (see data/pooled_geometry.json).
        num_steps = 256
        track = trk.gather_tracks(pool, np.arange(num_envs) % 16)
        cfg = base_config(num_envs=num_envs, num_steps=num_steps,
                          total_timesteps=num_envs * num_steps * 100)
        tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
        tr.runner, m = tr.update_step(tr.runner, tr.aux)
        unpack_metrics(m)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                tr.runner, m = tr.update_step(tr.runner, tr.aux)
            unpack_metrics(m)
            dts.append((time.perf_counter() - t0) / 3)
        d = min(dts)
        row = {"num_envs": num_envs, "num_steps": num_steps,
               "ms_per_update": d * 1e3,
               "env_steps_per_s": cfg.batch_size / d}
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    _merge("env_count_real_chip", {
        "platform": device,
        "note": "single-agent PPO full update (rollout 256 steps + GAE + "
                "10x16 minibatches), best of 3 chained-dispatch windows",
        "results": results,
    })


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("mesh", "both"):
        run_mesh()
    if mode in ("envs", "both"):
        run_envs()
