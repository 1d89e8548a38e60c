"""Real multi-process 'multi-host' training: two OS processes, each owning 4 CPU
devices, joined by jax.distributed into one 8-device mesh running the sharded PPO
update — the closest single-machine analog of a 2-host TPU slice (SURVEY §4 item d)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent('''
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
    sys.path.insert(0, {repo!r})
    import numpy as np
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.agent.ppo import unpack_metrics
    from self_play_racing_tpu.configs import base_config
    from self_play_racing_tpu.envs import single as senv, track as trk
    from self_play_racing_tpu.parallel import mesh as pmesh

    num_envs = 16
    cfg = base_config(num_envs=num_envs, num_steps=16, num_minibatches=2,
                      update_epochs=2, total_timesteps=num_envs*16*2)
    np.random.seed(1)  # gen_tracks draws params from the global RNG (quirk #6)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [7.0, 8.0])
    track = trk.gather_tracks(pool, np.arange(num_envs) % 2)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    mesh = pmesh.make_mesh()  # all 8 global devices across both processes
    runner, aux = pmesh.shard_runner(tr.runner, tr.aux, mesh, num_envs)
    runner, metrics = tr.update_step(runner, aux)
    runner, metrics = tr.update_step(runner, aux)
    m = unpack_metrics(jax.device_get(metrics))
    print(f"RESULT {pid} {int(m['global_step'])} {m['mean_reward']:.6f}")
''')


def test_two_process_distributed_update(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.replace("{repo!r}", repr(repo)))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    results = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results.append(line.split()[1:])
    # both processes agree on the global training result (skip the pid column)
    assert results[0][1:] == results[1][1:]
    assert int(results[0][1]) == 512  # 2 updates x batch 256
