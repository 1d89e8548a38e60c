"""Phase-level timing of one PPO / self-play update on the real chip.

Times rollout-only, GAE-only, and minibatch-update-only as separate jitted programs
(each synced with a host transfer) so we can see where the 100/217 ms per update goes.
Not a benchmark — a profiling aid; numbers include per-program dispatch+sync tunnel
latency (~23 ms), so compare deltas between variants rather than absolute sums.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.agent import ppo as jppo
from self_play_racing_tpu.agent.trainer import PPOTrainer, make_single_env_hooks
from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import base_config, self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk

NUM_ENVS = 4096
NUM_STEPS = 256
REPS = 5


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])  # sync via host transfer
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms", file=sys.stderr)
    return min(ts)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()
    track = trk.gather_tracks(pool, np.arange(NUM_ENVS) % 16)

    # ---- single-agent PPO ----
    cfg = base_config(num_envs=NUM_ENVS, num_steps=NUM_STEPS,
                      total_timesteps=NUM_ENVS * NUM_STEPS * 100)
    env_cfg = senv.RacingConfig(num_sensors=11)
    tr = PPOTrainer(cfg, env_cfg, track)
    hooks = make_single_env_hooks(env_cfg)

    # rebuild the internal phases by hand (mirror make_update_step internals)
    opt = jppo.make_optimizer(cfg)

    @jax.jit
    def f_rollout(runner, aux):
        _, lr, log_std = jppo.anneal_fractions(cfg, runner.train.update)
        # call the module-level rollout via a fresh update_step closure's pieces:
        # simplest faithful proxy: scan the same one_step used in bench.py
        params = runner.train.params

        from self_play_racing_tpu.envs import vector
        from self_play_racing_tpu.models import actor_critic as net

        def one_step(carry, _):
            vec, obs, key = carry
            key, akey = jax.random.split(key)
            action, logprob, value = net.sample_action(params, log_std, obs, akey)
            vec, next_obs, reward, done, term, trunc, info, rec = vector.step(
                vec, action,
                lambda s, a, k: hooks.transition(aux, s, a, k),
                lambda s: hooks.observe(aux, s),
                lambda k: hooks.reset(aux, k),
            )
            out = jppo.Batch(obs=obs, actions=action, logprobs=logprob,
                             advantages=jnp.zeros_like(logprob),
                             returns=jnp.zeros_like(logprob), values=value)
            return (vec, next_obs.astype(jnp.float32), key), (out, reward)

        (vec, obs, key), (traj, rew) = jax.lax.scan(
            one_step, (runner.vec, runner.obs, runner.key), None, length=cfg.num_steps)
        return traj, rew

    traj, rew = f_rollout(tr.runner, tr.aux)
    t_roll = timeit("rollout (store traj)", f_rollout, tr.runner, tr.aux)

    from self_play_racing_tpu.ops.gae import compute_gae

    @jax.jit
    def f_gae(traj, rew, runner):
        done = jnp.zeros_like(rew, bool)
        nv = jnp.zeros((cfg.num_envs,), jnp.float32)
        nd = jnp.zeros((cfg.num_envs,), bool)
        return compute_gae(rew, done, traj.values, nv, nd, cfg.gamma, cfg.gae_lambda)

    t_gae = timeit("GAE", f_gae, traj, rew, tr.runner)

    @jax.jit
    def f_update(runner, traj, rew):
        adv, ret = f_gae.__wrapped__(traj, rew, runner)
        batch = traj._replace(advantages=adv, returns=ret)
        flat = jppo.Batch(*(x.reshape((cfg.batch_size,) + x.shape[2:]) for x in batch))
        _, lr, log_std = jppo.anneal_fractions(cfg, runner.train.update)
        params, opt_state, stopped, ustats = jppo.run_ppo_update(
            cfg, opt, runner.train.params, runner.train.opt_state, log_std, lr, flat,
            jax.random.key(7))
        return ustats["loss"]

    t_upd = timeit("GAE + 10x16 minibatch update", f_update, tr.runner, traj, rew)

    t_full = timeit("full update_step", lambda r, a: tr.update_step(r, a)[1],
                    tr.runner, tr.aux)
    print(f"  -> rollout {t_roll*1e3:.0f} + update {t_upd*1e3:.0f} vs full "
          f"{t_full*1e3:.0f} ms (dispatch overlap explains the gap)",
          file=sys.stderr)

    # ---- self-play ----
    sp_cfg = self_play_config(num_envs=NUM_ENVS, num_steps=NUM_STEPS,
                              total_timesteps=NUM_ENVS * NUM_STEPS * 100)
    sp_env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    sp = SelfPlayTrainer(sp_cfg, sp_env_cfg, track)
    sp.snapshot_agent()
    sp.select_opponent()

    t_sp = timeit("self-play full update_step",
                  lambda r, a: sp.update_step(r, a)[1], sp.runner, sp.aux)

    # self-play rollout only (via its own hooks)
    sp_hooks = sp.hooks

    @jax.jit
    def f_sp_rollout(runner, aux):
        _, lr, log_std = jppo.anneal_fractions(sp_cfg, runner.train.update)
        params = runner.train.params
        from self_play_racing_tpu.envs import vector
        from self_play_racing_tpu.models import actor_critic as net

        def one_step(carry, _):
            vec, obs, key = carry
            key, akey = jax.random.split(key)
            action, logprob, value = net.sample_action(params, log_std, obs, akey)
            vec, next_obs, reward, done, term, trunc, info, rec = vector.step(
                vec, action,
                lambda s, a, k: sp_hooks.transition(aux, s, a, k),
                lambda s: sp_hooks.observe(aux, s),
                lambda k: sp_hooks.reset(aux, k),
                refresh_fn=(None if sp_hooks.refresh is None
                            else (lambda s: sp_hooks.refresh(aux, s))),
            )
            return (vec, next_obs.astype(jnp.float32), key), reward

        (vec, obs, key), rews = jax.lax.scan(
            one_step, (runner.vec, runner.obs, runner.key), None,
            length=sp_cfg.num_steps)
        return rews.sum()

    t_sp_roll = timeit("self-play rollout only", f_sp_rollout, sp.runner, sp.aux)
    print(f"  -> self-play rollout {t_sp_roll*1e3:.0f} of {t_sp*1e3:.0f} ms total",
          file=sys.stderr)


if __name__ == "__main__":
    main()
