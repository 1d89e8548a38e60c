"""Self-play layer parity + trainer mechanics.

Wrapper parity: a near-deterministic frozen opponent (log_std = -20 => std ~ 2e-9)
lets us compare our on-device self-play view against the reference SelfPlayWrapper
step-for-step despite both sides nominally *sampling* opponent actions.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import selfplay as sp
from self_play_racing_tpu.envs import track as jtrack
from self_play_racing_tpu.models import actor_critic as net

from agent.ppo import Agent as RefAgent
from environment.multi_racing_env import MultiRacingEnv as RefMultiEnv
from environment.wrappers import SelfPlayWrapper as RefWrapper


class _Space:
    def __init__(self, shape):
        self.shape = shape


def test_selfplay_wrapper_parity_frozen_opponent():
    width = 8.0
    cps = [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=5)]
    pool = jtrack.make_track_pool(cps, [width], dtype=jnp.float64)
    track = jtrack.gather_tracks(pool, [0])
    cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    # identical frozen opponent on both sides, essentially deterministic
    opp_params = net.init_params(jax.random.key(7), cfg.obs_dim, cfg.action_dim)
    log_std = jnp.full((2,), -20.0, jnp.float32)
    ref_opp = RefAgent(_Space((cfg.obs_dim,)), _Space((2,)))
    ref_opp.load_state_dict(net.params_to_torch_state_dict(opp_params, log_std))
    ref_opp.eval()

    ref_env = RefWrapper(
        RefMultiEnv(num_agents=2, num_sensors=11, track_pool=cps, track_id=0,
                    track_width=width),
        0,
    )
    ref_env.set_opponent(ref_opp)
    np.random.seed(3)
    order = [0, 1]
    np.random.shuffle(order)
    np.random.seed(3)
    ref_obs, _ = ref_env.reset()
    pos = np.array([order.index(i) for i in range(2)])

    state = sp.SelfPlayState(
        inner=menv.reset_state(cfg, track, position_idx=pos[None, :]),
        obs_all=jnp.zeros((1, 2, cfg.obs_dim), jnp.float32),
    )
    state = sp.SelfPlayState(inner=state.inner,
                             obs_all=menv.observe(cfg, track, state.inner))
    np.testing.assert_allclose(np.asarray(sp.observe(state)[0]), ref_obs,
                               rtol=0, atol=1e-6)

    opp = {
        "params": jax.tree.map(lambda x: x[None], opp_params),
        "log_std": log_std[None],
        "idx": jnp.zeros((), jnp.int32),
        "use_policy": jnp.ones((), bool),
    }
    step_fn = jax.jit(
        lambda tr, op, s, a, k: sp.transition(cfg, tr, op, s, a, k)
    )
    key = jax.random.key(0)
    for t in range(200):
        a0 = np.array([0.3 * np.sin(t / 13.0), 0.5], np.float32)
        robs, rrew, rdone, rtrunc, rinfo = ref_env.step(a0)
        key, k = jax.random.split(key)
        state, jrew, jdone, jtrunc, jinfo = step_fn(
            track, opp, state, jnp.asarray(a0)[None], k
        )
        assert float(jrew[0]) == pytest.approx(rrew, rel=0, abs=1e-4), f"step {t}"
        assert bool(jdone[0]) == rdone, f"step {t}"
        np.testing.assert_allclose(np.asarray(sp.observe(state)[0]), robs,
                                   rtol=0, atol=1e-4)
        if rdone or rtrunc:
            break
    assert t > 20  # the comparison actually covered a meaningful horizon


def test_deferred_observe_matches_eager():
    """The trainer's deferred-observe path (transition_deferred + refresh via
    vector.step) must produce identical trajectories to stepping the eager
    transition under the same autoreset wrapper — it only removes the duplicated
    per-step sensing of the fresh reset state."""
    from self_play_racing_tpu.envs import vector

    n = 8
    cps = jtrack.gen_tracks(4, seed=1)
    pool = jtrack.make_track_pool(cps, [8.0] * 4)
    track = jtrack.gather_tracks(pool, np.arange(n) % 4)
    cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    opp_params = net.init_params(jax.random.key(7), cfg.obs_dim, cfg.action_dim)
    opp = {
        "params": jax.tree.map(lambda x: x[None], opp_params),
        "log_std": jnp.full((1, 2), -1.0, jnp.float32),
        "idx": jnp.zeros((), jnp.int32),
        "use_policy": jnp.ones((), bool),
    }

    k0 = jax.random.key(11)
    state_e = sp.reset_state(cfg, track, k0)
    state_d, obs_d0 = sp.refresh(cfg, track, sp.reset_state_deferred(cfg, track, k0))
    np.testing.assert_array_equal(np.asarray(state_e.obs_all),
                                  np.asarray(state_d.obs_all))

    vs_e = vector.init(state_e, n, jax.random.key(1))
    vs_d = vector.init(state_d, n, jax.random.key(1))

    @jax.jit
    def step_eager(vs, a):
        return vector.step(
            vs, a,
            lambda s, a_, k: sp.transition(cfg, track, opp, s, a_, k),
            lambda s: sp.observe(s),
            lambda k: sp.reset_state(cfg, track, k),
        )

    @jax.jit
    def step_deferred(vs, a):
        return vector.step(
            vs, a,
            lambda s, a_, k: sp.transition_deferred(cfg, track, opp, s, a_, k),
            lambda s: sp.observe(s),
            lambda k: sp.reset_state_deferred(cfg, track, k),
            refresh_fn=lambda s: sp.refresh(cfg, track, s),
        )

    rng = np.random.RandomState(0)
    saw_reset = False
    for t in range(160):
        a = jnp.asarray(rng.uniform([-1, -1], [1, 1], (n, 2)), jnp.float32)
        vs_e, obs_e, rew_e, done_e, *_ , rec_e = step_eager(vs_e, a)
        vs_d, obs_d, rew_d, done_d, *_ , rec_d = step_deferred(vs_d, a)
        # the two programs fuse differently, so allow 1-2 ulp of f32 drift
        np.testing.assert_allclose(np.asarray(obs_e), np.asarray(obs_d),
                                   rtol=0, atol=1e-6, err_msg=f"step {t}")
        np.testing.assert_allclose(np.asarray(rew_e), np.asarray(rew_d),
                                   rtol=0, atol=1e-5, err_msg=f"step {t}")
        np.testing.assert_array_equal(np.asarray(done_e), np.asarray(done_d))
        saw_reset = saw_reset or bool(np.asarray(done_e).any())
    assert saw_reset  # the comparison exercised the autoreset path


def test_resume_from_snapshot_update_does_not_duplicate_snapshot(tmp_path):
    """A checkpoint written at a snapshot update already contains that snapshot;
    resuming from it must not take it again (the reference resumes at update+1
    and never re-runs the snapshot block, self_play_ppo.py:96-115)."""
    cfg = self_play_config(
        num_envs=4, num_steps=32, num_minibatches=2, update_epochs=2,
        total_timesteps=4 * 32 * 11, snapshot_freq=5, pool_size=4,
    )
    cps = jtrack.gen_tracks(2, seed=1)
    pool = jtrack.make_track_pool(cps, [8.0] * 2)
    track = jtrack.gather_tracks(pool, np.arange(4) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    tr = SelfPlayTrainer(cfg, env_cfg, track)
    tr.train(checkpoint_dir=str(tmp_path))  # 11 updates; snapshots at 5 and 10
    assert tr.num_snapshots == 2
    ckpt = str(tmp_path / "checkpoint_update_10")  # written at update 10, pool = 2

    tr2 = SelfPlayTrainer(cfg, env_cfg, track)
    tr2.train(resume_from=ckpt)  # resumes the single remaining update (10)
    assert tr2.num_snapshots == 2  # no duplicate snapshot at update 10

    # a later snapshot boundary after resume still fires
    tr2.train(num_updates=5)  # updates 11..15 -> snapshot at 15
    assert tr2.num_snapshots == 3


def test_snapshot_freezes_previous_updates_log_std():
    """The reference snapshots at the top of update u BEFORE that update's anneal
    (self_play_ppo.py:114-139), so the frozen buffer holds anneal(u-1)."""
    from self_play_racing_tpu.agent import ppo as jppo

    cfg = self_play_config(
        num_envs=4, num_steps=32, num_minibatches=2, update_epochs=2,
        total_timesteps=4 * 32 * 7, snapshot_freq=2, pool_size=5,
    )
    cps = jtrack.gen_tracks(2, seed=1)
    pool = jtrack.make_track_pool(cps, [8.0] * 2)
    track = jtrack.gather_tracks(pool, np.arange(4) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    tr = SelfPlayTrainer(cfg, env_cfg, track)
    tr.train()  # 7 updates; snapshots at updates 2, 4, 6 -> slots 0, 1, 2
    for slot, at_update in zip((0, 1, 2), (2, 4, 6)):
        expect = jppo.anneal_fractions(cfg, jnp.int32(at_update - 1), 2)[2]
        np.testing.assert_allclose(
            np.asarray(tr.pool["log_std"][slot]), np.asarray(expect),
            rtol=0, atol=0, err_msg=f"snapshot at update {at_update}",
        )


def test_reset_each_update_keeps_stale_next_obs():
    """reset_envs_each_update resets the ENV state but, like the reference (which
    rebuilds SyncVectorEnv without refreshing train()'s next_obs), rollout step 0
    must act on the previous rollout's final observation."""
    from self_play_racing_tpu.agent import ppo as jppo
    from self_play_racing_tpu.configs import base_config

    cfg = base_config(num_envs=4, num_steps=2, num_minibatches=1, update_epochs=1,
                      total_timesteps=4 * 2 * 4, reset_envs_each_update=True)
    obs_dim, act_dim = 4, 2

    # counter env: observe() exposes the step counter; reward encodes it too
    def reset(aux, key):
        return {"v": jnp.zeros((cfg.num_envs,), jnp.float32)}

    def transition(aux, state, action, key):
        v = state["v"] + 1.0
        rew = v + 0.01 * jnp.sum(action, axis=-1)
        f = jnp.zeros_like(v, bool)
        return {"v": v}, rew, f, f, {}

    def observe(aux, state):
        return jnp.broadcast_to(state["v"][:, None], (cfg.num_envs, obs_dim))

    hooks = jppo.EnvHooks(reset=reset, transition=transition, observe=observe)
    step = jax.jit(jppo.make_update_step(cfg, hooks, act_dim))
    aux = jnp.zeros(())
    runner = jppo.init_runner(jax.random.key(0), cfg, hooks, aux, obs_dim, act_dim)

    # same runner, different carried next_obs: if the reset branch kept the stale
    # obs, the step-0 action (and thus the reward's action term) must differ
    rA = runner.replace(obs=jnp.full_like(runner.obs, 5.0))
    rB = runner.replace(obs=jnp.full_like(runner.obs, -3.0))
    mA = jppo.unpack_metrics(step(rA, aux)[1])
    mB = jppo.unpack_metrics(step(rB, aux)[1])
    assert mA["mean_reward"] != mB["mean_reward"], \
        "step 0 ignored the carried (stale) observation"

    # and the env state itself IS reset each update: the counter-based reward
    # component repeats identically across consecutive updates
    r2, m1 = step(runner, aux)
    _, m2 = step(r2, aux)
    v1 = jppo.unpack_metrics(m1)["mean_reward"]
    v2 = jppo.unpack_metrics(m2)["mean_reward"]
    assert abs(v1 - v2) < 0.1, "env state was not reset between updates"


def test_selfplay_trainer_smoke(tmp_path):
    cfg = self_play_config(
        num_envs=8, num_steps=96, num_minibatches=4, update_epochs=3,
        total_timesteps=8 * 96 * 8, snapshot_freq=2, pool_size=3,
    )
    cps = jtrack.gen_tracks(4, seed=1)
    pool = jtrack.make_track_pool(cps, [8.0] * 4)
    track = jtrack.gather_tracks(pool, np.arange(8) % 4)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    tr = SelfPlayTrainer(cfg, env_cfg, track)
    info = tr.train(checkpoint_dir=str(tmp_path))
    # snapshots at updates 2,4,6 -> 3 snapshots, pool capped at 3
    assert tr.num_snapshots == 3
    assert tr.pool_count == 3
    assert np.isfinite(info["rewards"]).all()
    assert len(info["opponent_pool_size"]) > 0

    # checkpoint written at update 10? (only 8 updates) -> save/load roundtrip manually
    path = str(tmp_path / "ckpt_final")
    tr.save_checkpoint(path)
    tr2 = SelfPlayTrainer(cfg, env_cfg, track)
    tr2.load_checkpoint(path)
    assert tr2.num_snapshots == 3
    for a, b in zip(jax.tree.leaves(tr.pool), jax.tree.leaves(tr2.pool)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tr.runner.train.params),
                    jax.tree.leaves(tr2.runner.train.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(tr2.runner.train.update) == int(tr.runner.train.update)

    # resumed training continues without error
    tr2.train(num_updates=1)
    assert int(tr2.runner.train.update) == int(tr.runner.train.update) + 1
