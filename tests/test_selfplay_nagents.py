"""Self-play with N>2 agents — a generalization beyond the reference.

The reference's SelfPlayWrapper is hard-wired to one learner + one opponent
(wrappers.py:29-46 merges exactly two actions); our self-play view drives every
non-learner seat with a frozen-pool opponent (envs/selfplay.py:transition loops over
seats 1..A-1), and the trainer is agent-count agnostic. These tests pin that the
3-agent path is exercised end-to-end, not just the raw multi env.
"""
import numpy as np

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import selfplay as sp
from self_play_racing_tpu.envs import track as jtrack
from self_play_racing_tpu.models import actor_critic as net


def _track(n_envs):
    cps = jtrack.gen_tracks(2, seed=3)
    pool = jtrack.make_track_pool(cps, [8.0, 7.0])
    return jtrack.gather_tracks(pool, np.arange(n_envs) % 2)


def _pool_opp(env_cfg, pool_size=2, per_env=None):
    params = net.init_params(jax.random.key(7), env_cfg.obs_dim, env_cfg.action_dim)
    stacked = jax.tree.map(
        lambda x: jnp.stack([x + 0.01 * i for i in range(pool_size)]), params
    )
    idx_shape = () if per_env is None else (per_env,)
    return {
        "params": stacked,
        "log_std": jnp.full((pool_size, env_cfg.action_dim), -0.6, jnp.float32),
        "norm_mean": None,
        "norm_var": None,
        "idx": jnp.ones(idx_shape, jnp.int32),
        "use_policy": jnp.ones(idx_shape, bool),
    }


def test_deferred_matches_eager_3agents():
    """transition_deferred + refresh must produce the exact trajectory of the eager
    transition for 3 agents (two frozen-opponent seats acting on prev-step obs)."""
    env_cfg = menv.MultiRacingConfig(num_agents=3, num_sensors=7)
    n = 4
    track = _track(n)
    opp = _pool_opp(env_cfg)

    key = jax.random.key(0)
    se = sp.reset_state(env_cfg, track, key)
    sd = sp.reset_state_deferred(env_cfg, track, key)
    sd, obs_d = sp.refresh(env_cfg, track, sd)
    np.testing.assert_array_equal(np.asarray(se.obs_all), np.asarray(sd.obs_all))

    rng = np.random.RandomState(1)
    k = jax.random.key(42)
    for t in range(20):
        k, ke = jax.random.split(k)
        a0 = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
        se, rew_e, done_e, trunc_e, info_e = sp.transition(
            env_cfg, track, opp, se, a0, ke)
        sd, rew_d, done_d, trunc_d, info_d = sp.transition_deferred(
            env_cfg, track, opp, sd, a0, ke)
        sd, _ = sp.refresh(env_cfg, track, sd)
        np.testing.assert_array_equal(np.asarray(rew_e), np.asarray(rew_d))
        np.testing.assert_array_equal(np.asarray(done_e), np.asarray(done_d))
        np.testing.assert_array_equal(np.asarray(se.obs_all), np.asarray(sd.obs_all))


def test_opponent_seats_act_independently():
    """Each opponent seat draws its own action stream: with a 3-agent env the two
    frozen seats must not mirror each other (distinct PRNG splits + distinct
    previous-step observations)."""
    env_cfg = menv.MultiRacingConfig(num_agents=3, num_sensors=7)
    n = 8
    track = _track(n)
    opp = _pool_opp(env_cfg)

    state = sp.reset_state(env_cfg, track, jax.random.key(1))
    a0 = jnp.zeros((n, 2), jnp.float32)
    state, *_ = sp.transition(env_cfg, track, opp, state, a0, jax.random.key(2))
    # after one step the three cars occupy three distinct poses
    xs = np.asarray(state.inner.x)
    assert all(len(np.unique(np.round(xs[i], 9))) == 3 for i in range(n))


def test_eval_grid_3agents(tmp_path):
    """The batched eval grid runs at num_agents=3: a 3-agent-trained policy file
    evaluates over a small track grid with finite aggregate metrics."""
    from self_play_racing_tpu.evaluate import evaluate_multi_agent_overall
    from self_play_racing_tpu.utils import metrics as M

    env_cfg = menv.MultiRacingConfig(num_agents=3, num_sensors=11)
    n = 2
    cfg = self_play_config(
        num_envs=n, num_steps=8, num_minibatches=1, update_epochs=1,
        total_timesteps=n * 8 * 1,
    )
    tr = SelfPlayTrainer(cfg, env_cfg, _track(n))
    tr.train()
    model = str(tmp_path / "agent3.npz")
    tr.save(model)

    grid = M.build_eval_grid(num_tracks=2, num_runs=1, seed=42)
    res = evaluate_multi_agent_overall(grid, model, num_agents=3, seed=0)
    assert res["num_episodes"] == 2
    for k in ("success_rate", "crash_rate", "avg_speed", "avg_progress"):
        assert np.isfinite(res[k])


def test_selfplay_trainer_3agents_end_to_end(tmp_path):
    """The full trainer (snapshot pool, opponent selection, checkpointing) runs on a
    3-agent env: obs_dim widens to sensors+4+2*4, snapshots land in the ring, and
    training metrics stay finite."""
    env_cfg = menv.MultiRacingConfig(num_agents=3, num_sensors=7)
    assert env_cfg.obs_dim == 7 + 4 + 2 * 4
    n = 4
    cfg = self_play_config(
        num_envs=n, num_steps=16, num_minibatches=2, update_epochs=2,
        total_timesteps=n * 16 * 5, snapshot_freq=2, pool_size=2,
    )
    tr = SelfPlayTrainer(cfg, env_cfg, _track(n))
    info = tr.train(checkpoint_dir=str(tmp_path), checkpoint_every=2)
    assert tr.num_snapshots == 2  # updates 2 and 4
    assert all(np.isfinite(r) for r in info["rewards"])

    # resume from the final checkpoint with the same 3-agent layout
    tr2 = SelfPlayTrainer(cfg, env_cfg, _track(n))
    tr2.load_checkpoint(str(tmp_path / "checkpoint_update_4"))
    assert tr2.num_snapshots == 2
    np.testing.assert_array_equal(
        np.asarray(tr2.pool["log_std"]), np.asarray(tr.pool["log_std"]))
