"""Running observation normalization: statistics correctness + training integration."""
import numpy as np

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.envs import normalize as obsnorm
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def test_welford_merge_matches_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(50, 16, 7) * 3 + 1.5
    state = obsnorm.init(7)
    for batch in data:
        state = obsnorm.update(state, jnp.asarray(batch, jnp.float32))
    flat = data.reshape(-1, 7)
    np.testing.assert_allclose(np.asarray(state.mean), flat.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state.var), flat.var(0), rtol=1e-3)
    out = obsnorm.apply(state, jnp.asarray(flat, jnp.float32))
    np.testing.assert_allclose(np.asarray(out).mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out).std(0), 1.0, atol=1e-2)


def test_training_with_normalization_learns():
    cfg = base_config(num_envs=16, num_steps=128, num_minibatches=4, update_epochs=4,
                      total_timesteps=16 * 128 * 10, normalize_obs=True)
    pool = trk.make_track_pool(trk.gen_tracks(4, seed=1), [8.0] * 4)
    track = trk.gather_tracks(pool, np.arange(16) % 4)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    info = tr.train()
    assert np.isfinite(info["rewards"]).all()
    assert np.mean(info["rewards"][-2:]) > np.mean(info["rewards"][:2])
    # statistics actually accumulated
    assert float(tr.runner.obs_norm.count) > 10_000
    assert float(jnp.abs(tr.runner.obs_norm.mean).max()) > 0.01


def test_normalizer_persists_through_save_load_and_serving(tmp_path):
    """A policy trained with normalize_obs must carry its running statistics into
    saved checkpoints, evaluation rollouts, and the serving wrapper — otherwise it
    acts on un-normalized inputs at deployment."""
    cfg = base_config(num_envs=8, num_steps=64, num_minibatches=2, update_epochs=2,
                      total_timesteps=8 * 64 * 3, normalize_obs=True)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0] * 2)
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    tr.train()
    path = str(tmp_path / "norm_agent.npz")
    tr.save(path)

    # bundle loader returns the statistics
    from self_play_racing_tpu.evaluate import load_policy_bundle

    params, log_std, norm = load_policy_bundle(path)
    assert norm is not None
    np.testing.assert_allclose(np.asarray(norm.mean),
                               np.asarray(tr.runner.obs_norm.mean), rtol=1e-6)

    # trainer.load restores it
    tr2 = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    tr2.load(path)
    np.testing.assert_array_equal(np.asarray(tr2.runner.obs_norm.var),
                                  np.asarray(tr.runner.obs_norm.var))

    # serving applies it: Policy.act == policy(normalized obs), not policy(raw obs)
    from self_play_racing_tpu.models import actor_critic as net
    from self_play_racing_tpu.serve import Policy

    p = Policy(path, deterministic=True)
    raw = np.full((3, 15), 5.0, np.float32)
    served = p.act(raw)
    expect = np.asarray(net.deterministic_action(
        params, obsnorm.apply(norm, jnp.asarray(raw))))
    np.testing.assert_allclose(served, expect, atol=1e-6)
    assert not np.allclose(
        served, np.asarray(net.deterministic_action(params, jnp.asarray(raw))))

    # eval rollout accepts the statistics end-to-end
    from self_play_racing_tpu.utils import metrics as M

    eps = jax.jit(
        lambda t, k: M.rollout_single(params, log_std, senv.RacingConfig(num_sensors=11),
                                      t, k, max_steps=64, obs_norm=norm)
    )(track, jax.random.key(0))
    assert np.isfinite(np.asarray(eps["total_reward"])).all()


def test_selfplay_pool_opponents_use_snapshot_time_statistics():
    """Self-play + normalize_obs: each frozen pool opponent must act on
    observations normalized with the statistics captured at ITS snapshot time —
    raw observations are the wrong input scale for a normalized-trained policy."""
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv
    from self_play_racing_tpu.envs import selfplay as sp

    cfg = self_play_config(num_envs=8, num_steps=32, num_minibatches=2,
                           update_epochs=2, total_timesteps=8 * 32 * 4,
                           snapshot_freq=1, pool_size=2, normalize_obs=True)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0] * 2)
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    tr = SelfPlayTrainer(cfg, env_cfg, track)
    info = tr.train()
    assert np.isfinite(info["rewards"]).all()

    # snapshots carried their normalizer stats (slot 0 written at update >= 1)
    assert "norm_mean" in tr.pool
    assert float(np.abs(np.asarray(tr.pool["norm_mean"][0])).max()) > 0.0

    # opponent actions actually change when the stats are applied
    obs = jnp.asarray(np.random.RandomState(0).randn(8, env_cfg.obs_dim), jnp.float32)
    opp = dict(tr.aux["opp"])
    with_norm = sp.opponent_actions(env_cfg, opp, obs, jax.random.key(1))
    opp_raw = dict(opp, norm_mean=None, norm_var=None)
    without = sp.opponent_actions(env_cfg, opp_raw, obs, jax.random.key(1))
    assert not np.allclose(np.asarray(with_norm), np.asarray(without))


def test_full_checkpoint_resume_preserves_normalizer(tmp_path):
    """Full training checkpoints of normalize_obs runs must carry the learner's
    running statistics — a resume that reset them would feed mis-scaled inputs."""
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv

    cfg = self_play_config(num_envs=8, num_steps=32, num_minibatches=2,
                           update_epochs=2, total_timesteps=8 * 32 * 3,
                           snapshot_freq=1, pool_size=2, normalize_obs=True)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0] * 2)
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    tr = SelfPlayTrainer(cfg, env_cfg, track)
    tr.train()
    path = str(tmp_path / "ckpt")
    tr.save_checkpoint(path)

    tr2 = SelfPlayTrainer(cfg, env_cfg, track)
    tr2.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(tr2.runner.obs_norm.mean),
                                  np.asarray(tr.runner.obs_norm.mean))
    assert float(tr2.runner.obs_norm.count) == float(tr.runner.obs_norm.count)
