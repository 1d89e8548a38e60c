"""Reward-shaping configurability + the opt-in speed-weight anneal."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def _one_step_reward(cfg, track, action=(0.0, 1.0), steps=40):
    state, _ = senv.reset(cfg, track)
    total = 0.0
    for _ in range(steps):  # enough steps to pass several waypoints
        state, rew, *_ = senv.transition(cfg, track, state, jnp.asarray([action]))
        total += float(rew[0])
    return total


def test_progress_scale_scales_reward():
    pool = trk.make_track_pool([trk.gen_random_track(11, 55, 12, 0.3, 0.5, seed=4)],
                               [8.0])
    track = trk.gather_tracks(pool, [0])
    base = senv.RacingConfig(num_sensors=11)
    doubled = dataclasses.replace(base, progress_scale=400.0, speed_weight=0.0)
    base0 = dataclasses.replace(base, speed_weight=0.0)
    r1 = _one_step_reward(base0, track)
    r2 = _one_step_reward(doubled, track)
    assert r2 == 2 * r1 != 0.0


def test_speed_weight_anneal_option():
    cfg = base_config(num_envs=4, num_steps=16, num_minibatches=2, update_epochs=1,
                      total_timesteps=4 * 16 * 4, anneal_speed_weight=True)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0] * 4)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    assert isinstance(tr.aux, dict)
    tr.train(num_updates=1)
    assert float(tr.aux["speed_weight"]) == 8.0  # frac=1 at update 0
    tr.train(num_updates=2)
    # by update 2 of 4: frac = 0.5 -> speed weight 11.0
    assert float(tr.aux["speed_weight"]) == 11.0


def test_default_aux_stays_plain_track():
    cfg = base_config(num_envs=4, num_steps=16, num_minibatches=2, update_epochs=1,
                      total_timesteps=4 * 16 * 2)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0] * 4)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    assert not isinstance(tr.aux, dict)  # parity default: constant 8.0, no dict wrap


def test_config_validation_rejects_bad_shapes():
    import pytest
    from self_play_racing_tpu.configs import base_config

    with pytest.raises(ValueError, match="divisible"):
        base_config(num_envs=10, num_steps=10, num_minibatches=16,
                    total_timesteps=10_000)
    with pytest.raises(ValueError, match="less than one batch"):
        base_config(num_envs=16, num_steps=2048, total_timesteps=100)
    with pytest.raises(ValueError, match="enabled together"):
        base_config(snapshot_freq=5, pool_size=0, total_timesteps=10_000_000)
