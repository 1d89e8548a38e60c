"""Prioritized fictitious self-play (PFSP) opponent sampling: per-slot win/game
counters harvested from rollout episode outcomes via the EnvHooks.stats tail,
(1-winrate)^power sampling weights, checkpoint persistence."""
import numpy as np

import jax

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import track as trk


def _trainer(**over):
    kw = dict(
        num_envs=8, num_steps=32, num_minibatches=4, update_epochs=2,
        total_timesteps=8 * 32 * 6, snapshot_freq=1, pool_size=3,
        opponent_per_env=True, reset_envs_each_update=False,
        opponent_sampling="pfsp")
    kw.update(over)
    cfg = self_play_config(**kw)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0, 9.0])
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    return SelfPlayTrainer(
        cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11), track)


def test_opponent_weights_prefer_hard_opponents():
    tr = _trainer()
    tr.num_snapshots = 3
    tr.pool_wins[:] = [9.0, 1.0, 5.0]   # slot 1 beats the learner most
    tr.pool_games[:] = [10.0, 10.0, 10.0]
    w = tr.opponent_weights()
    np.testing.assert_allclose(w.sum(), 1.0)
    assert w[1] > w[2] > w[0]

    # fresh (unplayed) slots get the 0.5 prior, not a div-by-zero
    tr.pool_wins[:] = 0.0
    tr.pool_games[:] = 0.0
    np.testing.assert_allclose(tr.opponent_weights(), np.full(3, 1 / 3))


def test_pfsp_training_accumulates_outcomes():
    tr = _trainer()
    info = tr.train()
    # snapshots every update -> pool fills; stats tail flowed into the counters
    assert tr.pool_count == 3
    assert tr.pool_games.sum() > 0
    assert 0.0 <= tr.pool_wins.sum() <= tr.pool_games.sum()
    rates = [r for r in info["pool_win_rate"] if np.isfinite(r)]
    assert rates and all(0.0 <= r <= 1.0 for r in rates)
    # per-env PFSP draws stay inside the live pool
    idx = np.asarray(tr.aux["opp"]["idx"])
    assert idx.shape == (8,) and (idx >= 0).all() and (idx < 3).all()


def test_pfsp_counters_survive_checkpoint(tmp_path):
    tr = _trainer()
    tr.train(num_updates=3)
    tr.pool_wins[:] = [2.0, 0.0, 1.0]
    tr.pool_games[:] = [4.0, 3.0, 2.0]
    path = str(tmp_path / "ck")
    tr.save_checkpoint(path)

    tr2 = _trainer()
    tr2.load_checkpoint(path)
    np.testing.assert_array_equal(tr2.pool_wins, [2.0, 0.0, 1.0])
    np.testing.assert_array_equal(tr2.pool_games, [4.0, 3.0, 2.0])


def test_uniform_mode_unchanged_metrics_extra_present():
    """The stats tail rides along in uniform mode too (the counters just don't
    drive sampling); named metrics keep their layout."""
    from self_play_racing_tpu.agent.ppo import METRIC_NAMES, unpack_metrics

    tr = _trainer(opponent_sampling="uniform")
    tr.snapshot_agent()
    tr.select_opponent()
    tr.runner, m = tr.update_step(tr.runner, tr.aux)
    d = unpack_metrics(m)
    assert set(METRIC_NAMES) <= set(d)
    assert d["_extra"].shape == (2 * 3,)
