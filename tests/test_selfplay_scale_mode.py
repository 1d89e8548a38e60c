"""Scale-mode self-play: per-env opponent sampling + resident env state (no forced
resets) — the intended generalization beyond the reference's one-opponent-per-update
parity mode (SURVEY quirk #7)."""
import numpy as np

import jax

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import track as trk


def test_per_env_opponents_and_resident_state():
    cfg = self_play_config(
        num_envs=8, num_steps=64, num_minibatches=4, update_epochs=2,
        total_timesteps=8 * 64 * 6, snapshot_freq=1, pool_size=3,
        opponent_per_env=True, reset_envs_each_update=False,
    )
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0, 9.0])
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    tr = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11), track)
    info = tr.train()
    assert tr.pool_count == 3
    # per-env opponent indices: vector of num_envs entries, mixed values once pool > 1
    idx = np.asarray(tr.aux["opp"]["idx"])
    assert idx.shape == (8,)
    assert np.asarray(tr.aux["opp"]["use_policy"]).all()
    assert np.isfinite(info["rewards"]).all()
