"""Scale-mode self-play: per-env opponent sampling + resident env state (no forced
resets) — the intended generalization beyond the reference's one-opponent-per-update
parity mode (SURVEY quirk #7)."""
import json

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


def test_scale_features_composed(tmp_path):
    """VERDICT r1 #8: the features `python train.py scale --pfsp
    --resample-tracks-every K` actually ships, together — per-env opponents +
    PFSP sampling + on-device mid-training track resampling + periodic
    checkpoints + resume (+ the auto device mesh: the conftest provides 8
    virtual devices, so train_scale shards with data_shards=8)."""
    from self_play_racing_tpu import train as T

    out = tmp_path / "agent.npz"
    info_out = tmp_path / "info.json"
    ckpt_dir = tmp_path / "ckpt"
    common = dict(
        num_envs=8, num_steps=32, num_tracks=2, track_points=8,
        total_timesteps=8 * 32 * 4,          # 4 updates
        out=str(out), info_out=str(info_out),
        checkpoint_dir=str(ckpt_dir), checkpoint_every=2,
        resample_tracks_every=2,
        # cfg overrides
        num_minibatches=2, update_epochs=2, snapshot_freq=1, pool_size=2,
        opponent_sampling="pfsp",
    )
    tr = T.train_scale(**common)
    assert tr._host_update == 4
    assert tr.pool_count == 2 and tr.num_snapshots >= 2
    assert (ckpt_dir / "checkpoint_update_2.npz").exists()
    assert (ckpt_dir / "checkpoint_update_4.npz").exists()
    with open(info_out) as f:
        curve = json.load(f)
    assert len(curve["steps"]) == len(curve["rewards"])
    assert len(curve["opponent_pool_size"]) == len(curve["rewards"])
    assert np.isfinite(curve["rewards"]).all()
    # PFSP outcome counters flowed back from the device stats hook
    assert tr.pool_games.sum() >= 0 and (tr.pool_games >= tr.pool_wins).all()
    # PFSP weights well-formed over the live pool
    w = tr.opponent_weights()
    assert w.shape == (2,) and abs(w.sum() - 1.0) < 1e-9 and (w > 0).all()
    # per-env opponents under the sharded mesh
    assert np.asarray(tr.aux["opp"]["idx"]).shape == (8,)

    # resume mid-period from the update-2 checkpoint: lands on the pool that
    # was active at checkpoint time (boundary 2), not the construction pool
    tr2 = T.train_scale(**{**common, "resume_from": str(ckpt_dir / "checkpoint_update_2")})
    assert tr2._host_update == 4
    import jax as _jax

    from self_play_racing_tpu.envs import procgen as pg

    expected = pg.gen_track_pool_device(
        _jax.random.fold_in(_jax.random.key(tr2.cfg.seed), 2), 2, 8)
    got_wp = np.asarray(tr2.aux["track"].wp_x)
    exp_wp = np.asarray(trk.gather_tracks(expected, np.arange(8) % 2).wp_x)
    np.testing.assert_array_equal(got_wp, exp_wp)
