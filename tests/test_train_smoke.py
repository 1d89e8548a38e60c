"""End-to-end training smoke: a tiny PPO run must actually learn.

Random policy on this env scores around -50 per episode (immediate crashes). A few
updates of PPO should lift the mean episode return well above that — this is the
learning-curve regression guard (SURVEY §4 test plan, item e).
"""
import numpy as np

import jax.numpy as jnp

from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def test_ppo_smoke_learns():
    num_envs = 16
    cfg = base_config(
        num_envs=num_envs, num_steps=256, num_minibatches=8, update_epochs=4,
        total_timesteps=16 * 256 * 12,
    )
    cps = trk.gen_tracks(4, seed=1)
    pool = trk.make_track_pool(cps, [8.0] * 4)
    track = trk.gather_tracks(pool, np.arange(num_envs) % 4)
    env_cfg = senv.RacingConfig(num_sensors=11)

    trainer = PPOTrainer(cfg, env_cfg, track)
    info = trainer.train()

    rewards = info["rewards"]
    assert len(rewards) >= 8
    early = np.mean(rewards[:3])
    late = np.mean(rewards[-3:])
    assert late > early + 10, f"no learning signal: early={early:.1f} late={late:.1f}"
    assert np.isfinite(rewards).all()


def test_save_load_roundtrip(tmp_path):
    cfg = base_config(num_envs=4, num_steps=32, num_minibatches=2, update_epochs=2,
                      total_timesteps=4 * 32 * 2)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0, 0, 0, 0])
    env_cfg = senv.RacingConfig(num_sensors=11)
    trainer = PPOTrainer(cfg, env_cfg, track)
    trainer.train(num_updates=1)
    path = str(tmp_path / "agent.npz")
    trainer.save(path)

    trainer2 = PPOTrainer(cfg, env_cfg, track)
    trainer2.load(path)
    import jax
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_scale_entry_smoke(tmp_path, monkeypatch):
    """The reproducible scale-mode CLI entry (train.py scale) at toy sizes."""
    monkeypatch.chdir(tmp_path)
    from self_play_racing_tpu.train import train_scale

    tr = train_scale(
        total_timesteps=8 * 32 * 3, num_envs=8, num_steps=32, num_tracks=2,
        num_minibatches=2, update_epochs=2, snapshot_freq=1, pool_size=2,
        out=str(tmp_path / "scale.npz"),
        info_out=str(tmp_path / "info.json"),
    )
    assert tr.cfg.opponent_per_env and not tr.cfg.reset_envs_each_update
    assert tr.pool_count == 2
    assert (tmp_path / "scale.npz").exists() and (tmp_path / "info.json").exists()


def test_top_level_exports_resolve():
    import self_play_racing_tpu as spr

    for name in spr.__all__:
        assert getattr(spr, name) is not None
