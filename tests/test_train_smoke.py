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


def test_nondefault_tower_depth_checkpoint_roundtrip(tmp_path):
    """Policies saved with non-default hidden towers load through the bundle
    loader (architecture inferred from the leaf count) and serve correctly."""
    import jax
    import jax.numpy as jnp
    from self_play_racing_tpu.evaluate import load_policy_bundle
    from self_play_racing_tpu.models import actor_critic as net
    from self_play_racing_tpu.serve import Policy

    cfg = base_config(num_envs=4, num_steps=32, num_minibatches=2, update_epochs=2,
                      total_timesteps=4 * 32 * 2, hidden=(32, 32, 32))
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0] * 4)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    tr.train(num_updates=1)
    path = str(tmp_path / "deep.npz")
    tr.save(path)

    params, log_std, _ = load_policy_bundle(path)
    assert len(params["actor"]) == 4  # 3 hidden + output
    obs = jnp.zeros((2, 15), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(net.deterministic_action(params, obs)),
        np.asarray(net.deterministic_action(tr.params, obs)), atol=1e-7)
    p = Policy(path)
    assert p.act(np.zeros((2, 15), np.float32)).shape == (2, 2)


def test_runner_carry_key_is_independent_child():
    """The rollout carry key must be its own split child: jax.random.split is
    prefix-stable, so carrying the parent would replay the init/reset keys as
    the first rollout's action-noise keys."""
    import jax
    from self_play_racing_tpu.agent import ppo as jppo
    from self_play_racing_tpu.agent.trainer import make_single_env_hooks

    cfg = base_config(num_envs=4, num_steps=8, num_minibatches=2, update_epochs=1,
                      total_timesteps=4 * 8 * 2)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0] * 4)
    hooks = make_single_env_hooks(senv.RacingConfig(num_sensors=11))
    key = jax.random.key(7)
    runner = jppo.init_runner(key, cfg, hooks, track, 15, 2)
    carried = jax.random.key_data(runner.key)
    parent_and_children = [jax.random.key_data(key)] + [
        jax.random.key_data(k) for k in jax.random.split(key, 3)
    ]
    for other in parent_and_children:
        assert not np.array_equal(np.asarray(carried), np.asarray(other))


def test_divergence_detection(tmp_path):
    """A pathological learning rate blows the policy up; the train loop's
    divergence guard must name the failure instead of silently logging NaNs."""
    import pytest
    from self_play_racing_tpu.agent.trainer import DivergenceError

    import jax

    cfg = base_config(num_envs=4, num_steps=32, num_minibatches=2, update_epochs=2,
                      total_timesteps=4 * 32 * 2)
    pool = trk.default_track_pool()
    track = trk.gather_tracks(pool, [0] * 4)

    def poison(tr):
        bad = jax.tree.map(lambda x: x * np.nan, tr.runner.train.params)
        tr.runner = tr.runner.replace(train=tr.runner.train.replace(params=bad))
        return tr

    tr = poison(PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track))
    with pytest.raises(DivergenceError):
        tr.train()
    # warn mode keeps going
    tr2 = poison(PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track))
    tr2.train(on_divergence="warn")
