"""Regression tests for robustness fixes found in review.

Covers: depth-generic torch state-dict interop, checkpoint shape/dtype
validation on load, the fresh-trainer log_std buffer value (reference
ppo.py:28 registers zeros), scale-mode checkpoint/resume wiring, and the
global-RNG-preserving render track helper.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.utils import checkpoint as ck


def test_torch_state_dict_roundtrip_arbitrary_depth():
    # 3 hidden layers -> Sequential Linear slots 0, 2, 4, 6 (Tanh between)
    params = net.init_params(jax.random.key(0), 15, 2, hidden=(32, 16, 8))
    sd = net.params_to_torch_state_dict(params, jnp.full((2,), -0.7))
    assert "actor_mu.6.weight" in sd and "critic.6.weight" in sd
    assert sd["actor_mu.6.weight"].shape == (2, 8)  # torch (out, in)
    back, log_std = net.params_from_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(log_std), -0.7)


def test_load_pytree_rejects_shape_mismatch(tmp_path):
    path = str(tmp_path / "c.npz")
    tree = {"pool": jnp.zeros((5, 3)), "step": jnp.zeros((), jnp.int32)}
    ck.save_pytree(path, tree, {"k": 1})
    # same leaf count, different pool_size: must fail loudly, not load silently
    bad = {"pool": jnp.zeros((8, 3)), "step": jnp.zeros((), jnp.int32)}
    with pytest.raises(ValueError, match="does not match the template"):
        ck.load_pytree(path, bad)
    # dtype mismatch is also caught
    bad_dtype = {"pool": jnp.zeros((5, 3)), "step": jnp.zeros((), jnp.float32)}
    with pytest.raises(ValueError, match="does not match the template"):
        ck.load_pytree(path, bad_dtype)
    good, meta = ck.load_pytree(path, tree)
    assert meta == {"k": 1}


def test_fresh_trainer_buffer_log_std_is_zeros():
    """Before any update the torch buffer holds its registration value, zeros
    (ppo.py:28) — not anneal(0) = log_std_start."""
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.envs import single as senv
    from self_play_racing_tpu.train import make_training_pool

    cfg = base_config(num_envs=4, num_steps=8, num_minibatches=2,
                      total_timesteps=64)
    np.random.seed(cfg.seed)
    tr = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11),
                    make_training_pool(cfg))
    np.testing.assert_array_equal(np.asarray(tr.buffer_log_std),
                                  np.zeros(2, np.float32))


def test_scale_mode_checkpoints_and_resume(tmp_path):
    from self_play_racing_tpu.train import train_scale

    ckdir = str(tmp_path / "ck")
    out = str(tmp_path / "m.npz")
    info = str(tmp_path / "i.json")
    kw = dict(total_timesteps=8 * 16 * 4, num_envs=8, num_steps=16,
              num_tracks=2, out=out, info_out=info, checkpoint_dir=ckdir,
              checkpoint_every=2, num_minibatches=2, update_epochs=2)
    train_scale(**kw)
    files = os.listdir(ckdir)
    assert "checkpoint_update_2.npz" in files
    assert "checkpoint_update_4.npz" in files
    # resume from update 2: finishes the run and does NOT rewrite the loaded file
    p2 = os.path.join(ckdir, "checkpoint_update_2.npz")
    mtime = os.path.getmtime(p2)
    t2 = train_scale(resume_from=os.path.join(ckdir, "checkpoint_update_2"), **kw)
    assert os.path.getmtime(p2) == mtime
    assert int(t2.runner.train.update) == 4


def test_held_out_track_preserves_global_rng():
    from self_play_racing_tpu.render import _held_out_track

    np.random.seed(7)
    expected = np.random.RandomState(7).random_sample(4)
    _held_out_track(123)  # internally reseeds the global RNG; must restore it
    np.testing.assert_array_equal(np.random.random_sample(4), expected)


def test_resume_past_2p1B_steps_reports_exact_counts(tmp_path):
    """VERDICT r3 #8: step counts must survive past 2^31 env steps. The device
    TrainState carries a dead i32 leaf (layout compat); everything authoritative
    derives from the never-wrapping update index — checkpoint meta stores the
    exact Python int, and training_info steps stay exact after resume."""
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv
    from self_play_racing_tpu.envs import track as trk

    big_update = 10_000_000  # x batch 256 = 2.56B steps > 2^31
    cfg = self_play_config(
        num_envs=8, num_steps=32, num_minibatches=4, update_epochs=2,
        total_timesteps=8 * 32 * (big_update + 2), snapshot_freq=5_000_000,
        pool_size=2, opponent_per_env=True, reset_envs_each_update=False)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [8.0, 9.0])
    track = trk.gather_tracks(pool, np.arange(8) % 2)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    tr = SelfPlayTrainer(cfg, env_cfg, track)
    tr.train(num_updates=1)
    # synthetic fast-forward: pretend 10M updates (2.56B steps) have run
    tr.runner = tr.runner.replace(train=tr.runner.train.replace(
        update=jnp.asarray(big_update, jnp.int32)))
    tr._host_update = big_update
    path = str(tmp_path / "ck")
    tr.save_checkpoint(path)

    import json
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    assert meta["global_step"] == big_update * cfg.batch_size  # exact, > 2^31
    assert meta["global_step"] > 2**31

    tr2 = SelfPlayTrainer(cfg, env_cfg, track)
    tr2.load_checkpoint(path)
    assert tr2._host_update == big_update
    tr2.train(num_updates=1)
    steps = tr2.training_info["steps"]
    if steps:  # episodes may or may not complete in one 32-step rollout
        assert steps[-1] == (big_update + 1) * cfg.batch_size
    # the host-side derivation is exact regardless
    assert tr2._host_update * cfg.batch_size == (big_update + 1) * cfg.batch_size
