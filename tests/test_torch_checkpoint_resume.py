"""Resume our SelfPlayTrainer from a *reference* full training checkpoint.

Builds a checkpoint in the reference's exact format (self_play_ppo.py:154-167)
using the reference's own Agent class and torch Adam, then imports it: params,
Adam moments, counters, and the opponent pool must all transfer, and training
must continue from there.
"""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from agent.ppo import Agent as RefAgent  # /root/reference via conftest sys.path
import gymnasium as gym

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import track as trk


def _ref_checkpoint(tmp_path, env_cfg, update=30, snapshot_freq=15):
    obs_space = gym.spaces.Box(-np.inf, np.inf, (env_cfg.obs_dim,), np.float32)
    act_space = gym.spaces.Box(-1.0, 1.0, (env_cfg.action_dim,), np.float32)
    torch.manual_seed(0)
    agent = RefAgent(obs_space, act_space)
    opt = torch.optim.Adam(agent.parameters(), lr=3e-4, eps=1e-5)
    # a couple of real optimizer steps so the Adam moments are non-trivial
    for _ in range(3):
        obs = torch.randn(32, env_cfg.obs_dim)
        act = torch.rand(32, env_cfg.action_dim) * 2 - 1
        _, lp, ent, v = agent.get_action_and_value(obs, act)
        loss = (lp.mean() - 0.5 * ent.mean() + (v**2).mean())
        opt.zero_grad()
        loss.backward()
        opt.step()

    pool = []
    for i in range(2):  # two surviving snapshots, oldest -> newest
        snap = RefAgent(obs_space, act_space)
        snap.load_state_dict(copy.deepcopy(agent.state_dict()))
        with torch.no_grad():
            snap.actor_mu[0].weight.mul_(0.5 + 0.25 * i)  # make them distinct
            snap.log_std.fill_(-0.4 - 0.1 * i)
        pool.append(snap.state_dict())

    ckpt = {
        "update": update,
        "global_step": (update + 1) * 2048,
        "agent_state_dict": agent.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
        "opponent_pool": pool,
        "config": {"snapshot_freq": snapshot_freq},
        "training_info": {"steps": [2048], "rewards": [1.0],
                          "opponent_pool_size": [1]},
    }
    path = str(tmp_path / "checkpoint_update_30.pth")
    torch.save(ckpt, path)
    return path, agent, opt, pool


def _trainer():
    cfg = self_play_config(num_envs=4, num_steps=16, num_minibatches=2,
                           update_epochs=2, total_timesteps=4 * 16 * 40)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [7.0, 8.0])
    track = trk.gather_tracks(pool, [0, 1, 0, 1])
    return SelfPlayTrainer(cfg, env_cfg, track), env_cfg


def test_torch_checkpoint_transfers_everything(tmp_path):
    trainer, env_cfg = _trainer()
    path, agent, opt, pool_sds = _ref_checkpoint(tmp_path, env_cfg)
    trainer.load_torch_checkpoint(path)

    # params (transposed) match
    sd = agent.state_dict()
    for tower, prefix in (("actor", "actor_mu"), ("critic", "critic")):
        for li, (w, b) in enumerate(trainer.runner.train.params[tower]):
            np.testing.assert_allclose(
                np.asarray(w), sd[f"{prefix}.{2*li}.weight"].numpy().T, atol=0)
            np.testing.assert_allclose(
                np.asarray(b), sd[f"{prefix}.{2*li}.bias"].numpy(), atol=0)

    # Adam moments match position-for-position (weights transposed)
    adam = [s for s in trainer.runner.train.opt_state
            if hasattr(s, "mu") and hasattr(s, "nu")][0]
    tstate = opt.state_dict()["state"]
    flat_mu = jax.tree.leaves(adam.mu)
    flat_nu = jax.tree.leaves(adam.nu)
    for i, (m, n) in enumerate(zip(flat_mu, flat_nu)):
        texp = tstate[i]["exp_avg"].numpy()
        texp2 = tstate[i]["exp_avg_sq"].numpy()
        if texp.ndim == 2:
            texp, texp2 = texp.T, texp2.T
        np.testing.assert_allclose(np.asarray(m), texp, atol=0)
        np.testing.assert_allclose(np.asarray(n), texp2, atol=0)
    assert int(adam.count) == int(tstate[0]["step"])

    # counters: reference 0-based update 30 -> 31 completed updates here
    # (global step is derived, not device state: update * batch_size)
    assert trainer._host_update == 31
    assert int(trainer.runner.train.update) == 31

    # pool: num_snapshots = 30 // 15 = 2; list maps to ring slots 0, 1
    assert trainer.num_snapshots == 2 and trainer.pool_count == 2
    for k, sd_opp in enumerate(pool_sds):
        np.testing.assert_allclose(
            np.asarray(trainer.pool["params"]["actor"][0][0][k]),
            sd_opp["actor_mu.0.weight"].numpy().T, atol=0)
        np.testing.assert_allclose(
            np.asarray(trainer.pool["log_std"][k]),
            sd_opp["log_std"].numpy(), atol=0)

    assert trainer.training_info["rewards"] == [1.0]


def test_torch_checkpoint_resume_trains(tmp_path):
    trainer, env_cfg = _trainer()
    path, *_ = _ref_checkpoint(tmp_path, env_cfg)
    info = trainer.train(resume_from=path, num_updates=2)
    assert trainer._host_update == 33
    assert np.isfinite(info["rewards"]).all()
    # reference checkpoints carry only steps/rewards/opponent_pool_size; the
    # loader must (re)create the keys OUR _post_update appends to, or the
    # first update with completed episodes KeyErrors (found resuming the
    # genuine 3M-step reference run's checkpoint_update_90)
    assert "pool_win_rate" in trainer.training_info
    assert "opponent_pool_size" in trainer.training_info


def test_torch_checkpoint_rejects_wrong_architecture(tmp_path):
    cfg = self_play_config(num_envs=4, num_steps=16, num_minibatches=2,
                           update_epochs=2, total_timesteps=4 * 16 * 40,
                           hidden=(32, 32))
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    pool = trk.make_track_pool(trk.gen_tracks(2, seed=1), [7.0, 8.0])
    track = trk.gather_tracks(pool, [0, 1, 0, 1])
    trainer = SelfPlayTrainer(cfg, env_cfg, track)
    path, *_ = _ref_checkpoint(tmp_path, env_cfg)
    with pytest.raises(ValueError, match="architecture"):
        trainer.load_torch_checkpoint(path)


def test_load_genuine_reference_checkpoint():
    """The REAL reference run's final checkpoint (produced by its own full
    3M-step training in this container, committed as a fixture) loads and
    continues training: update counter 91, full 5-member pool, our
    training_info keys present."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "models", "reference_selfplay_checkpoint_update_90.pth")
    if not os.path.exists(path):
        pytest.skip("genuine reference checkpoint fixture not present")
    trainer, env_cfg = _trainer()
    trainer.load_torch_checkpoint(path)
    assert trainer._host_update == 91
    assert trainer.pool_count == 5
    assert "pool_win_rate" in trainer.training_info
    assert len(trainer.training_info["rewards"]) > 80  # its real curve rode along
    trainer.select_opponent()
    info = trainer.train(num_updates=1)
    assert np.isfinite(info["rewards"]).all()
