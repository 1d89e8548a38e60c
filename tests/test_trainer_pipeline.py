"""Pipelined train-loop semantics: lagged metric consumption must not change
training_info, checkpoint contents, or anneal schedules.

The loop in agent/trainer.py consumes update-N metrics after dispatching update
N+1; snapshot/opponent/checkpoint decisions run off a host-side update counter.
These tests pin the observable contract.
"""
import os

import numpy as np
import pytest

import jax

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config, self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def _track(n):
    # gen_tracks reproduces the reference's global-RNG quirk (SURVEY §7 #6): the
    # first track's params depend on ambient np.random state, so pin it per call
    np.random.seed(123)
    pool = trk.make_track_pool(trk.gen_tracks(4, seed=1), [8.0] * 4)
    return trk.gather_tracks(pool, np.arange(n) % 4)


def test_training_info_matches_unpipelined_consumption():
    """Running train() in one call == running it update-by-update (the lagged
    pipeline must only change *when* metrics are read, not what is recorded)."""
    kw = dict(num_envs=8, num_steps=64, num_minibatches=4, update_epochs=2,
              total_timesteps=8 * 64 * 6)
    env_cfg = senv.RacingConfig(num_sensors=11)

    t1 = PPOTrainer(base_config(**kw), env_cfg, _track(8))
    info1 = t1.train()

    t2 = PPOTrainer(base_config(**kw), env_cfg, _track(8))
    for _ in range(t2.cfg.num_updates):
        t2.train(num_updates=1)
    info2 = t2.training_info

    assert info1["steps"] == info2["steps"]
    np.testing.assert_allclose(info1["rewards"], info2["rewards"], rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(t1.runner.train.params),
                    jax.tree.leaves(t2.runner.train.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_update_checkpoint_written(tmp_path):
    """A run whose last update lands on the 10-boundary still writes that
    checkpoint (the reference saves at the end of update u, self_play_ppo.py:154-167;
    our periodic save happens in _pre_update, so the final one is handled after
    the loop)."""
    cfg = self_play_config(num_envs=8, num_steps=32, num_minibatches=2,
                           update_epochs=2, total_timesteps=8 * 32 * 10,
                           snapshot_freq=4, pool_size=2)
    assert cfg.num_updates == 10
    tr = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11),
                         _track(8))
    tr.train(checkpoint_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "checkpoint_update_10.npz")
    # the checkpoint holds the post-update-10 state
    tr2 = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11),
                          _track(8))
    tr2.load_checkpoint(str(tmp_path / "checkpoint_update_10"))
    assert int(tr2.runner.train.update) == 10
    for a, b in zip(jax.tree.leaves(tr.runner.train.params),
                    jax.tree.leaves(tr2.runner.train.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_shardings_non_divisible_hidden_replicates():
    """TP placement: towers whose widths don't divide the model axis replicate
    instead of erroring."""
    from self_play_racing_tpu.models import actor_critic as net
    from self_play_racing_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = pmesh.make_mesh(jax.devices()[:8], model_parallel=2)
    params = net.init_params(jax.random.key(0), 15, 2, hidden=(66, 66))  # 66 % 2 == 0
    sh = pmesh.param_shardings(params, mesh)
    # 66 divides -> first layer column-sharded
    assert sh["actor"][0][0].spec == jax.sharding.PartitionSpec(None, "model")

    params_odd = net.init_params(jax.random.key(0), 15, 2, hidden=(65, 65))
    sh_odd = pmesh.param_shardings(params_odd, mesh)
    for w_sh, b_sh in sh_odd["actor"] + sh_odd["critic"]:
        assert w_sh.spec == jax.sharding.PartitionSpec(None, None)
        assert b_sh.spec in (jax.sharding.PartitionSpec(),)
