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
