"""Serving wrapper: checkpoint loading + batched/single action contract."""
import numpy as np

from self_play_racing_tpu.serve import Policy, bench


def test_policy_act_contract():
    p = Policy("models/self_play_agent_scale.npz")
    obs = np.random.randn(5, 19).astype(np.float32)
    a = p.act(obs)
    assert a.shape == (5, 2) and (np.abs(a) <= 1.0).all()
    single = p.act(obs[0])
    assert single.shape == (2,)
    np.testing.assert_allclose(single, a[0], atol=1e-6)
    v = p.value(obs)
    assert v.shape == (5,) and np.isfinite(v).all()


def test_policy_sampled_mode():
    p = Policy("models/self_play_agent_scale.npz", deterministic=False)
    obs = np.zeros((4, 19), np.float32)
    a1, a2 = p.act(obs), p.act(obs)
    assert not np.allclose(a1, a2)  # key advances between calls
