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


def test_torch_checkpoint_eval_flow(tmp_path):
    """Reference .pth state dicts load through the same eval/serve surface."""
    import torch
    import jax
    from self_play_racing_tpu.models import actor_critic as net
    from self_play_racing_tpu.evaluate import load_policy

    params = net.init_params(jax.random.key(5), 19, 2)
    sd = net.params_to_torch_state_dict(params, np.full((2,), -0.8, np.float32))
    path = str(tmp_path / "agent.pth")
    torch.save(sd, path)
    p2, ls2 = load_policy(path)
    for a, b in zip(
        __import__("jax").tree.leaves(params), __import__("jax").tree.leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pol = Policy(path)
    a = pol.act(np.zeros((3, 19), np.float32))
    assert a.shape == (3, 2)
