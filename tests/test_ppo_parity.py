"""PPO learner parity against the reference torch implementation (golden oracle).

Covers, with identical weights on both sides (converted via the torch-interop layer):
 - network forward: mu / value / log-prob / entropy equal to torch Agent outputs
 - GAE equal to reference compute_advantages on random rollouts
 - one full ppo_update step (1 epoch x 1 minibatch: permutation-invariant, so the
   different shuffle RNGs cannot matter) -> resulting parameters match torch+Adam
 - KL early-stop semantics: a triggering minibatch leaves params untouched
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent import ppo as jppo
from self_play_racing_tpu.configs import base_config
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.ops.gae import compute_gae

from agent.ppo import PPO as RefPPO
from agent.ppo import Agent as RefAgent


class _Space:
    def __init__(self, shape):
        self.shape = shape


def make_matched_agents(obs_dim=15, action_dim=2, log_std_val=-0.5, seed=0):
    params = net.init_params(jax.random.key(seed), obs_dim, action_dim)
    log_std = jnp.full((action_dim,), log_std_val, jnp.float32)
    ref = RefAgent(_Space((obs_dim,)), _Space((action_dim,)))
    ref.load_state_dict(net.params_to_torch_state_dict(params, log_std))
    return params, log_std, ref


def test_forward_parity():
    params, log_std, ref = make_matched_agents()
    rng = np.random.RandomState(0)
    obs = rng.randn(64, 15).astype(np.float32)
    act = np.clip(rng.randn(64, 2), -1, 1).astype(np.float32)

    with torch.no_grad():
        t_act, t_lp, t_ent, t_val = ref.get_action_and_value(
            torch.from_numpy(obs), torch.from_numpy(act)
        )
    j_lp, j_ent, j_val = net.evaluate_action(
        params, log_std, jnp.asarray(obs), jnp.asarray(act)
    )
    np.testing.assert_allclose(np.asarray(j_lp), t_lp.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_ent), t_ent.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(j_val), t_val.numpy().ravel(), atol=2e-5)

    mu = net.actor_mu(params, jnp.asarray(obs))
    with torch.no_grad():
        t_mu = ref.actor_mu(torch.from_numpy(obs))
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=2e-6)


def test_torch_roundtrip():
    params, log_std, _ = make_matched_agents(seed=3)
    sd = net.params_to_torch_state_dict(params, log_std)
    params2, log_std2 = net.params_from_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(log_std), np.asarray(log_std2))


def test_gae_parity():
    cfg = base_config(num_envs=8, num_steps=64)
    rng = np.random.RandomState(1)
    T, N = cfg.num_steps, cfg.num_envs
    rewards = rng.randn(T, N).astype(np.float32) * 5
    dones = (rng.rand(T, N) < 0.05)
    values = rng.randn(T, N).astype(np.float32)
    next_value = rng.randn(N).astype(np.float32)
    next_done = rng.rand(N) < 0.5

    ref = RefPPO.__new__(RefPPO)
    ref.config = {"num_steps": T, "gamma": cfg.gamma, "gae_lambda": cfg.gae_lambda}
    ref.device = torch.device("cpu")
    t_adv, t_ret = ref.compute_advantages(
        torch.from_numpy(rewards),
        torch.from_numpy(dones.astype(np.float32)),
        torch.from_numpy(values),
        torch.from_numpy(next_value),
        torch.from_numpy(next_done),
    )
    j_adv, j_ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values),
        jnp.asarray(next_value), jnp.asarray(next_done), cfg.gamma, cfg.gae_lambda,
    )
    np.testing.assert_allclose(np.asarray(j_adv), t_adv.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ret), t_ret.numpy(), atol=1e-4)


def _random_flat_batch(cfg, obs_dim, action_dim, params, log_std, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.batch_size
    obs = rng.randn(b, obs_dim).astype(np.float32)
    actions = np.clip(rng.randn(b, action_dim) * 0.5, -1, 1).astype(np.float32)
    # old logprobs from the *same* policy keeps ratios near 1 => no KL stop
    lp, _, vals = net.evaluate_action(
        params, log_std, jnp.asarray(obs), jnp.asarray(actions)
    )
    advantages = rng.randn(b).astype(np.float32)
    returns = np.asarray(vals) + rng.randn(b).astype(np.float32) * 0.1
    return jppo.Batch(
        obs=jnp.asarray(obs), actions=jnp.asarray(actions), logprobs=lp,
        advantages=jnp.asarray(advantages), returns=jnp.asarray(returns), values=vals,
    )


def test_single_minibatch_update_matches_torch():
    cfg = base_config(num_envs=4, num_steps=64, num_minibatches=1, update_epochs=1,
                      kl_target=1e9)
    obs_dim, action_dim = 15, 2
    params, log_std, ref = make_matched_agents(obs_dim, action_dim)
    flat = _random_flat_batch(cfg, obs_dim, action_dim, params, log_std)

    # --- torch side: drive the actual reference ppo_update
    refppo = RefPPO.__new__(RefPPO)
    refppo.config = {
        "batch_size": cfg.batch_size, "minibatch_size": cfg.minibatch_size,
        "update_epochs": 1, "kl_target": 1e9, "clip_coef": cfg.clip_coef,
        "ent_coef": cfg.ent_coef, "vf_coef": cfg.vf_coef,
        "max_grad_norm": cfg.max_grad_norm,
    }
    refppo.device = torch.device("cpu")
    refppo.agent = ref
    refppo.optimizer = torch.optim.Adam(ref.parameters(), lr=cfg.learning_rate, eps=1e-5)
    T, N = cfg.num_steps, cfg.num_envs

    def t(x, shape):
        return torch.from_numpy(np.asarray(x)).reshape(shape)

    refppo.ppo_update(
        t(flat.advantages, (T, N)), t(flat.returns, (T, N)), t(flat.values, (T, N)),
        t(flat.logprobs, (T, N)), t(flat.actions, (T, N, action_dim)),
        t(flat.obs, (T, N, obs_dim)),
    )

    # --- jax side
    opt = jppo.make_optimizer(cfg)
    opt_state = opt.init(params)
    new_params, _, stopped, stats = jppo.run_ppo_update(
        cfg, opt, params, opt_state, log_std, jnp.float32(cfg.learning_rate),
        flat, jax.random.key(0),
    )
    assert not bool(stopped)

    ref_after = ref.state_dict()
    ours_after = net.params_to_torch_state_dict(new_params, log_std)
    for k in ref_after:
        if k == "log_std":
            continue
        np.testing.assert_allclose(
            ours_after[k].numpy(), ref_after[k].numpy(), atol=3e-5,
            err_msg=f"mismatch in {k}",
        )


def test_kl_early_stop_blocks_all_updates():
    cfg = base_config(num_envs=4, num_steps=32, num_minibatches=2, update_epochs=3,
                      kl_target=1e-12)
    obs_dim, action_dim = 15, 2
    params, log_std, _ = make_matched_agents(obs_dim, action_dim)
    flat = _random_flat_batch(cfg, obs_dim, action_dim, params, log_std)
    # perturb old logprobs so approx_kl is sure to exceed the (tiny) target
    flat = flat._replace(logprobs=flat.logprobs + 0.1)

    opt = jppo.make_optimizer(cfg)
    new_params, _, stopped, stats = jppo.run_ppo_update(
        cfg, opt, params, opt_state := opt.init(params), log_std,
        jnp.float32(3e-4), flat, jax.random.key(0),
    )
    assert bool(stopped)
    assert float(np.sum(np.asarray(stats["applied"]))) == 0.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shuffle_blocks_never_span_timesteps():
    """Effective shuffle block is gcd(shuffle_block_size, num_envs): with the
    reference's 16 envs, a 64-sample block would lock 4 consecutive timesteps of
    the same envs into every minibatch. block=64 must therefore behave exactly
    like block=16 (the gcd) — identical parameters after a full update."""
    obs_dim, act_dim = 15, 2
    params = net.init_params(jax.random.key(3), obs_dim, act_dim)
    log_std = jnp.full((act_dim,), -0.5, jnp.float32)

    def run(block):
        cfg = base_config(num_envs=16, num_steps=64, num_minibatches=4,
                          update_epochs=2, total_timesteps=16 * 64 * 4,
                          shuffle_block_size=block)
        opt = jppo.make_optimizer(cfg)
        opt_state = opt.init(params)
        b = cfg.batch_size
        k = jax.random.key(9)
        flat = jppo.Batch(
            obs=jax.random.normal(k, (b, obs_dim), jnp.float32),
            actions=jnp.clip(jax.random.normal(k, (b, act_dim), jnp.float32), -1, 1),
            logprobs=jax.random.normal(k, (b,), jnp.float32),
            advantages=jax.random.normal(k, (b,), jnp.float32),
            returns=jax.random.normal(k, (b,), jnp.float32),
            values=jax.random.normal(k, (b,), jnp.float32),
        )
        out, _, _, _ = jppo.run_ppo_update(
            cfg, opt, params, opt_state, log_std, jnp.float32(3e-4), flat,
            jax.random.key(4),
        )
        return out

    p64 = run(64)
    p16 = run(16)
    for a, b in zip(jax.tree.leaves(p64), jax.tree.leaves(p16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kl_midway_exit_matches_manual_replay():
    """Early exit at an arbitrary mid-sequence minibatch: run_ppo_update's result
    must equal manually applying exactly the pre-trigger minibatches in order
    (same perms, same gathers), with the triggering one computed but not applied."""
    import math

    from self_play_racing_tpu.ops.prng import epoch_permutation

    cfg = base_config(num_envs=8, num_steps=32, num_minibatches=4, update_epochs=2,
                      kl_target=0.012, total_timesteps=8 * 32 * 4)
    obs_dim, action_dim = 15, 2
    params, log_std, _ = make_matched_agents(obs_dim, action_dim)
    flat = _random_flat_batch(cfg, obs_dim, action_dim, params, log_std)
    # nudge old logprobs so approx_kl crosses the target partway through the
    # 8-minibatch sequence (not at minibatch 0, not never)
    flat = flat._replace(logprobs=flat.logprobs + 0.011)

    lr = jnp.float32(3e-4)
    key = jax.random.key(12)
    opt = jppo.make_optimizer(cfg)
    new_params, _, stopped, stats = jppo.run_ppo_update(
        cfg, opt, params, opt.init(params), log_std, lr, flat, key,
    )
    computed = int(np.sum(np.asarray(stats["computed"])))
    applied = int(np.sum(np.asarray(stats["applied"])))
    assert bool(stopped), "test needs the KL stop to fire"
    assert 0 < applied < cfg.update_epochs * cfg.num_minibatches - 1, (
        f"test needs a mid-sequence stop, got applied={applied}")
    assert computed == applied + 1  # the triggering minibatch computes, not applies

    # manual replay of the applied prefix
    block = math.gcd(cfg.shuffle_block_size, cfg.num_envs)
    n_units = cfg.batch_size // block
    mb_units = cfg.minibatch_size // block
    blocked = jppo.Batch(*(x.reshape((n_units, block) + x.shape[1:]) for x in flat))
    ekeys = jax.random.split(key, cfg.update_epochs)
    perms = jax.vmap(lambda k: epoch_permutation(k, n_units))(ekeys)

    p, s = params, opt.init(params)
    import optax
    for i in range(applied):
        e, m = divmod(i, cfg.num_minibatches)
        idx = perms[e, m * mb_units:(m + 1) * mb_units]
        mb = jppo.Batch(*(
            jnp.take(x, idx, axis=0).reshape((cfg.minibatch_size,) + x.shape[2:])
            for x in blocked
        ))
        (_, st), grads = jax.value_and_grad(jppo._ppo_loss, has_aux=True)(
            p, log_std, mb, cfg)
        assert float(st["approx_kl"]) <= cfg.kl_target
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, jax.tree.map(lambda u: -lr * u, updates))

    # compiled-while-loop vs eager replay differ only by fusion rounding (~1 ulp)
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)
