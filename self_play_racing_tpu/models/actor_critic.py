"""Actor-critic MLP with externally annealed log-std.

Architecture reproduces /root/reference/agent/ppo.py:11-62:
 - actor:  Linear(obs,64)-Tanh-Linear(64,64)-Tanh-Linear(64,act)-Tanh  (mu head)
 - critic: Linear(obs,64)-Tanh-Linear(64,64)-Tanh-Linear(64,1)
 - orthogonal init, gain sqrt(2) hidden / 0.01 actor-out / 1.0 critic-out, zero bias
   (ppo.py:58-62)
 - ``log_std`` is NOT a learned parameter: the reference registers it as a buffer and
   anneals it from the training loop (ppo.py:28,250-253; SURVEY quirk #4). Here it is
   an explicit argument so the optimizer can never touch it.

Action distribution semantics (ppo.py:44-56): sample from an *unbounded* Normal, clamp
to [-1, 1], and evaluate the log-prob of the clamped value under the same Normal (no
tanh-squash Jacobian). Entropy is the unclamped Normal entropy (a constant w.r.t.
params since log_std is not learned).

Parameters are a plain pytree ``{"actor": [(w, b), ...], "critic": [(w, b), ...]}``
with ``w`` stored (in, out) so application is ``x @ w + b`` — transposed relative to
torch's (out, in) Linear weights; ``params_from_torch_state_dict`` converts reference
checkpoints.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

HIDDEN = 64
_LOG_2PI = float(np.log(2.0 * np.pi))


def _orthogonal(key, shape, gain, dtype):
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, dtype)


def init_params(key, obs_dim: int, action_dim: int, dtype=jnp.float32,
                hidden=(HIDDEN, HIDDEN)):
    """Orthogonally initialized parameter pytree (ppo.py:19-37,58-62).

    ``hidden`` generalizes the reference's fixed 64-64 towers to arbitrary depth /
    width (the default reproduces the reference architecture exactly).
    """
    hidden = tuple(hidden)
    n_layers = len(hidden) + 1
    ks = jax.random.split(key, 2 * n_layers)
    sq2 = float(np.sqrt(2.0))

    def layer(k, din, dout, gain):
        return (
            _orthogonal(k, (din, dout), gain, dtype),
            jnp.zeros((dout,), dtype),
        )

    def tower(keys, out_dim, out_gain):
        dims = (obs_dim,) + hidden
        layers = [layer(k, din, dout, sq2)
                  for k, din, dout in zip(keys[:-1], dims[:-1], dims[1:])]
        layers.append(layer(keys[-1], dims[-1], out_dim, out_gain))
        return layers

    return {
        "actor": tower(ks[:n_layers], action_dim, 0.01),
        "critic": tower(ks[n_layers:], 1, 1.0),
    }


def _mlp(layers, x, final_tanh: bool):
    for i, (w, b) in enumerate(layers):
        x = x @ w + b
        if i < len(layers) - 1 or final_tanh:
            x = jnp.tanh(x)
    return x


def actor_mu(params, obs):
    """Mean of the action distribution, tanh-bounded to (-1, 1) (ppo.py:19-26)."""
    return _mlp(params["actor"], obs, final_tanh=True)


def critic_value(params, obs):
    """State value, shape obs.shape[:-1] (critic output squeezed; ppo.py:31-41)."""
    return _mlp(params["critic"], obs, final_tanh=False)[..., 0]


def normal_log_prob(action, mu, log_std):
    """Sum over action dims of Normal(mu, exp(log_std)).log_prob(action)."""
    var = jnp.exp(2.0 * log_std)
    lp = -((action - mu) ** 2) / (2.0 * var) - log_std - 0.5 * _LOG_2PI
    return jnp.sum(lp, axis=-1)


def normal_entropy(log_std, action_dim: int, batch_shape):
    """Sum over action dims of Normal entropy: 0.5 + 0.5*log(2*pi) + log_std."""
    ent = jnp.sum(0.5 + 0.5 * _LOG_2PI + log_std)
    return jnp.broadcast_to(ent, batch_shape)


def sample_action(params, log_std, obs, key):
    """(action, log_prob, value): sample, clamp to [-1,1], log-prob of the clamped
    action (ppo.py:52-56)."""
    mu = actor_mu(params, obs)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mu.shape, mu.dtype)
    action = jnp.clip(mu + std * noise, -1.0, 1.0)
    return action, normal_log_prob(action, mu, log_std), critic_value(params, obs)


def evaluate_action(params, log_std, obs, action):
    """(log_prob, entropy, value) for given actions — the update-path evaluation
    (ppo.py:174)."""
    mu = actor_mu(params, obs)
    lp = normal_log_prob(action, mu, log_std)
    ent = normal_entropy(log_std, mu.shape[-1], lp.shape)
    return lp, ent, critic_value(params, obs)


def deterministic_action(params, obs):
    """Greedy action = tanh-bounded mu (used for deterministic evaluation)."""
    return actor_mu(params, obs)


def params_from_torch_state_dict(state_dict, dtype=jnp.float32):
    """Convert a reference ``Agent.state_dict()`` (or a path to one) into our pytree.

    Torch Linear weights are (out, in); ours are (in, out) -> transpose. The
    ``log_std`` buffer is returned separately.
    """
    if isinstance(state_dict, (str, bytes)):
        import torch

        state_dict = torch.load(state_dict, map_location="cpu")

    def arr(t):
        return jnp.asarray(np.asarray(t.detach().cpu() if hasattr(t, "detach") else t), dtype)

    def seq(prefix):
        # Linear layers sit at Sequential slots 0, 2, 4, ... (Tanh between each);
        # infer the depth from the state dict rather than assuming 3 layers.
        slots = sorted(int(k.split(".")[1]) for k in state_dict
                       if k.startswith(f"{prefix}.") and k.endswith(".weight"))
        return [(arr(state_dict[f"{prefix}.{i}.weight"]).T, arr(state_dict[f"{prefix}.{i}.bias"]))
                for i in slots]

    params = {
        "actor": seq("actor_mu"),
        "critic": seq("critic"),
    }
    log_std = arr(state_dict["log_std"])
    return params, log_std


def params_to_torch_state_dict(params, log_std):
    """Inverse of ``params_from_torch_state_dict`` (for checkpoint interop)."""
    import torch

    out = {}
    for name, key in (("actor_mu", "actor"), ("critic", "critic")):
        for layer_idx, (w, b) in enumerate(params[key]):
            slot = 2 * layer_idx  # Tanh occupies every odd Sequential slot
            out[f"{name}.{slot}.weight"] = torch.from_numpy(np.asarray(w).T.copy())
            out[f"{name}.{slot}.bias"] = torch.from_numpy(np.asarray(b).copy())
    out["log_std"] = torch.from_numpy(np.asarray(log_std).copy())
    return out
