"""Running observation normalization (optional).

The reference ships this capability disabled — `gym.wrappers.NormalizeObservation` +
a +-10 clip are commented out at agent/ppo.py:89-90. Here it is a first-class,
on-device option: batched Welford-style running mean/variance updated once per vector
step (one merge for the whole [num_envs, obs_dim] batch, matching the semantics of
the per-step gym wrapper over a vector env), normalization applied to the policy's
input. Under a data-sharded mesh the batch statistics reduce over envs, so XLA
inserts the cross-device psums automatically.

Enable with ``PPOConfig(normalize_obs=True)``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ObsNormState:
    mean: jnp.ndarray   # [D]
    var: jnp.ndarray    # [D]
    count: jnp.ndarray  # scalar


def init(obs_dim: int, dtype=jnp.float32) -> ObsNormState:
    return ObsNormState(
        mean=jnp.zeros((obs_dim,), dtype),
        var=jnp.ones((obs_dim,), dtype),
        count=jnp.asarray(1e-4, dtype),
    )


def update(state: ObsNormState, obs) -> ObsNormState:
    """Merge one [N, D] batch into the running statistics (parallel Welford)."""
    batch_mean = obs.mean(axis=0)
    batch_var = obs.var(axis=0)
    batch_count = jnp.asarray(obs.shape[0], state.count.dtype)

    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * state.count * batch_count / tot
    return ObsNormState(mean=new_mean, var=m2 / tot, count=tot)


def apply(state: ObsNormState, obs, clip: float = 10.0, eps: float = 1e-8):
    """Normalized (and clipped, per the reference's commented TransformObservation)
    observations."""
    out = (obs - state.mean) / jnp.sqrt(state.var + eps)
    return jnp.clip(out, -clip, clip)
