"""Inference/serving: a minimal deployable policy.

Loads any framework checkpoint (.npz) or reference torch state dict (.pth), jits the
action computation once per batch shape, and serves deterministic or sampled actions.
``python -m self_play_racing_tpu.serve --model ... --bench`` reports latency and
throughput across batch sizes on the local accelerator.

Measured through the axon TPU tunnel: ~25 ms latency floor per call (network round
trip, not compute — the 64-wide MLP itself is microseconds on-chip), ~196K actions/s
at batch 8192. Colocated serving removes the tunnel term.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from .models import actor_critic as net


class Policy:
    """Thread-compatible stateless policy server around a checkpoint."""

    def __init__(self, model_path: str, deterministic: bool = True):
        from .evaluate import load_policy_bundle

        self.params, self.log_std, self.obs_norm = load_policy_bundle(model_path)
        self.deterministic = deterministic
        self._det = jax.jit(net.deterministic_action)
        self._sample = jax.jit(net.sample_action)
        self._value = jax.jit(net.critic_value)
        self._key = jax.random.key(0)
        if self.obs_norm is not None:
            from .envs import normalize as obsnorm

            self._norm = jax.jit(obsnorm.apply)

    def act(self, obs) -> np.ndarray:
        """obs: [batch, obs_dim] (or [obs_dim]) -> actions in [-1, 1]."""
        x = jnp.asarray(obs, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if self.obs_norm is not None:
            x = self._norm(self.obs_norm, x)
        if self.deterministic:
            a = self._det(self.params, x)
        else:
            self._key, k = jax.random.split(self._key)
            a, _, _ = self._sample(self.params, self.log_std, x, k)
        a = np.asarray(a)
        return a[0] if squeeze else a

    def value(self, obs) -> np.ndarray:
        x = jnp.asarray(obs, jnp.float32)
        if self.obs_norm is not None:
            x = self._norm(self.obs_norm, x)
        return np.asarray(self._value(self.params, x))


def bench(policy: Policy, obs_dim: int = 19, batches=(1, 64, 1024, 8192), reps=20):
    rows = []
    for b in batches:
        obs = np.random.randn(b, obs_dim).astype(np.float32)
        policy.act(obs)  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            policy.act(obs)
        dt = (time.perf_counter() - t0) / reps
        rows.append({"batch": b, "latency_ms": dt * 1e3,
                     "actions_per_s": b / dt})
        print(f"batch {b:6d}: {dt*1e3:8.3f} ms  {b/dt:,.0f} actions/s")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--bench", action="store_true")
    p.add_argument("--obs-dim", type=int, default=19)
    args = p.parse_args(argv)
    policy = Policy(args.model)
    if args.bench:
        bench(policy, args.obs_dim)


if __name__ == "__main__":
    main()
