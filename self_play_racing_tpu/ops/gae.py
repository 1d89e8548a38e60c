"""Generalized Advantage Estimation as a reverse-time scan.

Reproduces /root/reference/agent/ppo.py:134-154 (CleanRL-style): reversed loop with
bootstrap from ``next_value``/``next_done``, nonterminal masking, returns = adv + values.
``dones[t]`` is the done flag *entering* step t (the rollout stores next_done from the
previous step, ppo.py:106), truncation treated as termination (no bootstrap-through-
truncation correction — matching the reference exactly).

TPU note: the sequential reverse scan is the RIGHT form here, and it is
measured-free — 0.13 ms of the 170 ms A=2 self-play update at [256, 4096]
(profiler-trace leaf attribution, docs/DESIGN.md). An associative-scan
reformulation (suffix-composition of the affine maps adv_t = delta_t +
c_t*adv_{t+1}, log2(T) whole-array phases) was implemented and measured: the
full update was unchanged within noise, so it was rejected — it trades the
reference's exact sequential FP order (bit-identical recurrence to torch's
reversed loop) for ~1e-7 reassociation error and buys nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(rewards, dones, values, next_value, next_done, gamma: float, lam: float):
    """rewards/dones/values: [T, N]; next_value/next_done: [N].

    Returns (advantages, returns), both [T, N].
    """
    dtype = rewards.dtype
    g = jnp.asarray(gamma, dtype)
    gl = jnp.asarray(gamma * lam, dtype)

    nonterminal_next = 1.0 - jnp.concatenate(
        [dones[1:].astype(dtype), next_done.astype(dtype)[None]], axis=0
    )
    value_next = jnp.concatenate([values[1:], next_value[None]], axis=0)
    deltas = rewards + g * nonterminal_next * value_next - values

    def backward(running_adv, inp):
        delta, nt = inp
        adv = delta + gl * nt * running_adv
        return adv, adv

    _, advs = jax.lax.scan(
        backward,
        jnp.zeros_like(next_value),
        (deltas, nonterminal_next),
        reverse=True,
    )
    return advs, advs + values
