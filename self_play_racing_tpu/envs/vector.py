"""Lockstep vectorization with Gymnasium-1.x-style NEXT_STEP autoreset.

This replaces the reference's ``gym.vector.SyncVectorEnv`` (a serial Python loop over
16 envs per step, ppo.py:70) with a single fused program over the whole env batch.

Autoreset semantics (documented divergence knob, SURVEY.md §7 "hard parts"):
 - ``next_step`` (default, Gymnasium 1.x parity): after an env reports
   terminated|truncated, its *next* step ignores the action and returns the reset
   observation with reward 0 and done False — exactly the transition SyncVectorEnv
   inserts into rollouts (and therefore into GAE inputs).
 - callers that want same-step resets can simply reset the merged state themselves.

Episode statistics (RecordEpisodeStatistics equivalent, ppo.py:88):
 - per-env running return/length accumulators live in the vector state; the reset
   transition is not counted (the wrapper's counters reset on env.reset, so the
   autoreset step contributes neither reward nor length).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EpisodeStats:
    """Per-env running episode accumulators + per-step 'finished episode' outputs."""

    ep_return: jnp.ndarray   # [N] running sum of rewards this episode
    ep_length: jnp.ndarray   # [N] int32 steps this episode


@struct.dataclass
class VecState:
    """Vectorized env state + autoreset bookkeeping."""

    env: object                 # underlying batched env state pytree
    pending_reset: jnp.ndarray  # [N] bool: env must reset on next step call
    stats: EpisodeStats
    key: jnp.ndarray            # PRNG key consumed by envs with random resets


def init(env_state, num_envs: int, key, dtype=jnp.float32) -> VecState:
    return VecState(
        env=env_state,
        pending_reset=jnp.zeros((num_envs,), bool),
        stats=EpisodeStats(
            ep_return=jnp.zeros((num_envs,), dtype),
            ep_length=jnp.zeros((num_envs,), jnp.int32),
        ),
        key=key,
    )


def step(
    vstate: VecState,
    action,
    transition_fn: Callable,
    observe_fn: Callable,
    reset_fn: Callable,
    refresh_fn: Callable = None,
    info_fn: Callable = None,
):
    """One lockstep vector step with NEXT_STEP autoreset.

    transition_fn(state, action, key) -> (new_state, reward, terminated, truncated, info)
      (the key serves envs with stochastic dynamics, e.g. self-play opponent sampling)
    observe_fn(state) -> obs
    reset_fn(key) -> fresh state (batched; key is per-call, envs split internally)
    refresh_fn(state) -> (state, obs): optional replacement for observe_fn for envs
      that cache observations inside their state (e.g. the self-play env, whose
      opponents act on previous-step obs). Called once on the autoreset-merged
      state, so transition/reset can skip their own sensing pass entirely.
    info_fn(state) -> info: optional reset-info builder with the same pytree
      structure as transition_fn's info (e.g. ``single.info_from_state``). On an
      autoreset row the env step executes on the dead state before the reset
      state merges in, so its transition info is phantom data; when ``info_fn``
      is given, those rows are replaced with ``info_fn(merged_state)`` — the
      reset state's info, matching Gymnasium's NEXT_STEP reset-info contract.
      Without it, reset-row info is the phantom transition's (gate on
      ``record["autoreset"]``).

    Returns (new_vstate, obs, reward, done, terminated, truncated, info,
    episode_record) where episode_record is a dict with ``return``/``length``/
    ``mask`` for episodes that finished this step (mask False rows are padding,
    mirroring the ``_episode`` mask at ppo.py:124), plus ``autoreset``: True for
    rows where this step was the reset transition.
    """
    do_reset = vstate.pending_reset
    key, reset_key, step_key = jax.random.split(vstate.key, 3)

    stepped, reward, terminated, truncated, info = transition_fn(
        vstate.env, action, step_key
    )
    fresh = reset_fn(reset_key)
    merged = jax.tree.map(
        lambda f, s: jnp.where(
            jnp.reshape(do_reset, do_reset.shape + (1,) * (s.ndim - do_reset.ndim)), f, s
        ),
        fresh,
        stepped,
    )
    if refresh_fn is not None:
        merged, obs = refresh_fn(merged)
    else:
        obs = observe_fn(merged)

    if info_fn is not None:
        # Gymnasium reset-info contract: reset rows report the fresh state's
        # info (merged IS the fresh state on those rows), not the phantom
        # transition of the dead state.
        reset_info = info_fn(merged)
        info = jax.tree.map(
            lambda r, s: jnp.where(
                jnp.reshape(do_reset,
                            do_reset.shape + (1,) * (s.ndim - do_reset.ndim)),
                r, s),
            reset_info, info,
        )

    reward = jnp.where(do_reset, 0.0, reward).astype(reward.dtype)
    terminated = jnp.where(do_reset, False, terminated)
    truncated = jnp.where(do_reset, False, truncated)
    done = terminated | truncated

    # episode statistics: accumulate, emit at done, clear; reset step contributes 0
    stats = vstate.stats
    ep_return = stats.ep_return + reward.astype(stats.ep_return.dtype)
    ep_length = stats.ep_length + jnp.where(do_reset, 0, 1).astype(jnp.int32)
    record = {"return": ep_return, "length": ep_length, "mask": done,
              "autoreset": do_reset}
    new_stats = EpisodeStats(
        ep_return=jnp.where(done, 0.0, ep_return).astype(ep_return.dtype),
        ep_length=jnp.where(done, 0, ep_length),
    )

    new_vstate = VecState(
        env=merged,
        pending_reset=jnp.where(do_reset, False, done),
        stats=new_stats,
        key=key,
    )
    return new_vstate, obs, reward, done, terminated, truncated, info, record
