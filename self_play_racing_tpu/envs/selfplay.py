"""Self-play view: agent-0 perspective of the multi-agent env, opponents driven by a
frozen snapshot policy — fully on-device.

Replaces /root/reference/environment/wrappers.py:5-63. The reference runs the frozen
opponent one observation at a time through torch with a host round-trip per env per
step (wrappers.py:36-39, batch size 1 — the dominant inefficiency of its rollout); here
opponent inference is one batched MLP apply over the whole env batch, and opponent
*selection* is per-env: actions are computed under every pool member (the pool is tiny)
and gathered by index — no weight-gather traffic.

Semantics preserved:
 - opponent acts on the observation from the *previous* step (the wrapper's
   last_obs_dict, wrappers.py:24-27,35,47) — we store all agents' current obs in the
   state so each step senses exactly once.
 - empty pool -> opponent action ~ Uniform(action_space) = Box([-1,0],[1,1]).sample()
   (wrappers.py:31-32); with the multi env's (a+1)/2 throttle remap this means random
   opponents drive with throttle in [0.5, 1].
 - pool opponent: sample from Normal(mu, exp(log_std)) and clamp to [-1,1], using the
   log_std captured at snapshot time (the reference deep-copies the buffer,
   self_play_ppo.py:31-38).
 - returned ``terminated`` is the episode-level ``__all__`` flag, like the wrapper's
   ``done`` (wrappers.py:52).

The opponent specification travels in the trainer's ``aux`` pytree:
  ``opp = {"params": stacked pool pytree [P, ...], "log_std": [P, act_dim],
           "idx": [N] int32 per-env pool index, "use_policy": [N] bool}``
plus, when the trainer normalizes observations, ``"norm_mean"``/``"norm_var"``
([P, obs_dim]): each frozen opponent applies the observation statistics captured
at its own snapshot time — the policy was trained on that scale.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import actor_critic as net
from . import multi
from .track import TrackArrays


@struct.dataclass
class SelfPlayState:
    inner: multi.MultiState
    obs_all: jnp.ndarray  # [N, A, obs_dim] float32 — obs of the *current* state


def reset_state(cfg: multi.MultiRacingConfig, track: TrackArrays, key) -> SelfPlayState:
    inner = multi.reset_state(cfg, track, key)
    return SelfPlayState(inner=inner, obs_all=multi.observe(cfg, track, inner))


def opponent_actions(cfg: multi.MultiRacingConfig, opp, opp_obs, key):
    """Batched frozen-opponent actions for one opponent seat.

    opp_obs: [N, obs_dim] (previous-step observations). Computes actions under every
    pool member — [P] tiny-MLP applies — then gathers per-env by ``opp["idx"]``; falls
    back to a uniform action-space sample where ``use_policy`` is False.
    """
    n = opp_obs.shape[0]
    k_noise, k_rand = jax.random.split(key)
    idx_arr = jnp.asarray(opp["idx"])

    if idx_arr.ndim == 0:
        # Per-update shared opponent (reference parity mode, quirk #7): gather
        # that ONE member's params/stats (a tiny pytree dynamic-index) and run a
        # single batched apply — the all-P path below costs P x the MLP + P x
        # the normalize pass for the same result when every env faces the same
        # opponent (measured ~9% of the 4096-env self-play rollout at P=5).
        one = lambda p: jax.lax.dynamic_index_in_dim(p, idx_arr, 0,
                                                     keepdims=False)
        member_obs = opp_obs
        if opp.get("norm_mean") is not None:
            from . import normalize as obsnorm

            member_obs = obsnorm.apply(
                obsnorm.ObsNormState(one(opp["norm_mean"]),
                                     one(opp["norm_var"]), None), opp_obs)
        mu = net.actor_mu(jax.tree.map(one, opp["params"]), member_obs)  # [N,2]
        std = jnp.exp(one(opp["log_std"]))                               # [2]
        noise = jax.random.normal(k_noise, mu.shape, mu.dtype)
        policy_act = jnp.clip(mu + std * noise, -1.0, 1.0)               # [N,2]
    else:
        if opp.get("norm_mean") is not None:
            # per-member normalization with the stats frozen at snapshot time
            from . import normalize as obsnorm

            member_obs = jax.vmap(
                lambda m, v: obsnorm.apply(obsnorm.ObsNormState(m, v, None), opp_obs)
            )(opp["norm_mean"], opp["norm_var"])                              # [P,N,D]
            mus = jax.vmap(net.actor_mu)(opp["params"], member_obs)           # [P,N,2]
        else:
            mus = jax.vmap(net.actor_mu, in_axes=(0, None))(opp["params"],
                                                            opp_obs)          # [P,N,2]
        stds = jnp.exp(opp["log_std"])[:, None, :]                           # [P,1,2]
        noise = jax.random.normal(k_noise, mus.shape[1:], mus.dtype)
        acts = jnp.clip(mus + stds * noise, -1.0, 1.0)                       # [P,N,2]
        idx = jnp.broadcast_to(idx_arr, (n,))
        policy_act = jnp.take_along_axis(acts, idx[None, :, None], axis=0)[0]  # [N,2]

    low = jnp.asarray([-1.0, 0.0], policy_act.dtype)
    high = jnp.asarray([1.0, 1.0], policy_act.dtype)
    rand_act = jax.random.uniform(k_rand, (n, 2), policy_act.dtype,
                                  minval=low, maxval=high)
    use = jnp.broadcast_to(jnp.asarray(opp["use_policy"]), (n,))[:, None]
    return jnp.where(use, policy_act, rand_act)


def opponent_actions_all_seats(cfg: multi.MultiRacingConfig, opp, obs_seats, key):
    """Frozen-opponent actions for ALL opponent seats in one batched apply.

    obs_seats: [N, seats, obs_dim] previous-step observations of seats 1..A-1.
    Returns [N, seats, 2]. Each env's single pool opponent drives all of its
    seats (opp["idx"] is per-env), so the seat axis folds into the batch axis:
    one MLP apply over [N*seats] replaces the per-seat Python loop, which at
    A=8 emitted 7 separate tiny batched-GEMM + gather fusions per step
    (measured ~3.5 ms/step at 4096 envs on a v5e — the dominant rollout cost).
    Identical math per seat; only the noise stream differs from the per-seat
    form (one key for the flat batch instead of a key per seat).
    """
    n, seats, d = obs_seats.shape
    flat_opp = dict(opp)
    for field in ("idx", "use_policy"):
        v = jnp.asarray(opp[field])
        if v.ndim != 0:
            # row-major reshape is env-major: (env0 seat0), (env0 seat1), ...
            flat_opp[field] = jnp.repeat(v, seats)
    acts = opponent_actions(cfg, flat_opp, obs_seats.reshape(n * seats, d), key)
    return acts.reshape(n, seats, 2)


def transition(cfg: multi.MultiRacingConfig, track: TrackArrays, opp,
               state: SelfPlayState, action0, key):
    """Agent-0 step: opponents act from their previous-step obs, the combined action
    steps the multi env, and the new state's observations are computed once."""
    opp_acts = opponent_actions_all_seats(cfg, opp, state.obs_all[:, 1:], key)
    actions = jnp.concatenate(
        [action0.astype(jnp.float32)[:, None], opp_acts], axis=1)  # [N, A, 2]

    inner, rewards, terminated, truncated, info = multi.transition(
        cfg, track, state.inner, actions
    )
    obs_all = multi.observe(cfg, track, inner)
    new_state = SelfPlayState(inner=inner, obs_all=obs_all)

    done_all = terminated | truncated  # wrapper returns __all__ as its done
    info0 = {k: v[:, 0] for k, v in info.items()}
    return new_state, rewards[:, 0], done_all, truncated, info0


def observe(state: SelfPlayState) -> jnp.ndarray:
    return state.obs_all[:, 0]


# ---- deferred-observe variants (the trainer hot path) ---------------------------
#
# ``transition`` + ``reset_state`` above each run a full multi.observe so the state
# is always self-contained — but under vector.step's NEXT_STEP autoreset, reset_fn
# executes every step, so the eager pair senses the track TWICE per env per step
# (once for the stepped state, once for the fresh reset state that mostly gets
# discarded). The deferred variants leave ``obs_all`` stale and let ``refresh``
# compute it exactly once per step on the *merged* state. Trajectories are
# identical (verified in tests/test_selfplay_parity.py); only the duplicated
# sensing disappears.

def reset_state_deferred(cfg: multi.MultiRacingConfig, track: TrackArrays,
                         key) -> SelfPlayState:
    inner = multi.reset_state(cfg, track, key)
    n = inner.x.shape[0]
    return SelfPlayState(
        inner=inner,
        obs_all=jnp.zeros((n, cfg.num_agents, cfg.obs_dim), jnp.float32),
    )


def transition_deferred(cfg: multi.MultiRacingConfig, track: TrackArrays, opp,
                        state: SelfPlayState, action0, key):
    """Like ``transition`` but skips the observe pass; pair with ``refresh``."""
    opp_acts = opponent_actions_all_seats(cfg, opp, state.obs_all[:, 1:], key)
    actions = jnp.concatenate(
        [action0.astype(jnp.float32)[:, None], opp_acts], axis=1)  # [N, A, 2]

    inner, rewards, terminated, truncated, info = multi.transition(
        cfg, track, state.inner, actions
    )
    new_state = SelfPlayState(inner=inner, obs_all=state.obs_all)  # stale until refresh

    done_all = terminated | truncated
    info0 = {k: v[:, 0] for k, v in info.items()}
    return new_state, rewards[:, 0], done_all, truncated, info0


def info0_from_state(cfg: multi.MultiRacingConfig, track: TrackArrays,
                     state: SelfPlayState):
    """Agent-0 view of ``multi.info_from_state`` (the reset-info contract)."""
    info = multi.info_from_state(cfg, track, state.inner)
    return {k: v[:, 0] for k, v in info.items()}


def refresh(cfg: multi.MultiRacingConfig, track: TrackArrays,
            state: SelfPlayState):
    """One observe pass over the (possibly autoreset-merged) state; returns the
    refreshed state and agent-0's observation."""
    obs_all = multi.observe(cfg, track, state.inner)
    return state.replace(obs_all=obs_all), obs_all[:, 0]
