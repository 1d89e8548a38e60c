"""Evaluation harness: batched episode rollouts + aggregation.

Reproduces the reference eval protocol (/root/reference/evaluate.py,
/root/reference/utils/metrics.py) with a TPU-native structure: instead of rolling
40 tracks x 5 runs one fresh env at a time (evaluate.py:22-36), every (track, run)
combination becomes one row of a single env batch and the whole grid is one jitted
rollout with done-latching.

Per-episode metrics match utils/metrics.py:39-183:
 - total_reward: sum of rewards until done (inclusive)
 - steps: steps taken until done (or the horizon cap: 2000 single / 3000 multi)
 - progress / finished / crashed / speed: from the final step's info
 - total_distance: sum of |pos_t - pos_{t-1}| from the second step on (the reference's
   prev_pos starts as None so the first step's motion is not counted)
 - policies *sample* actions like the reference eval (metrics.py:52), with a
   deterministic (tanh-mu) option matching SB3's deterministic=True path

Aggregation matches evaluate.py:39-64: success/crash rates over all episodes, avg_*
over successful episodes only, steps-per-progress over episodes with progress > 0.01.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..envs import multi as menv
from ..envs import single as senv
from ..envs import track as trk
from ..models import actor_critic as net


def _policy_action(params, log_std, obs, key, deterministic, obs_norm=None):
    if obs_norm is not None:
        from ..envs import normalize as obsnorm

        obs = obsnorm.apply(obs_norm, obs)
    if deterministic:
        return net.deterministic_action(params, obs)
    action, _, _ = net.sample_action(params, log_std, obs, key)
    return action


@functools.lru_cache(maxsize=None)
def _rollout_single_jit(env_cfg: senv.RacingConfig, max_steps: int,
                        deterministic: bool):
    """One jitted rollout program per (env_cfg, horizon, mode) — reused across
    models so evaluating N policies compiles once, not N times. The track (and
    params / optional obs_norm) are arguments, never closure constants."""

    def run(params, log_std, track, key, obs_norm):
        state, obs = senv.reset(env_cfg, track)
        n = obs.shape[0]
        f32 = jnp.float32

        def body(carry, key):
            state, obs, active, acc = carry
            action = _policy_action(params, log_std, obs.astype(f32), key,
                                    deterministic, obs_norm)
            nstate, nobs, rew, term, trunc, info = senv.step(env_cfg, track, state, action)
            done = term | trunc
            step_dist = jnp.sqrt(
                (info["x"] - state.car.x) ** 2 + (info["y"] - state.car.y) ** 2
            )
            first_step = acc["steps"] == 0
            acc = {
                "total_reward": acc["total_reward"] + jnp.where(active, rew, 0.0),
                "steps": acc["steps"] + jnp.where(active, 1, 0),
                "total_distance": acc["total_distance"]
                + jnp.where(active & ~first_step, step_dist, 0.0),
                "progress": jnp.where(active, info["progress"], acc["progress"]),
                "finished": jnp.where(active, info["finished"], acc["finished"]),
                "crashed": jnp.where(active, info["crashed"], acc["crashed"]),
                "speed": jnp.where(active, info["speed"], acc["speed"]),
            }
            active = active & ~done
            # frozen state once inactive so nothing drifts after the episode ends
            nstate = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, active.shape + (1,) * (new.ndim - 1)), new, old
                ),
                nstate, state,
            )
            nobs = jnp.where(active[:, None], nobs, obs)
            return (nstate, nobs, active, acc), None

        dtype = state.car.x.dtype
        acc0 = {
            "total_reward": jnp.zeros((n,), dtype),
            "steps": jnp.zeros((n,), jnp.int32),
            "total_distance": jnp.zeros((n,), dtype),
            "progress": jnp.zeros((n,), dtype),
            "finished": jnp.zeros((n,), bool),
            "crashed": jnp.zeros((n,), bool),
            "speed": jnp.zeros((n,), dtype),
        }
        keys = jax.random.split(key, max_steps)
        (state, obs, active, acc), _ = jax.lax.scan(
            body, (state, obs, jnp.ones((n,), bool), acc0), keys
        )
        acc["distance_per_step"] = jnp.where(
            acc["steps"] > 1, acc["total_distance"] / acc["steps"], 0.0
        )
        return acc

    return jax.jit(run)


def rollout_single(params, log_std, env_cfg: senv.RacingConfig, track: trk.TrackArrays,
                   key, max_steps: int = 2000, deterministic: bool = False,
                   obs_norm=None):
    """Latched episode metrics for a batch of single-agent envs. Returns a dict of
    [N] arrays (total_reward, steps, progress, finished, crashed, speed,
    total_distance, distance_per_step)."""
    return _rollout_single_jit(env_cfg, max_steps, deterministic)(
        params, log_std, track, key, obs_norm)


@functools.lru_cache(maxsize=None)
def _rollout_multi_jit(env_cfg: menv.MultiRacingConfig, max_steps: int,
                       deterministic: bool, per_seat: bool = False):
    """Jitted device scan of rollout_multi, one program per (env_cfg, horizon,
    mode), reused across models; track / params / obs_norm are arguments.

    ``per_seat``: params/log_std/obs_norm carry a leading seat axis (one policy
    per car — tournament matches); obs_norm must then be a stacked ObsNormState
    (identity rows for un-normalized policies), never None.
    """
    a = env_cfg.num_agents
    f32 = jnp.float32

    def run(params, log_std, track, key, obs_norm):
        n = track.wp_x.shape[0]
        k_reset, k_run = jax.random.split(key)
        state, obs = menv.reset(env_cfg, track, key=k_reset)

        def body(carry, key):
            state, obs, active, acc = carry
            if per_seat:
                action = jax.vmap(
                    lambda p, ls, o, k, nrm: _policy_action(
                        p, ls, o, k, deterministic, nrm),
                    in_axes=(0, 0, 1, 0, 0), out_axes=1,
                )(params, log_std, obs.astype(f32), jax.random.split(key, a),
                  obs_norm)
            else:
                flat_obs = obs.reshape((n * a, -1)).astype(f32)
                action = _policy_action(params, log_std, flat_obs, key,
                                        deterministic, obs_norm)
                action = action.reshape((n, a, -1))
            nstate, nobs, rew, term, trunc, info = menv.step(env_cfg, track, state, action)
            done = term | trunc
            step_dist = jnp.sqrt((info["x"] - state.x) ** 2 + (info["y"] - state.y) ** 2)
            first_step = acc["steps"] == 0
            act2 = active[:, None]
            acc = {
                "total_reward": acc["total_reward"] + jnp.where(act2, rew, 0.0),
                "steps": acc["steps"] + jnp.where(active, 1, 0),
                "total_distance": acc["total_distance"]
                + jnp.where(act2 & ~first_step[:, None], step_dist, 0.0),
                "progress": jnp.where(act2, info["progress"], acc["progress"]),
                "finished": jnp.where(act2, info["finished"], acc["finished"]),
                "crashed": jnp.where(act2, info["crashed"], acc["crashed"]),
                "speed": jnp.where(act2, info["speed"], acc["speed"]),
                "placement": jnp.where(act2, info["placement"], acc["placement"]),
            }
            active = active & ~done
            nstate = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, active.shape + (1,) * (new.ndim - 1)), new, old
                ),
                nstate, state,
            )
            nobs = jnp.where(active[:, None, None], nobs, obs)
            return (nstate, nobs, active, acc), None

        dtype = state.x.dtype
        acc0 = {
            "total_reward": jnp.zeros((n, a), dtype),
            "steps": jnp.zeros((n,), jnp.int32),
            "total_distance": jnp.zeros((n, a), dtype),
            "progress": jnp.zeros((n, a), dtype),
            "finished": jnp.zeros((n, a), bool),
            "crashed": jnp.zeros((n, a), bool),
            "speed": jnp.zeros((n, a), dtype),
            "placement": jnp.zeros((n, a), jnp.int32),
        }
        keys = jax.random.split(k_run, max_steps)
        (_, _, _, acc), _ = jax.lax.scan(
            body, (state, obs, jnp.ones((n,), bool), acc0), keys
        )
        return acc

    return jax.jit(run)


def rollout_multi(params, log_std, env_cfg: menv.MultiRacingConfig,
                  track: trk.TrackArrays, key, max_steps: int = 3000,
                  deterministic: bool = False, obs_norm=None):
    """Shared-policy multi-car rollout (utils/metrics.py:80-150): all cars driven
    by the same agent; per-episode stats come from the first finished car, else
    car 0. The device scan is jitted with the track as an argument (CLAUDE.md
    rule); only the finished-car selection below runs on host."""
    n = track.wp_x.shape[0]
    acc = _rollout_multi_jit(env_cfg, max_steps, deterministic)(
        params, log_std, track, key, obs_norm)
    # chosen car: first finished car, else car 0 (utils/metrics.py:138-150);
    # argmax over the seat axis = first True, and 0 when none finished
    fin = np.asarray(acc["finished"])
    chosen = fin.argmax(axis=1)
    sel = lambda x: np.asarray(x)[np.arange(n), chosen]
    out = {k: sel(v) for k, v in acc.items() if k != "steps"}
    out["steps"] = np.asarray(acc["steps"])
    out["distance_per_step"] = np.where(
        out["steps"] > 1, out["total_distance"] / out["steps"], 0.0
    )
    return out


def rollout_match(params_stack, log_std_stack, obs_norm_stack,
                  env_cfg: menv.MultiRacingConfig, track: trk.TrackArrays, key,
                  max_steps: int = 3000, deterministic: bool = False):
    """Head-to-head match rollout: one policy PER SEAT (tournament play, beyond
    the reference's shared-policy multi eval). Stacked inputs have a leading
    ``num_agents`` axis; ``obs_norm_stack`` is a stacked ObsNormState (identity
    rows for policies trained without normalization). Returns the raw per-seat
    accumulator ([envs, agents] arrays): final placement (1 = winner, 0 = episode
    never ended inside ``max_steps``), finished, crashed, progress, total_reward,
    speed, plus per-env steps."""
    acc = _rollout_multi_jit(env_cfg, max_steps, deterministic, per_seat=True)(
        params_stack, log_std_stack, track, key, obs_norm_stack)
    return {k: np.asarray(v) for k, v in acc.items()}


def aggregate(episodes: dict) -> dict:
    """evaluate.py:39-64 aggregation over a dict of per-episode arrays."""
    total = len(episodes["steps"])
    finished = np.asarray(episodes["finished"], bool)
    crashed = np.asarray(episodes["crashed"], bool)
    progress = np.asarray(episodes["progress"], float)
    steps = np.asarray(episodes["steps"], float)
    succ = finished

    def avg(key):
        vals = np.asarray(episodes[key], float)
        return float(np.mean(vals[succ])) if succ.any() else 0.0

    eff_mask = progress > 0.01
    steps_per_progress = (
        float(np.mean(steps[eff_mask] / progress[eff_mask])) if eff_mask.any() else 0.0
    )
    return {
        "num_episodes": int(total),
        "num_successful": int(succ.sum()),
        "success_rate": float(succ.sum() / total),
        "crash_rate": float(crashed.sum() / total),
        "avg_steps": float(np.mean(steps[succ])) if succ.any() else 0.0,
        "avg_reward": avg("total_reward"),
        "avg_progress": avg("progress"),
        "avg_speed": avg("speed"),
        "avg_distance": avg("total_distance"),
        "avg_steps_per_progress": steps_per_progress,
    }


def build_eval_grid(num_tracks: int = 40, num_runs: int = 5, seed: int = 42,
                    dtype=jnp.float32):
    """The reference eval grid (evaluate.py:176-182): ``num_tracks`` procedural tracks
    (global RNG seeded per gen_tracks quirk) x ``num_runs`` widths drawn as
    RandomState(seed+i).randint(4,10) *indexed by run, not track* (evaluate.py:30,181).

    Returns (TrackArrays of num_tracks*num_runs rows, track_ids, run_ids).
    """
    np.random.seed(seed)
    cps = trk.gen_tracks(num_tracks=num_tracks, seed=seed)
    widths = [np.random.RandomState(seed + i).randint(4, 10) for i in range(num_tracks)]
    combo_cps, combo_widths, track_ids, run_ids = [], [], [], []
    for t in range(num_tracks):
        for r in range(num_runs):
            combo_cps.append(cps[t])
            combo_widths.append(float(widths[r]))
            track_ids.append(t)
            run_ids.append(r)
    pool = trk.make_track_pool(combo_cps, combo_widths, dtype=dtype)
    return pool, np.array(track_ids), np.array(run_ids)
