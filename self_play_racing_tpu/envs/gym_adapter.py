"""Gymnasium-API adapters over the JAX engine.

Drop-in equivalents of the reference's env classes for users coming from
/root/reference/environment/racing_env.py:8 and multi_racing_env.py:8: same
constructor signatures (num_sensors, track_pool, track_id, track_width, ...), same
spaces, same (obs, reward, terminated, truncated, info) step contract — but the
dynamics run through the jitted batched engine (batch size 1 here). Useful for
API-compatible scripting, SB3-style baselines, and cross-checking; large-scale
training should use the functional batched API directly.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

try:
    import gymnasium as gym

    _GYM = True
except ImportError:  # pragma: no cover - gymnasium is available in CI
    _GYM = False

    class gym:  # type: ignore
        class Env:
            pass

        class Wrapper:
            pass

from . import multi as menv
from . import single as senv
from . import track as trk


def _pool_from(track_pool, track_id, track_width, dtype):
    """Replicates the reference Track pool/width selection (track.py:61-80)."""
    if track_pool is not None:
        if track_id is None:
            track_id = int(np.random.randint(0, len(track_pool)))
        control_points = track_pool[track_id]
        if isinstance(track_width, (list, tuple, np.ndarray)):
            track_width = track_width[track_id]
    else:
        control_points = trk.DEFAULT_CONTROL_POINTS
    if track_width is None:
        track_width = trk.DEFAULT_TRACK_WIDTH
    pool = trk.make_track_pool([control_points], [float(track_width)], dtype=dtype)
    return trk.gather_tracks(pool, [0])


class RacingEnv(gym.Env):
    """Single-agent adapter (racing_env.py:8-167 contract)."""

    metadata = {"render_modes": []}

    def __init__(self, num_sensors=7, track_pool=None, track_id=None, track_width=None,
                 speed_weight=8.0, dtype=jnp.float64):
        self.cfg = senv.RacingConfig(num_sensors=num_sensors, speed_weight=speed_weight)
        self.track = _pool_from(track_pool, track_id, track_width, dtype)
        self.speed_weight = speed_weight
        if _GYM:
            self.action_space = gym.spaces.Box(
                low=np.array([-1.0, 0.0]), high=np.array([1.0, 1.0]),
                shape=(2,), dtype=np.float32,
            )
            self.observation_space = gym.spaces.Box(
                low=np.float32(-1.0), high=np.float32(1.0),
                shape=(self.cfg.obs_dim,), dtype=np.float32,
            )
        self._step = jax.jit(
            lambda tr, s, a, sw: senv.step(self.cfg, tr, s, a, speed_weight=sw)
        )
        self._reset = jax.jit(lambda tr: senv.reset(self.cfg, tr))
        self.state = None

    def reset(self, seed=None, options=None):
        if _GYM:
            super().reset(seed=seed)
        self.state, obs = self._reset(self.track)
        return np.asarray(obs[0]), self._info_at_reset()

    def _info_at_reset(self):
        s = self.state.car
        return {
            "position": (float(s.x[0]), float(s.y[0])),
            "speed": 0.0, "progress": 0.0, "crashed": False, "finished": False,
        }

    def step(self, action):
        a = jnp.asarray(np.asarray(action, np.float64))[None, :]
        self.state, obs, rew, term, trunc, info = self._step(
            self.track, self.state, a, self.speed_weight
        )
        info_out = {
            "position": (float(info["x"][0]), float(info["y"][0])),
            "speed": float(info["speed"][0]),
            "progress": float(info["progress"][0]),
            "crashed": bool(info["crashed"][0]),
            "finished": bool(info["finished"][0]),
            "reward": float(rew[0]),
            "progress_delta": float(info["progress_delta"][0]),
        }
        return (np.asarray(obs[0]), float(rew[0]), bool(term[0]), bool(trunc[0]),
                info_out)


class MultiRacingEnv(gym.Env):
    """Multi-agent adapter (multi_racing_env.py:8-269 contract): Dict spaces keyed by
    agent-index strings, dones dict with ``__all__``."""

    def __init__(self, num_agents=2, num_sensors=11, track_pool=None, track_id=None,
                 track_width=None, dtype=jnp.float64):
        self.cfg = menv.MultiRacingConfig(num_agents=num_agents, num_sensors=num_sensors)
        self.track = _pool_from(track_pool, track_id, track_width, dtype)
        self.num_agents = num_agents
        if _GYM:
            self.action_space = gym.spaces.Dict({
                f"{i}": gym.spaces.Box(
                    low=np.array([-1.0, 0.0]), high=np.array([1.0, 1.0]),
                    shape=(2,), dtype=np.float32)
                for i in range(num_agents)
            })
            self.observation_space = gym.spaces.Dict({
                f"{i}": gym.spaces.Box(
                    low=np.float32(-1.0), high=np.float32(1.0),
                    shape=(self.cfg.obs_dim,), dtype=np.float32)
                for i in range(num_agents)
            })
        self._step = jax.jit(lambda tr, s, a: menv.step(self.cfg, tr, s, a))
        self._reset = jax.jit(
            lambda tr, pos: menv.reset(self.cfg, tr, position_idx=pos)
        )
        self.state = None

    def reset(self, seed=None, options=None):
        if _GYM:
            super().reset(seed=seed)
        order = list(range(self.num_agents))
        np.random.shuffle(order)  # same global-RNG usage as multi_racing_env.py:128
        pos = np.array([order.index(i) for i in range(self.num_agents)])
        self.state, obs = self._reset(self.track, pos[None, :])
        observations = {f"{i}": np.asarray(obs[0, i]) for i in range(self.num_agents)}
        infos = {f"{i}": self._agent_info_reset(i) for i in range(self.num_agents)}
        return observations, infos

    def _agent_info_reset(self, i):
        return {
            "position": (float(self.state.x[0, i]), float(self.state.y[0, i])),
            "speed": 0.0, "progress": 0.0, "crashed": False, "finished": False,
        }

    def step(self, actions):
        a = np.stack([np.asarray(actions[f"{i}"], np.float64)
                      for i in range(self.num_agents)])
        self.state, obs, rew, term, trunc, info = self._step(
            self.track, self.state, jnp.asarray(a)[None]
        )
        done_all = bool(term[0]) or bool(trunc[0])
        observations = {f"{i}": np.asarray(obs[0, i]) for i in range(self.num_agents)}
        rewards = {f"{i}": float(rew[0, i]) for i in range(self.num_agents)}
        infos = {}
        for i in range(self.num_agents):
            d = {
                "position": (float(info["x"][0, i]), float(info["y"][0, i])),
                "speed": float(info["speed"][0, i]),
                "progress": float(info["progress"][0, i]),
                "crashed": bool(info["crashed"][0, i]),
                "finished": bool(info["finished"][0, i]),
                "reward": rewards[f"{i}"],
            }
            if done_all:
                d["placement"] = int(info["placement"][0, i])
            infos[f"{i}"] = d
        dones = {f"{i}": bool(term[0]) for i in range(self.num_agents)}
        dones["__all__"] = done_all
        return observations, rewards, dones, bool(trunc[0]), infos


class SelfPlayWrapper(gym.Wrapper):
    """Single-agent view of the multi-agent adapter with an internal frozen opponent
    (reference wrappers.py:5-63 contract).

    ``set_opponent`` accepts:
      - ``None``: opponents sample uniformly from the action space
        (wrappers.py:31-32; with the multi env's (a+1)/2 throttle remap random
        opponents drive with throttle in [0.5, 1]),
      - a ``(params, log_std)`` pair (this framework's policy pytree): opponents
        sample Normal(mu, exp(log_std)) clamped to [-1, 1], like the reference's
        frozen-Agent path (wrappers.py:36-39),
      - any callable ``obs -> action`` (e.g. ``serve.Policy(...).act``).

    Opponents act on the observation stored from the *previous* step
    (last_obs_dict, wrappers.py:24-27,47). ``step`` returns the agent view with
    ``done = dones["__all__"]`` (wrappers.py:52). For training at scale use the
    functional ``envs.selfplay`` path — this class is the API-compat adapter.
    """

    def __init__(self, env: MultiRacingEnv, agent_id: int = 0):
        if _GYM:
            super().__init__(env)
        self.env = env
        self.agent_id = agent_id
        self._agent_key = str(agent_id)
        self.curr_opponent = None
        self.last_obs_dict = None
        self._rng = jax.random.key(0)
        if _GYM:
            self.action_space = env.action_space[self._agent_key]
            self.observation_space = env.observation_space[self._agent_key]

    def set_opponent(self, opponent):
        self.curr_opponent = opponent

    def _opponent_action(self, obs):
        opp = self.curr_opponent
        if opp is None:
            if _GYM:
                return self.action_space.sample()
            return np.random.uniform([-1.0, 0.0], [1.0, 1.0]).astype(np.float32)
        if callable(opp):
            return np.asarray(opp(obs), np.float32)
        params, log_std = opp
        self._rng, k = jax.random.split(self._rng)
        from ..models import actor_critic as net

        a, _, _ = net.sample_action(params, jnp.asarray(log_std),
                                    jnp.asarray(obs, jnp.float32)[None], k)
        return np.asarray(a[0])

    def reset(self, seed=None, options=None):
        obs, infos = self.env.reset(seed=seed, options=options)
        self.last_obs_dict = obs
        return obs[self._agent_key], infos[self._agent_key]

    def step(self, action):
        actions = {self._agent_key: np.asarray(action, np.float32)}
        for i in range(self.env.num_agents):
            k = f"{i}"
            if k != self._agent_key:
                actions[k] = self._opponent_action(self.last_obs_dict[k])
        obs, rewards, dones, truncated, infos = self.env.step(actions)
        self.last_obs_dict = obs
        return (obs[self._agent_key], rewards[self._agent_key], dones["__all__"],
                truncated, infos[self._agent_key])
