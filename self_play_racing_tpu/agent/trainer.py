"""Host-side training drivers: the Python loop around the jitted PPO update.

Mirrors the orchestration of /root/reference/agent/ppo.py:211-287 (buffers, per-update
anneals, logging, training-info JSON) and /root/reference/train.py entry points, with
all device work in a single jitted function per update.
"""
from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..configs import PPOConfig
from ..envs import single as senv
from ..envs import track as trk
from . import ppo


def make_single_env_hooks(env_cfg: senv.RacingConfig) -> ppo.EnvHooks:
    """EnvHooks over the single-agent env. aux is either the per-env TrackArrays or
    a dict {"track": TrackArrays, "speed_weight": scalar} (annealed variant)."""

    def track_of(aux):
        track = aux["track"] if isinstance(aux, dict) else aux
        return trk.resolve(track)  # PooledTracks gathers lazily inside the jit

    def sw_of(aux):
        return aux.get("speed_weight") if isinstance(aux, dict) else None

    def reset(aux, key):
        return senv.reset_state(env_cfg, track_of(aux))

    def transition(aux, state, action, key):
        return senv.transition(env_cfg, track_of(aux), state, action,
                               speed_weight=sw_of(aux))

    def observe(aux, state):
        return senv.observe(env_cfg, track_of(aux), state)

    def info(aux, state):
        return senv.info_from_state(env_cfg, track_of(aux), state)

    return ppo.EnvHooks(reset=reset, transition=transition, observe=observe,
                        info=info)


class DivergenceError(RuntimeError):
    """Training produced non-finite losses (see PPOTrainer.train(on_divergence=...))."""


class PPOTrainer:
    """Single-agent PPO trainer (reference PPO class equivalent, ppo.py:65-293).

    track: per-env TrackArrays (already gathered to [num_envs, ...]).
    """

    def __init__(self, cfg: PPOConfig, env_cfg: senv.RacingConfig, track: trk.TrackArrays,
                 hooks: Optional[ppo.EnvHooks] = None, aux=None):
        self.cfg = cfg
        self.env_cfg = env_cfg
        if aux is not None:
            self.aux = aux
        elif cfg.anneal_speed_weight:
            self.aux = {"track": track,
                        "speed_weight": jnp.float32(env_cfg.speed_weight)}
        else:
            self.aux = track
        self.hooks = hooks if hooks is not None else make_single_env_hooks(env_cfg)
        self.update_step = jax.jit(ppo.make_update_step(cfg, self.hooks, env_cfg.action_dim))
        key = jax.random.key(cfg.seed)
        self.runner = ppo.init_runner(
            key, cfg, self.hooks, self.aux, env_cfg.obs_dim, env_cfg.action_dim
        )
        self.training_info = {"steps": [], "rewards": []}
        self._host_update = 0  # host mirror of runner.train.update (see train())
        # optional domain randomization: fn(update:int) -> new per-env TrackArrays
        # (or None to keep the current pool); consulted before every update.
        # Pairs with on-device procedural generation (envs/procgen.py) so a resample
        # costs zero host round-trips.
        self.track_resampler = None
        self._reset_envs_jit = None
        self._mesh = None  # set by shard(); re-applied on aux swaps

    def shard(self, mesh):
        """Distribute the trainer over a device mesh: env-batch leaves over 'data',
        params replicated (or tensor-sharded over 'model' on a 2-D mesh). Pair with
        ``cfg.data_shards = mesh data-axis size`` so the minibatch shuffle stays
        shard-local (see ppo.run_ppo_update); ``data_shards=1`` (the
        reference-parity global shuffle) is also legal and merely pays the
        cross-shard gathers, but any other mismatched value raises — the
        shard-local layout is only collective-free when the shard count equals
        the data-parallel degree."""
        from ..parallel import mesh as pmesh

        n_data = mesh.shape[mesh.axis_names[0]]
        if self.cfg.data_shards > 1 and self.cfg.data_shards != n_data:
            raise ValueError(
                f"cfg.data_shards={self.cfg.data_shards} does not match the "
                f"mesh's data axis ({n_data}): the shard-local minibatch layout "
                f"only stays collective-free when the shard count equals the "
                f"data-parallel degree (use data_shards={n_data} or 1)"
            )
        self._mesh = mesh
        self.runner, self.aux = pmesh.shard_runner(
            self.runner, self.aux, mesh, self.cfg.num_envs)

    def _place_aux(self, aux):
        """Re-place freshly built aux leaves under the active mesh (if any)."""
        if self._mesh is None:
            return aux
        from ..parallel import mesh as pmesh

        return pmesh.shard_by_env_axis(aux, self._mesh, self.cfg.num_envs)

    @property
    def params(self):
        return self.runner.train.params

    @property
    def log_std(self):
        """log_std annealed for the upcoming update (what update_step will use)."""
        return ppo.anneal_fractions(self.cfg, self.runner.train.update,
                                    self.env_cfg.action_dim)[2]

    @property
    def buffer_log_std(self):
        """log_std as the reference's torch buffer holds it between updates: the
        value annealed for the last completed update (anneal(update-1)) — the
        in-loop anneal for update u runs at the top of update u itself
        (ppo.py:250-253, self_play_ppo.py:135-139). Snapshots and ``save`` capture
        this, not the next update's value. Before any update has run the buffer
        holds its registration value, zeros (ppo.py:28) — not anneal(0)."""
        if self._host_update == 0:
            return jnp.zeros((self.env_cfg.action_dim,), jnp.float32)
        u = self._host_update - 1
        return ppo.anneal_fractions(self.cfg, jnp.asarray(u, jnp.int32),
                                    self.env_cfg.action_dim)[2]

    def train(self, num_updates: Optional[int] = None, log_every: int = 1,
              on_update=None, on_divergence: str = "raise"):
        """Run the update loop; mirrors reference logging (ppo.py:270-280).

        ``on_divergence``: what to do when an update produces non-finite losses
        (the closest thing to failure detection this workload needs): ``"raise"``
        (default) aborts with a DivergenceError naming the update, ``"warn"``
        logs and continues. Periodic checkpoints (self-play) make raise+resume
        the recovery path.

        The metrics of update N are consumed (host transfer + logging + the
        ``_post_update``/``on_update`` hooks) only *after* update N+1 has been
        dispatched, so the device never idles waiting for the host: the per-update
        device->host metric read (5-50 ms over a TPU tunnel) overlaps the next
        update's execution. Hooks therefore observe ``self.runner`` one update
        ahead of the metrics they receive; state-dependent work (snapshots,
        checkpoints) keys off the host-side update counter in ``_pre_update``.
        """
        cfg = self.cfg
        total = cfg.num_updates if num_updates is None else num_updates
        self._host_update = int(self.runner.train.update)
        start_gstep = self._host_update * cfg.batch_size  # steps before this call
        t0 = time.perf_counter()

        def consume(m_dev):
            m = ppo.unpack_metrics(m_dev)
            update = int(m["update"]) + 1
            if not (np.isfinite(m["pg_loss"]) and np.isfinite(m["v_loss"])
                    and np.isfinite(m["mean_reward"])):
                msg = (f"non-finite losses at update {update}: "
                       f"pg={m['pg_loss']} v={m['v_loss']} r={m['mean_reward']}")
                if on_divergence == "raise":
                    raise DivergenceError(msg)
                print(f"WARNING: {msg}")
            # derived on host: the packed f32 copy loses exactness past 2^24 steps
            gstep = update * cfg.batch_size
            if int(m["episodes"]) > 0:
                self.training_info["steps"].append(gstep)
                self.training_info["rewards"].append(float(m["mean_ep_return"]))
                if update % log_every == 0:
                    dt = time.perf_counter() - t0
                    # rate over THIS call only — after a resume, gstep includes
                    # steps trained before t0
                    sps = (gstep - start_gstep) / dt
                    print(
                        f"Update {update}/{cfg.num_updates} | Step {gstep} | "
                        f"Episodes: {int(m['episodes'])} | "
                        f"Mean Reward: {float(m['mean_ep_return']):.2f} | "
                        f"Mean Length: {float(m['mean_ep_length']):.2f} | "
                        f"{sps:,.0f} steps/s"
                    )
            elif update % log_every == 0:
                print(f"Update {update}/{cfg.num_updates} | Step {gstep} | "
                      f"No episodes completed this rollout")
            self._post_update(m)
            if on_update is not None:
                on_update(self, m)

        pending = None
        for _ in range(total):
            self._pre_update()
            self.runner, metrics = self.update_step(self.runner, self.aux)
            self._host_update += 1
            if hasattr(metrics, "copy_to_host_async"):
                metrics.copy_to_host_async()
            if pending is not None:
                consume(pending)
            pending = metrics
        if pending is not None:
            consume(pending)
        return self.training_info

    def _pre_update(self):
        """Hook before each update (self-play: snapshot/opponent selection).

        Uses the host-side update counter (``self._host_update``) rather than
        reading ``runner.train.update`` back, which would stall the pipeline on
        the in-flight update.
        """
        if self.cfg.anneal_speed_weight and isinstance(self.aux, dict) \
                and "speed_weight" in self.aux:
            # the reference's *intended* schedule, 8 -> 14 (ppo.py:255-258)
            frac = max(0.0, 1.0 - self._host_update / self.cfg.num_updates)
            self.aux["speed_weight"] = jnp.float32(8.0 + (1.0 - frac) * 6.0)
        if self.track_resampler is not None:
            new_track = self.track_resampler(self._host_update)
            if new_track is not None:
                self.set_track(new_track)

    def set_track(self, track, reset: bool = True):
        """Swap the env geometry (e.g. an on-device resampled pool from
        envs/procgen.py) for all subsequent updates. Shapes must match the
        original track (same waypoint/segment padding) or the update re-compiles.

        ``reset`` re-initializes every env on the new geometry (state from the old
        track would be meaningless); in-flight episode statistics are discarded.
        """
        track = self._place_aux(track)
        if isinstance(self.aux, dict):
            self.aux = {**self.aux, "track": track}
        else:
            self.aux = track
        if reset:
            self.reset_envs()

    def reset_envs(self):
        """Re-reset all envs against the current aux, keeping learner state."""
        if self._reset_envs_jit is None:
            from ..envs import vector

            def _re(runner, aux):
                key, k_env, k_vec = jax.random.split(runner.key, 3)
                env_state = self.hooks.reset(aux, k_env)
                if self.hooks.refresh is not None:
                    env_state, obs = self.hooks.refresh(aux, env_state)
                else:
                    obs = self.hooks.observe(aux, env_state)
                return runner.replace(
                    vec=vector.init(env_state, self.cfg.num_envs, k_vec),
                    obs=obs.astype(jnp.float32),
                    done=jnp.zeros((self.cfg.num_envs,), bool),
                    key=key,
                )

            self._reset_envs_jit = jax.jit(_re)
        self.runner = self._reset_envs_jit(self.runner, self.aux)

    def _post_update(self, metrics):
        """Hook after each update (self-play: periodic full checkpoints)."""

    def save(self, path: str):
        """Save policy params + the buffer log_std (reference PPO.save, ppo.py:289-290
        saves the state_dict, whose log_std buffer holds the last update's value).
        Policies trained with ``normalize_obs`` also store the running observation
        statistics — without them the policy would act on un-normalized inputs."""
        from ..utils.checkpoint import _to_host

        flat, treedef = jax.tree.flatten(self.runner.train.params)
        extra = {}
        if self.cfg.normalize_obs:
            norm = self.runner.obs_norm
            mean, var, count = _to_host([norm.mean, norm.var, norm.count])
            extra = {"obs_mean": mean, "obs_var": var, "obs_count": count}
        host = _to_host(flat + [self.buffer_log_std])
        # _to_host's gathers are collectives every process must join; the
        # write itself is process-0-only (two concurrent savez truncations on
        # a shared filesystem would tear the final model file).
        if jax.process_index() == 0:
            np.savez(
                path,
                treedef=str(treedef),
                log_std=host[-1],
                **extra,
                **{f"p{i}": x for i, x in enumerate(host[:-1])},
            )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"trainer_save:{path}")

    def load(self, path: str):
        from ..evaluate import load_policy_bundle

        params, _, obs_norm = load_policy_bundle(path)
        runner = self.runner.replace(train=self.runner.train.replace(params=params))
        if obs_norm is not None:
            runner = runner.replace(obs_norm=obs_norm)
        self.runner = runner

    def save_training_info(self, path: str):
        if jax.process_index() != 0:  # mirror of every process' host log
            return
        with open(path, "w") as f:
            json.dump(self.training_info, f)
