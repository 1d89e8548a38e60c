"""Snapshot-pool self-play PPO trainer.

Reproduces /root/reference/agent/self_play_ppo.py:8-186 on top of the jitted PPO core:
 - every ``snapshot_freq`` updates, freeze the current policy (params + the annealed
   log_std at snapshot time) into the opponent pool; evict the oldest beyond
   ``pool_size`` (self_play_ppo.py:113-122) — the pool is a stacked param pytree with a
   ring-buffer write head.
 - before every update, pick the rollout opponent uniformly from the pool
   (self_play_ppo.py:40-44): one index shared by all envs in parity mode (quirk #7) or
   an independent index per env (``cfg.opponent_per_env``, the intended generalization
   for large env batches).
 - the reference closes and rebuilds all vector envs each update (self_play_ppo.py:46-50),
   implicitly resetting them; ``cfg.reset_envs_each_update`` reproduces that inside the
   jitted update.
 - full training checkpoint every 10 updates — update counter, global step, agent +
   optimizer state, the entire pool, config, training curves (self_play_ppo.py:154-167)
   — with ``resume_from`` support.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..configs import PPOConfig
from ..envs import multi as menv
from ..envs import selfplay as sp
from ..envs import track as trk
from ..models import actor_critic as net
from ..utils import checkpoint as ckpt
from . import ppo
from .trainer import PPOTrainer


def make_selfplay_hooks(env_cfg: menv.MultiRacingConfig,
                        pool_size: int = 0) -> ppo.EnvHooks:
    """EnvHooks over the self-play view; aux = {"track": ..., "opp": ...}.

    ``pool_size`` > 0 adds a stats hook reporting per-slot [wins..., games...]
    of the learner against each pool opponent, measured from rollout episode
    outcomes (placement 1 = learner won) — the signal PFSP sampling feeds on.
    """

    def reset(aux, key):
        return sp.reset_state_deferred(env_cfg, trk.resolve(aux["track"]), key)

    def transition(aux, state, action, key):
        return sp.transition_deferred(env_cfg, trk.resolve(aux["track"]),
                                      aux["opp"], state, action, key)

    def observe(aux, state):
        return sp.observe(state)

    def refresh(aux, state):
        return sp.refresh(env_cfg, trk.resolve(aux["track"]), state)

    def info(aux, state):
        return sp.info0_from_state(env_cfg, trk.resolve(aux["track"]), state)

    def stats(aux, info, rec):
        opp = aux["opp"]
        mask = rec["mask"]  # episodes that ended this step (terminal info valid)
        idx = jnp.broadcast_to(opp["idx"], mask.shape).astype(jnp.int32)
        ended = mask & jnp.broadcast_to(opp["use_policy"], mask.shape)
        won = ended & (info["placement"] == 1)
        # One-hot masked sums, NOT segment_sum: the two [N] -> [P] scatter-adds
        # cost 72 us/step on a v5e (18.8 ms of the 189 ms A=2 update — trace
        # attribution in docs/DESIGN.md); the [N, P] compare+select reduce is
        # VPU-shaped and fuses to ~0. Bit-identical sums of 1.0s.
        onehot = idx[:, None] == jnp.arange(pool_size, dtype=jnp.int32)[None, :]
        # explicit f32 accumulator: the packed metric vector this tail rides is
        # f32, and weak literals would promote it to f64 under x64 parity runs
        wins = jnp.sum(onehot & won[:, None], axis=0, dtype=jnp.float32)
        games = jnp.sum(onehot & ended[:, None], axis=0, dtype=jnp.float32)
        return jnp.concatenate([wins, games])

    return ppo.EnvHooks(reset=reset, transition=transition, observe=observe,
                        refresh=refresh, info=info,
                        stats=stats if pool_size > 0 else None)


class SelfPlayTrainer(PPOTrainer):
    """SelfPlayPPO equivalent. ``track`` is per-env TrackArrays for the multi env."""

    def __init__(self, cfg: PPOConfig, env_cfg: menv.MultiRacingConfig,
                 track: trk.TrackArrays):
        if cfg.pool_size <= 0 or cfg.snapshot_freq <= 0:
            raise ValueError("self-play needs pool_size > 0 and snapshot_freq > 0")
        self.pool_size = cfg.pool_size
        self.snapshot_freq = cfg.snapshot_freq
        self.num_snapshots = 0  # total ever taken; write head = num_snapshots % P
        self._opp_rng = np.random.RandomState(cfg.seed)
        self.checkpoint_dir: Optional[str] = None
        self.checkpoint_every = 10  # reference interval (self_play_ppo.py:154)
        self._resumed_at_update = -1  # skip re-saving the checkpoint just loaded
        self._pool_count_by_update = {}  # update idx -> pool size used for it
        # learner-vs-slot outcome counters from rollout episodes (the PFSP
        # sampling signal); one update lagged by the metrics pipeline, zeroed
        # when a ring slot is overwritten
        self.pool_wins = np.zeros((cfg.pool_size,), np.float64)
        self.pool_games = np.zeros((cfg.pool_size,), np.float64)

        # stacked pool, zero-initialized; masked out via pool_count until filled
        proto = net.init_params(jax.random.key(0), env_cfg.obs_dim,
                                env_cfg.action_dim, hidden=cfg.hidden)
        pool_params = jax.tree.map(
            lambda x: jnp.zeros((cfg.pool_size,) + x.shape, x.dtype), proto
        )
        pool_log_std = jnp.zeros((cfg.pool_size, env_cfg.action_dim), jnp.float32)
        self.pool = {"params": pool_params, "log_std": pool_log_std}
        if cfg.normalize_obs:
            # each snapshot freezes the observation statistics it was trained on;
            # opponents must act on that scale (envs.selfplay.opponent_actions)
            self.pool["norm_mean"] = jnp.zeros((cfg.pool_size, env_cfg.obs_dim),
                                               jnp.float32)
            self.pool["norm_var"] = jnp.ones((cfg.pool_size, env_cfg.obs_dim),
                                             jnp.float32)

        idx_shape = (cfg.num_envs,) if cfg.opponent_per_env else ()
        aux = {
            "track": track,
            "opp": {
                "params": pool_params,
                "log_std": pool_log_std,
                "norm_mean": self.pool.get("norm_mean"),
                "norm_var": self.pool.get("norm_var"),
                "idx": jnp.zeros(idx_shape, jnp.int32),
                "use_policy": jnp.zeros(idx_shape, bool),
            },
        }
        super().__init__(cfg, env_cfg, track,
                         hooks=make_selfplay_hooks(env_cfg, cfg.pool_size),
                         aux=aux)
        self.training_info["opponent_pool_size"] = []
        self.training_info["pool_win_rate"] = []

    def shard(self, mesh):
        """Also place the snapshot pool (replicated): on a multi-process mesh,
        eager pool updates (snapshot_agent's .at[slot].set against the sharded
        learner params) need both operands to be global arrays."""
        super().shard(mesh)
        from ..parallel import mesh as pmesh

        self.pool = pmesh.replicate_tree(self.pool, mesh)

    # ---- pool management -------------------------------------------------------

    @property
    def pool_count(self) -> int:
        return min(self.num_snapshots, self.pool_size)

    def snapshot_agent(self):
        """Freeze current params + log_std into the ring slot (self_play_ppo.py:31-38).

        The reference snapshots at the top of update u, BEFORE that update's log_std
        anneal runs (self_play_ppo.py:114-139), so the frozen buffer holds the value
        annealed for update u-1 — ``buffer_log_std``, not ``log_std``.
        """
        slot = self.num_snapshots % self.pool_size
        params = self.runner.train.params
        log_std = self.buffer_log_std
        new_pool = {
            "params": jax.tree.map(
                lambda p, x: p.at[slot].set(x.astype(p.dtype)),
                self.pool["params"], params,
            ),
            "log_std": self.pool["log_std"].at[slot].set(log_std),
        }
        if "norm_mean" in self.pool:
            norm = self.runner.obs_norm
            new_pool["norm_mean"] = self.pool["norm_mean"].at[slot].set(norm.mean)
            new_pool["norm_var"] = self.pool["norm_var"].at[slot].set(norm.var)
        self.pool = new_pool
        self.num_snapshots += 1
        # the slot now holds a different opponent: its outcome history is void
        self.pool_wins[slot] = 0.0
        self.pool_games[slot] = 0.0

    def opponent_weights(self) -> np.ndarray:
        """PFSP sampling distribution over the live pool slots: hard opponents
        (low learner win rate) get more play, weight (1-p)^pfsp_power with a
        Laplace-smoothed p = (wins+1)/(games+2)."""
        count = self.pool_count
        p_win = ((self.pool_wins[:count] + 1.0)
                 / (self.pool_games[:count] + 2.0))
        w = (1.0 - p_win) ** self.cfg.pfsp_power
        return w / w.sum()

    def select_opponent(self):
        """Choice over the live pool — uniform (self_play_ppo.py:40-44) or
        PFSP-weighted (cfg.opponent_sampling); empty pool -> random-action
        opponent."""
        count = self.pool_count
        cfg = self.cfg
        shape = (cfg.num_envs,) if cfg.opponent_per_env else ()
        if count == 0:
            idx = np.zeros(shape, np.int32)
            use = np.zeros(shape, bool)
        elif cfg.opponent_sampling == "pfsp":
            idx = self._opp_rng.choice(
                count, size=shape, p=self.opponent_weights()).astype(np.int32)
            use = np.ones(shape, bool)
        else:
            idx = self._opp_rng.randint(0, count, size=shape).astype(np.int32)
            use = np.ones(shape, bool)
        self.aux["opp"] = self._place_aux({
            "params": self.pool["params"],
            "log_std": self.pool["log_std"],
            "norm_mean": self.pool.get("norm_mean"),
            "norm_var": self.pool.get("norm_var"),
            "idx": jnp.asarray(idx),
            "use_policy": jnp.asarray(use),
        })

    # ---- trainer hooks ---------------------------------------------------------

    def _pre_update(self):
        super()._pre_update()  # track resampling (speed-weight guard is a no-op here)
        # host-side update counter: reading runner.train.update back would stall
        # the lagged-metrics pipeline on the in-flight update (trainer.train()).
        update = self._host_update
        # strict <: a checkpoint written at a snapshot update already contains that
        # snapshot (num_snapshots * freq == update), so resuming from it must not
        # take a duplicate (the reference resumes at update+1, self_play_ppo.py:98)
        if update > 0 and update % self.snapshot_freq == 0 and \
                self.num_snapshots * self.snapshot_freq < update:
            self.snapshot_agent()
        self.select_opponent()
        # the periodic full checkpoint lives here (not _post_update) so it captures
        # exactly the post-update-N state before update N+1 is dispatched; the
        # update we just resumed from is skipped (its file is the one we loaded)
        if self.checkpoint_dir and update > 0 \
                and update % self.checkpoint_every == 0 \
                and update != self._resumed_at_update:
            self.save_checkpoint(
                os.path.join(self.checkpoint_dir, f"checkpoint_update_{update}")
            )
        self._pool_count_by_update[update] = self.pool_count

    def _post_update(self, metrics):
        update = int(metrics["update"])
        count = self._pool_count_by_update.pop(update, self.pool_count)
        extra = metrics.get("_extra")
        if extra is not None and extra.size == 2 * self.pool_size:
            self.pool_wins += extra[: self.pool_size].astype(np.float64)
            self.pool_games += extra[self.pool_size:].astype(np.float64)
        if int(metrics["episodes"]) > 0:
            self.training_info["opponent_pool_size"].append(count)
            games = self.pool_games.sum()
            self.training_info["pool_win_rate"].append(
                float(self.pool_wins.sum() / games) if games > 0 else float("nan"))

    # ---- checkpoint / resume (self_play_ppo.py:52-68, 154-167) ----------------

    def _ckpt_tree(self):
        tree = {"train": self.runner.train, "pool": self.pool}
        if self.cfg.normalize_obs:
            # the learner's running observation statistics are trained state; a
            # resume without them would feed the policy mis-scaled inputs until
            # they re-converge. Conditional so pre-existing (non-normalized)
            # checkpoints keep their layout.
            tree["obs_norm"] = self.runner.obs_norm
        return tree

    def save_checkpoint(self, path: str):
        meta = {
            "num_snapshots": self.num_snapshots,
            # exact Python-int step count derived from the update index (never
            # wraps — authoritative for arbitrarily long runs; a device i32
            # would wrap past ~2.1B steps)
            "global_step": self._host_update * self.cfg.batch_size,
            "config": dataclasses.asdict(
                dataclasses.replace(self.cfg)
            ),
            "training_info": self.training_info,
            "pool_wins": self.pool_wins.tolist(),
            "pool_games": self.pool_games.tolist(),
        }
        ckpt.save_pytree(path, self._ckpt_tree(), meta)
        print(f"Saved full checkpoint to {path}")

    def load_checkpoint(self, path: str):
        # format_version opens the npz a second time, but np.load is lazy — it
        # reads one scalar entry, not the archive — so probing before the real
        # load costs a zip-directory read, nothing more.
        if ckpt.format_version(path) == 0:
            # round-≤4 index-addressed checkpoint: its TrainState carried a dead
            # device global_step as its final leaf — load through the historic
            # layout, then drop the leaf (agent.ppo.legacy_v0_template).
            tpl = self._ckpt_tree()
            tpl["train"] = ppo.legacy_v0_template(tpl["train"])
            tree, meta = ckpt.load_pytree(path, tpl)
            tree["train"] = ppo.from_legacy_v0(tree["train"])
        else:
            tree, meta = ckpt.load_pytree(path, self._ckpt_tree())
        self.runner = self.runner.replace(train=tree["train"])
        if "obs_norm" in tree:
            self.runner = self.runner.replace(obs_norm=tree["obs_norm"])
        self.pool = tree["pool"]
        self.num_snapshots = int(meta["num_snapshots"])
        self._host_update = int(self.runner.train.update)
        self.training_info = meta.get(
            "training_info", {"steps": [], "rewards": [], "opponent_pool_size": []}
        )
        self.training_info.setdefault("pool_win_rate", [])
        if "pool_wins" in meta:  # PFSP outcome counters (older ckpts lack them)
            self.pool_wins = np.asarray(meta["pool_wins"], np.float64)
            self.pool_games = np.asarray(meta["pool_games"], np.float64)
        print(f"Loaded checkpoint from {path} "
              f"(update {int(self.runner.train.update)}, pool {self.pool_count})")

    def load_torch_checkpoint(self, path: str):
        """Resume from a *reference* full training checkpoint
        (``models/checkpoint_update_{u}.pth``, self_play_ppo.py:154-167): agent
        params, Adam moments, the opponent pool, update/step counters, and
        training curves all transfer. The migration path for users with
        in-flight reference runs.

        Index mapping: the reference's 0-based ``update`` u means u+1 completed
        updates, so our counters resume at u+1; its oldest->newest pool list maps
        onto our ring slots via the global snapshot index (u // snapshot_freq).
        Weight matrices transpose (torch (out, in) -> ours (in, out)); Adam
        moments are lr-independent, so they transfer exactly (the reference's lr
        anneal is re-derived from the update index, as is log_std).
        """
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        params, _buffer_log_std = net.params_from_torch_state_dict(
            ckpt["agent_state_dict"])
        tpl_leaves, treedef = jax.tree.flatten(self.runner.train.params)
        leaves = jax.tree.leaves(params)
        if len(leaves) != len(tpl_leaves) or any(
                a.shape != b.shape for a, b in zip(leaves, tpl_leaves)):
            raise ValueError(
                f"{path}: agent architecture does not match cfg.hidden="
                f"{self.cfg.hidden}")
        params = jax.tree.map(lambda x, t: x.astype(t.dtype),
                              jax.tree.unflatten(treedef, leaves),
                              self.runner.train.params)

        # Adam moments: torch state is keyed by parameters() position, which for
        # the reference Agent (actor_mu tower then critic tower, log_std is a
        # buffer) matches our leaf order exactly; weights transpose like params.
        opt_sd = ckpt["optimizer_state_dict"]
        order = opt_sd["param_groups"][0]["params"]
        state = opt_sd["state"]

        def moment(i, field, tpl):
            if i not in state:  # optimizer never stepped
                return jnp.zeros_like(tpl)
            m = jnp.asarray(np.asarray(state[i][field].detach()), tpl.dtype)
            return m.T if m.ndim == 2 else m

        mu = jax.tree.unflatten(treedef, [
            moment(i, "exp_avg", t) for i, t in zip(order, tpl_leaves)])
        nu = jax.tree.unflatten(treedef, [
            moment(i, "exp_avg_sq", t) for i, t in zip(order, tpl_leaves)])
        count = jnp.asarray(
            int(state[order[0]]["step"]) if order and order[0] in state else 0,
            jnp.int32)
        opt_state = tuple(
            s._replace(mu=mu, nu=nu, count=count)
            if hasattr(s, "mu") and hasattr(s, "nu") else s
            for s in self.runner.train.opt_state
        )

        completed = int(ckpt["update"]) + 1  # reference updates are 0-based
        train = self.runner.train.replace(
            params=params, opt_state=opt_state,
            update=jnp.asarray(completed, jnp.int32),
        )
        self.runner = self.runner.replace(train=train)
        self._host_update = completed

        # opponent pool: oldest -> newest list onto ring slots by global index
        pool_sds = ckpt.get("opponent_pool", [])
        if len(pool_sds) > self.pool_size:
            raise ValueError(
                f"{path}: pool has {len(pool_sds)} snapshots > pool_size="
                f"{self.pool_size}")
        self.num_snapshots = int(ckpt["update"]) // self.snapshot_freq
        if self.num_snapshots < len(pool_sds):  # quirky checkpoint; trust the list
            self.num_snapshots = len(pool_sds)
        first_global = self.num_snapshots - len(pool_sds)
        pool = self.pool
        for k, sd in enumerate(pool_sds):
            opp_params, opp_log_std = net.params_from_torch_state_dict(sd)
            slot = (first_global + k) % self.pool_size
            pool = {
                **pool,
                "params": jax.tree.map(
                    lambda p, x: p.at[slot].set(x.astype(p.dtype)),
                    pool["params"], opp_params),
                "log_std": pool["log_std"].at[slot].set(
                    opp_log_std.astype(pool["log_std"].dtype)),
            }
            # reference agents act on raw observations; identity stats reproduce
            # that if this trainer normalizes its own observations
        self.pool = pool
        self._resumed_at_update = completed
        self.training_info = ckpt.get(
            "training_info", {"steps": [], "rewards": [], "opponent_pool_size": []})
        # reference checkpoints carry only steps/rewards/opponent_pool_size;
        # ensure the keys OUR _post_update appends to exist (same normalization
        # as the native-checkpoint path above)
        self.training_info.setdefault("opponent_pool_size", [])
        self.training_info.setdefault("pool_win_rate", [])
        print(f"Loaded reference torch checkpoint {path} "
              f"(resuming at update {completed}, pool {self.pool_count})")

    def train(self, num_updates: Optional[int] = None, log_every: int = 1,
              on_update=None, resume_from: Optional[str] = None,
              checkpoint_dir: Optional[str] = None, checkpoint_every: int = 10):
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        if resume_from:
            if resume_from.endswith((".pth", ".pt")):  # reference torch checkpoint
                self.load_torch_checkpoint(resume_from)
            else:
                self.load_checkpoint(resume_from)
                self._resumed_at_update = int(self.runner.train.update)
            if num_updates is None:
                num_updates = self.cfg.num_updates - int(self.runner.train.update)
        info = super().train(num_updates=num_updates, log_every=log_every,
                             on_update=on_update)
        # _pre_update only runs before a *next* update, so a final update that
        # lands on the interval boundary checkpoints here (reference saves at end
        # of update u, self_play_ppo.py:154-167)
        if self.checkpoint_dir and self._host_update > 0 \
                and self._host_update % self.checkpoint_every == 0 \
                and self._host_update != self._resumed_at_update:
            self.save_checkpoint(os.path.join(
                self.checkpoint_dir, f"checkpoint_update_{self._host_update}"))
        return info
