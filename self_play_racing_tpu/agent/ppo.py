"""From-scratch PPO, compiled to a single fused XLA program per update.

Reproduces the reference trainer's semantics (/root/reference/agent/ppo.py:65-293) with
a TPU-native structure: the entire update — 2048-step rollout (lax.scan over time, env
batch vectorized and shardable over a device mesh), GAE (reverse scan), and the
10-epoch/16-minibatch clipped update with KL early stopping — is one jitted function.
The reference's per-step GPU<->CPU round trip (ppo.py:114) and serial SyncVectorEnv
loop disappear entirely; env state lives on device for the whole run.

Semantics preserved exactly (SURVEY §7 quirks):
 - approx_kl = mean(old_logprob - new_logprob) (sign-flipped estimator, ppo.py:179)
   and triggering it aborts *all* remaining minibatches and epochs of the update,
   including the triggering minibatch's own gradient step (ppo.py:178-182) —
   implemented as a masked scan carry, preserving data-dependent early exit inside jit.
 - per-minibatch advantage normalization with torch's *unbiased* std (ppo.py:186-187).
 - clipped value loss 0.5*max(unclipped, clipped) (ppo.py:194-198).
 - entropy bonus is a constant w.r.t. params (log_std is an annealed buffer).
 - lr anneal frac*lr -> 0 and log_std anneal start->end by update index
   (ppo.py:245-253); grad-norm clip before Adam (ppo.py:208), Adam eps 1e-5 (ppo.py:83).
 - episode statistics harvested exactly like RecordEpisodeStatistics + the _episode
   mask (ppo.py:88,123-130).
"""
from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import PPOConfig
from ..envs import normalize as obsnorm
from ..envs import vector
from ..models import actor_critic as net
from ..ops.gae import compute_gae
from ..ops.prng import epoch_permutation


class EnvHooks(NamedTuple):
    """Functional env interface consumed by the trainer.

    aux is an arbitrary pytree of env data (track geometry, opponent params, ...)
    passed through the jit boundary as a runtime argument — never closed over, so
    megabytes of geometry don't get baked into the executable as constants.
    """

    reset: Callable      # (aux, key) -> env_state  (batched)
    transition: Callable  # (aux, env_state, action, key) -> (state, rew, term, trunc, info)
    observe: Callable    # (aux, env_state) -> obs [N, obs_dim] float32
    # optional: (aux, env_state) -> (env_state, obs). For envs that cache obs in
    # their state (self-play), called once per vector step on the merged state so
    # transition/reset skip their own sensing pass (see envs.vector.step).
    refresh: Callable = None
    # optional: (aux, env_state) -> info with transition-info structure; lets
    # vector.step substitute the reset state's info on autoreset rows
    # (Gymnasium NEXT_STEP reset-info contract — see envs.vector.step).
    info: Callable = None
    # optional: (aux, info, episode_record) -> [S] f32, computed per rollout step,
    # summed over the rollout, and APPENDED to the packed metric vector — the host
    # reads it from unpack_metrics()["_extra"] (self-play uses this for per-slot
    # opponent win/game counts feeding PFSP sampling).
    stats: Callable = None


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    update: jnp.ndarray       # i32 scalar: update index (drives anneals).
    # Wrapping is unreachable here: 2^31-1 UPDATES = 70 trillion env steps at
    # the default batch; the 8B-step endurance run was 7,629 updates. Every
    # authoritative step count — metrics, logs, checkpoint meta — derives from
    # ``update`` as exact Python/f32 arithmetic (update * batch_size). A
    # device-side i32 global_step (would wrap past ~2.1B env steps; VERDICT r3
    # #8) was carried as a dead leaf through round 4 and removed in round 5 —
    # legacy checkpoints load through ``legacy_v0_template`` below.


@struct.dataclass
class _TrainStateV0:
    """Round-≤4 checkpoint layout of TrainState: same fields plus the dead
    device ``global_step`` leaf. Only used as a load template for legacy
    (index-addressed, format-v0) checkpoint files, whose positional matching
    requires the exact historic leaf order (params, opt_state, update,
    global_step)."""

    params: Any
    opt_state: Any
    update: jnp.ndarray
    global_step: jnp.ndarray


def legacy_v0_template(train: TrainState) -> _TrainStateV0:
    """Wrap a current TrainState as the round-≤4 layout for legacy loads."""
    return _TrainStateV0(params=train.params, opt_state=train.opt_state,
                         update=train.update,
                         global_step=jnp.zeros((), jnp.int32))


def from_legacy_v0(v0: _TrainStateV0) -> TrainState:
    """Drop the dead global_step leaf of a legacy-loaded TrainState."""
    return TrainState(params=v0.params, opt_state=v0.opt_state, update=v0.update)


@struct.dataclass
class RunnerState:
    train: TrainState
    vec: vector.VecState
    obs: jnp.ndarray    # [N, obs_dim] float32 — next_obs in reference terms
    done: jnp.ndarray   # [N] bool — next_done
    key: jnp.ndarray
    obs_norm: obsnorm.ObsNormState


def make_optimizer(cfg: PPOConfig):
    """clip-by-global-norm -> Adam(eps=1e-5); LR is applied manually (traced scalar)
    so the reference's per-update anneal stays inside jit."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(eps=1e-5),
    )


def init_train_state(key, cfg: PPOConfig, obs_dim: int, action_dim: int) -> TrainState:
    params = net.init_params(key, obs_dim, action_dim, hidden=cfg.hidden)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        update=jnp.zeros((), jnp.int32),
    )


def init_runner(key, cfg: PPOConfig, hooks: EnvHooks, aux, obs_dim: int,
                action_dim: int) -> RunnerState:
    # four children: init / env-reset / vector / the carried rollout chain.
    # The carry must be its own child — jax.random.split is prefix-stable
    # (split(k, 2)[i] == split(k, 3)[i]), so carrying the PARENT key would make
    # the first rollout's splits replay k_net/k_env and correlate action noise
    # with the weight-init and reset streams.
    k_net, k_env, k_vec, k_carry = jax.random.split(key, 4)
    train = init_train_state(k_net, cfg, obs_dim, action_dim)

    # The initial reset+observe must run under jit: executed eagerly op-by-op,
    # the observation pipeline materializes its full [envs, rays, segments]
    # intermediates in HBM — RESOURCE_EXHAUSTED at very large env counts —
    # where the fused program needs only the [envs, rays] result.
    def _reset_observe(aux, k):
        env_state = hooks.reset(aux, k)
        if hooks.refresh is not None:
            return hooks.refresh(aux, env_state)
        return env_state, hooks.observe(aux, env_state)

    env_state, obs = jax.jit(_reset_observe)(aux, k_env)
    vec_state = vector.init(env_state, cfg.num_envs, k_vec)
    return RunnerState(
        train=train,
        vec=vec_state,
        obs=obs.astype(jnp.float32),
        done=jnp.zeros((cfg.num_envs,), bool),
        key=k_carry,
        obs_norm=obsnorm.init(obs_dim),
    )


def anneal_fractions(cfg: PPOConfig, update, action_dim: int = 2):
    """frac = max(0, 1 - update/NUM_UPDATES); lr and log_std follow (ppo.py:245-253).

    log_std is broadcast to [action_dim], matching the reference's per-dim buffer
    (ppo.py:28) — the summed entropy therefore counts every action dimension.
    """
    frac = jnp.maximum(0.0, 1.0 - update.astype(jnp.float32) / cfg.num_updates)
    lr = frac * cfg.learning_rate
    log_std = frac * cfg.log_std_start + (1.0 - frac) * cfg.log_std_end
    return frac, lr, jnp.full((action_dim,), log_std, jnp.float32)


class Batch(NamedTuple):
    obs: jnp.ndarray
    actions: jnp.ndarray
    logprobs: jnp.ndarray
    advantages: jnp.ndarray
    returns: jnp.ndarray
    values: jnp.ndarray


def _ppo_loss(params, log_std, mb: Batch, cfg: PPOConfig):
    new_lp, entropy, new_v = net.evaluate_action(params, log_std, mb.obs, mb.actions)
    log_ratio = new_lp - mb.logprobs
    ratio = jnp.exp(log_ratio)
    approx_kl = jnp.mean(-log_ratio)  # mean(old - new), sign per ppo.py:179

    adv = mb.advantages
    adv = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)  # unbiased std (torch default)

    pg1 = -adv * ratio
    pg2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_coef, 1.0 + cfg.clip_coef)
    pg_loss = jnp.maximum(pg1, pg2).mean()

    v_clip = mb.values + jnp.clip(new_v - mb.values, -cfg.clip_coef, cfg.clip_coef)
    v_loss = 0.5 * jnp.maximum(
        (new_v - mb.returns) ** 2, (v_clip - mb.returns) ** 2
    ).mean()

    e_loss = -entropy.mean()
    loss = pg_loss + cfg.ent_coef * e_loss + cfg.vf_coef * v_loss
    stats = {
        "loss": loss, "pg_loss": pg_loss, "v_loss": v_loss,
        "entropy": -e_loss, "approx_kl": approx_kl,
        "clip_frac": jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32)),
    }
    return loss, stats


def run_ppo_update(cfg: PPOConfig, opt, params, opt_state, log_std, lr,
                   flat: Batch, key):
    """Epochs x minibatches of clipped updates with KL early stop (ppo.py:156-209).

    ``flat`` is the flattened [batch_size, ...] rollout. Once approx_kl exceeds the
    target, the triggering minibatch is not applied and the update EXITS — a
    ``lax.while_loop`` over the flattened (epoch, minibatch) sequence, so the
    remaining minibatches are genuinely skipped, exactly like the reference's
    ``return``. (An earlier masked-scan version computed all E*M minibatches and
    discarded the post-stop ones — identical parameters, but real training often
    stops a third of the way in, wasting most of the update phase's FLOPs.)

    Returns (params, opt_state, stopped, stats); ``stats`` are [epochs, minibatches]
    f32 arrays, zero-filled past the exit point, with ``stats["computed"]`` marking
    executed minibatches and ``stats["applied"]`` the applied ones.

    ``cfg.data_shards`` = D > 1 selects the shard-local layout for data-parallel
    meshes: the flat batch is rearranged to [D, B/D, ...] with the shard axis first
    (a local reshape when num_envs is sharded over 'data' in D equal pieces), each
    shard permutes its own samples with an independent per-epoch PRP, and every
    minibatch takes an equal mb/D stratum from each shard via a batched local
    gather. The global-permutation path (D=1, reference parity) instead gathers
    blocks from every device's shard — XLA emits one all-gather per Batch field
    per minibatch (measured: 6 x E x M collectives per update on an 8-device
    mesh, scripts/inspect_minibatch_hlo.py). With D = mesh data-axis size only
    the scalar/gradient all-reduces remain (asserted in tests/test_parallel.py).
    Minibatch loss/KL semantics are unchanged: means still run over the full
    minibatch (global reductions), only sample->minibatch assignment differs
    (stratified per shard instead of one global shuffle).
    """
    b = cfg.batch_size
    d_shards = cfg.data_shards
    # Per-shard env count (the whole batch when D=1). Flat index is t*num_envs + n.
    n_sub = cfg.num_envs // d_shards
    # shuffle granularity: permute contiguous blocks (DMA-friendly gather) when the
    # shapes allow it, else fall back to per-sample permutation. A block must divide
    # the per-shard env count or it would span consecutive timesteps of the same
    # envs — temporally correlated samples locked into the same minibatch every
    # epoch (and, for D>1, straddle a shard boundary). gcd keeps blocks within one
    # timestep (64 at the 4096-env scale configs, num_envs at the reference's 16).
    b_sub = b // d_shards                       # samples per shard
    mb_sub = cfg.minibatch_size // d_shards     # stratum per shard per minibatch
    block = math.gcd(cfg.shuffle_block_size, n_sub)
    if block <= 1 or b_sub % block != 0 or mb_sub % block != 0:
        block = 1
    n_units = b_sub // block
    mb_units = mb_sub // block
    if d_shards == 1:
        blocked = Batch(*(x.reshape((1, n_units, block) + x.shape[1:]) for x in flat))
    else:
        # [T*N, ...] -> [T, D, n_sub, ...] -> [D, T, n_sub, ...] -> [D, units, block, ...]
        # The D axis carries the 'data' sharding, so the swap + reshapes move no
        # data across devices and the per-shard gather below stays local.
        blocked = Batch(*(
            x.reshape((cfg.num_steps, d_shards, n_sub) + x.shape[1:])
             .swapaxes(0, 1)
             .reshape((d_shards, n_units, block) + x.shape[1:])
            for x in flat
        ))

    e_total = cfg.update_epochs
    m_total = cfg.num_minibatches
    ekeys = jax.random.split(key, e_total)
    if d_shards == 1:
        # [E, 1, n_units]; key stream identical to the pre-data_shards layout.
        perms = jax.vmap(lambda k: epoch_permutation(k, n_units))(ekeys)[:, None]
    else:
        dkeys = jax.vmap(lambda k: jax.random.split(k, d_shards))(ekeys)  # [E, D]
        perms = jax.vmap(jax.vmap(lambda k: epoch_permutation(k, n_units)))(dkeys)

    stats0 = {
        name: jnp.zeros((e_total, m_total), jnp.float32)
        for name in ("loss", "pg_loss", "v_loss", "entropy", "approx_kl",
                     "clip_frac", "applied", "computed")
    }

    def cond_fn(carry):
        _, _, i, stop, _ = carry
        return (i < e_total * m_total) & ~stop

    def body_fn(carry):
        params, opt_state, i, stop, stats = carry
        e = i // m_total
        m = i % m_total
        # Gather the minibatch directly from the (unshuffled) blocked batch: same
        # composition as materializing the shuffled epoch, but the gather fuses
        # into its consumers (~25% faster than a full-batch shuffled copy on v5e).
        # The take is batched over the shard axis (one local gather per shard).
        idx = jax.lax.dynamic_slice(
            perms, (e, jnp.zeros_like(e), m * mb_units),
            (1, d_shards, mb_units))[0]
        mb = Batch(*(
            jax.vmap(lambda xd, id_: jnp.take(xd, id_, axis=0))(x, idx)
               .reshape((cfg.minibatch_size,) + x.shape[3:])
            for x in blocked
        ))
        (loss, st), grads = jax.value_and_grad(_ppo_loss, has_aux=True)(
            params, log_std, mb, cfg
        )
        # KL early-stop: the triggering minibatch is itself not applied
        # (ppo.py:178-182); the loop exits before any later one runs.
        trig = st["approx_kl"] > cfg.kl_target
        updates, new_opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda o, n: jnp.where(trig, o, n), params, new_params)
        opt_state = jax.tree.map(
            lambda o, n: jnp.where(trig, o, n), opt_state, new_opt_state
        )
        st["applied"] = (~trig).astype(jnp.float32)
        st["computed"] = jnp.float32(1.0)
        stats = {k: stats[k].at[e, m].set(jnp.asarray(v, jnp.float32))
                 for k, v in st.items()}
        return (params, opt_state, i + 1, trig, stats)

    params, opt_state, _, stop, stats = jax.lax.while_loop(
        cond_fn, body_fn,
        (params, opt_state, jnp.zeros((), jnp.int32), jnp.zeros((), bool), stats0),
    )
    return params, opt_state, stop, stats


def _last_computed(ustats, name):
    """Value of ``name`` at the last executed minibatch (run_ppo_update zero-fills
    slots after the KL exit; ``computed`` marks the executed ones)."""
    n = jnp.sum(ustats["computed"]).astype(jnp.int32)
    flat = ustats[name].reshape(-1)
    return flat[jnp.maximum(n - 1, 0)]


def make_update_step(cfg: PPOConfig, hooks: EnvHooks, action_dim: int = 2):
    """Returns update_step(runner, aux) -> (runner, metrics): one full PPO update."""
    opt = make_optimizer(cfg)

    def rollout_phase(runner: RunnerState, aux, log_std):
        params = runner.train.params

        def one_step(carry, _):
            vec, obs, done, key, norm = carry
            key, akey = jax.random.split(key)
            if cfg.normalize_obs:
                norm = obsnorm.update(norm, obs)
                policy_obs = obsnorm.apply(norm, obs)
            else:
                policy_obs = obs
            action, logprob, value = net.sample_action(params, log_std, policy_obs, akey)
            vec, next_obs, reward, next_done, term, trunc, info, rec = vector.step(
                vec, action,
                lambda s, a, k: hooks.transition(aux, s, a, k),
                lambda s: hooks.observe(aux, s),
                lambda k: hooks.reset(aux, k),
                refresh_fn=(None if hooks.refresh is None
                            else (lambda s: hooks.refresh(aux, s))),
                info_fn=(None if hooks.info is None
                         else (lambda s: hooks.info(aux, s))),
            )
            out = Batch(
                obs=policy_obs, actions=action, logprobs=logprob,
                advantages=jnp.zeros_like(logprob),  # filled by GAE
                returns=jnp.zeros_like(logprob),
                values=value,
            )
            step_stats = {
                "reward": reward.astype(jnp.float32),
                "done_entering": done,
                "ep_return_sum": jnp.sum(jnp.where(rec["mask"], rec["return"], 0.0)),
                "ep_length_sum": jnp.sum(jnp.where(rec["mask"], rec["length"], 0)),
                "ep_count": jnp.sum(rec["mask"].astype(jnp.int32)),
            }
            if hooks.stats is not None:
                step_stats["extra"] = hooks.stats(aux, info, rec)
            return (vec, next_obs.astype(jnp.float32), next_done, key, norm), (
                out, step_stats)

        (vec, next_obs, next_done, key, norm), (traj, sstats) = jax.lax.scan(
            one_step,
            (runner.vec, runner.obs, runner.done, runner.key, runner.obs_norm),
            None,
            length=cfg.num_steps,
        )
        return vec, next_obs, next_done, key, norm, traj, sstats

    def update_step(runner: RunnerState, aux):
        frac, lr, log_std = anneal_fractions(cfg, runner.train.update, action_dim)

        if cfg.reset_envs_each_update:
            # reference self-play rebuilds all envs every update (self_play_ppo.py:46-50)
            # but never refreshes train()'s next_obs/next_done tensors
            # (self_play_ppo.py:90-93): rollout step 0 acts on the PREVIOUS rollout's
            # final observation (and GAE sees its stale done flag) while stepping the
            # freshly reset envs. We reproduce that: env state resets, runner.obs /
            # runner.done stay stale. Opponents still see the fresh reset obs — the
            # wrapper's reset() stores last_obs_dict (wrappers.py:24-27) — which the
            # refresh pass writes into the env state's obs cache.
            key, k_env, k_run = jax.random.split(runner.key, 3)
            env_state = hooks.reset(aux, k_env)
            if hooks.refresh is not None:
                env_state, _ = hooks.refresh(aux, env_state)
            runner = runner.replace(
                vec=vector.init(env_state, cfg.num_envs, k_run),
                key=key,
            )

        vec, next_obs, next_done, key, norm, traj, sstats = rollout_phase(
            runner, aux, log_std.astype(jnp.float32)
        )

        rewards = sstats["reward"]                  # [T, N]
        traj_done = sstats["done_entering"]         # [T, N] done entering each step
        values = traj.values
        next_policy_obs = (obsnorm.apply(norm, next_obs) if cfg.normalize_obs
                           else next_obs)
        next_value = net.critic_value(runner.train.params, next_policy_obs)
        advantages, returns = compute_gae(
            rewards, traj_done, values, next_value, next_done,
            cfg.gamma, cfg.gae_lambda,
        )
        batch = traj._replace(advantages=advantages, returns=returns)

        key, ukey = jax.random.split(key)
        flat = Batch(*(x.reshape((cfg.batch_size,) + x.shape[2:]) for x in batch))
        params, opt_state, stopped, ustats = run_ppo_update(
            cfg, opt, runner.train.params, runner.train.opt_state, log_std, lr, flat, ukey
        )

        train = TrainState(
            params=params,
            opt_state=opt_state,
            update=runner.train.update + 1,
        )
        new_runner = RunnerState(train=train, vec=vec, obs=next_obs, done=next_done,
                                 key=key, obs_norm=norm)

        ep_count = jnp.sum(sstats["ep_count"])
        metrics = {
            "update": runner.train.update,
            # derived from the (never-wrapping) update index: exact to 2^24
            # steps in this f32 packing, and the host re-derives the exact
            # integer as update * batch_size anyway
            "global_step": (runner.train.update + 1).astype(jnp.float32)
                           * cfg.batch_size,
            "lr": lr,
            "log_std": log_std[0],
            "episodes": ep_count,
            "mean_ep_return": jnp.where(
                ep_count > 0, jnp.sum(sstats["ep_return_sum"]) / ep_count, jnp.nan
            ),
            "mean_ep_length": jnp.where(
                ep_count > 0,
                jnp.sum(sstats["ep_length_sum"]).astype(jnp.float32) / ep_count,
                jnp.nan,
            ),
            "kl_stopped": stopped,
            "minibatches_applied": jnp.sum(ustats["applied"]),
            # last COMPUTED minibatch (the triggering one when KL-stopped; the
            # final one otherwise) — post-exit slots are zero-filled
            "approx_kl": _last_computed(ustats, "approx_kl"),
            "pg_loss": _last_computed(ustats, "pg_loss"),
            "v_loss": _last_computed(ustats, "v_loss"),
            "entropy": _last_computed(ustats, "entropy"),
            "mean_reward": rewards.mean(),
        }
        # pack every metric into ONE f32 vector: the host reads a single buffer per
        # update instead of ~17 scalars x per-transfer tunnel latency
        assert tuple(metrics.keys()) == METRIC_NAMES
        packed = jnp.stack([jnp.asarray(v, jnp.float32) for v in metrics.values()])
        if hooks.stats is not None:
            # hook extras ride the same single transfer, appended after the
            # named metrics (host side: unpack_metrics()["_extra"])
            packed = jnp.concatenate([packed, sstats["extra"].sum(axis=0)])
        return new_runner, packed

    return update_step


METRIC_NAMES = (
    "update", "global_step", "lr", "log_std", "episodes", "mean_ep_return",
    "mean_ep_length", "kl_stopped", "minibatches_applied", "approx_kl",
    "pg_loss", "v_loss", "entropy", "mean_reward",
)


def unpack_metrics(packed):
    """Packed f32 metric vector -> {name: float} with one host transfer.
    Anything beyond the named metrics (an EnvHooks.stats tail) lands under
    ``"_extra"`` as an array."""
    vals = __import__("numpy").asarray(packed)
    out = dict(zip(METRIC_NAMES, vals))
    if len(vals) > len(METRIC_NAMES):
        out["_extra"] = vals[len(METRIC_NAMES):]
    return out
