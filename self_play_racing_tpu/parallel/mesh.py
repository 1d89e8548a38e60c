"""Mesh + sharding layout for multi-chip / multi-host training.

The reference has no distributed backend at all (SURVEY §5: its only parallelism is a
serial SyncVectorEnv loop and SubprocVecEnv pipes). The TPU-native layout is pure data
parallelism over the env batch — the natural axis for this workload (the model is a
64-unit MLP; there is nothing to tensor-shard):

 - 1-D mesh ``('data',)`` over all chips (all hosts included via
   ``jax.distributed.initialize``)
 - env state, per-env track geometry, rollout buffers, observations: sharded on the
   leading num_envs axis (``P('data')``)
 - policy params, optimizer state, opponent pool: replicated (``P()``)
 - gradients/minibatch statistics all-reduce over ICI automatically (XLA inserts the
   psums from the sharding propagation; no hand-written collectives needed)

Leaves are classified by their leading axis: anything whose dim0 == num_envs is
env-batch data, everything else replicates. This keeps the whole PPO update step —
rollout scan, GAE, minibatched updates — a single pjit-style program.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (no-op on a single host if nothing is configured)."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(devices=None, axis: str = "data", model_parallel: int = 1) -> Mesh:
    """1-D data mesh, or a 2-D ('data', 'model') mesh when model_parallel > 1.

    The 'model' axis tensor-shards the policy/value towers (useful for the wide
    configurable towers; the reference's 64-unit MLP needs none). Env-batch leaves
    always shard over 'data' only.
    """
    devices = jax.devices() if devices is None else devices
    devices = np.asarray(devices)
    if model_parallel <= 1:
        return Mesh(devices, (axis,))
    if devices.size % model_parallel != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by model_parallel={model_parallel}"
        )
    return Mesh(devices.reshape(-1, model_parallel), (axis, "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf of a pytree fully replicated over the mesh (multi-host
    safe): the public form of the placement trainers need for aux state that
    must be a global array (e.g. the self-play snapshot pool)."""
    return jax.tree.map(lambda x: _put(x, replicated(mesh)), tree)


def _put(x, sharding):
    """Place a globally known value under a sharding, multi-host safe.

    On a single-process mesh this is a plain device_put. When the mesh spans
    processes, every process holds the same full value (the framework keeps track
    pools / params / state construction deterministic), so each process materializes
    the shards it addresses via make_array_from_callback. Typed PRNG keys are routed
    through their raw data.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    is_key = hasattr(x, "dtype") and jax.numpy.issubdtype(x.dtype, jax.dtypes.prng_key)
    if is_key:
        impl = jax.random.key_impl(x)
        raw = np.asarray(jax.random.key_data(x))
        placed = jax.make_array_from_callback(raw.shape, sharding, lambda idx: raw[idx])
        return jax.random.wrap_key_data(placed, impl=impl)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sharding, lambda idx: xnp[idx])


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel placement for the MLP param pytree (Megatron pattern).

    Each tower ``[(w, b), ...]`` alternates column-parallel / row-parallel layers:
    even hidden layers shard their *output* features over 'model' (w: P(None,'model'),
    b: P('model')); the following layer shards its *input* features (w: P('model',None),
    b: P()) so XLA reduces the partial products with one psum over 'model'. Output
    heads and any dim not divisible by the axis size stay replicated. On a 1-D mesh
    everything replicates.

    Returns a pytree of NamedShardings congruent with ``params``.
    """
    if "model" not in mesh.axis_names:
        return jax.tree.map(lambda x: replicated(mesh), params)
    m = mesh.shape["model"]

    def tower(layers):
        out = []
        prev_out_sharded = False
        for i, (w, b) in enumerate(layers):
            is_head = i == len(layers) - 1
            out_sharded = (not is_head) and (not prev_out_sharded) \
                and w.shape[1] % m == 0
            w_spec = P("model" if prev_out_sharded else None,
                       "model" if out_sharded else None)
            b_spec = P("model") if out_sharded else P()
            out.append((NamedSharding(mesh, w_spec), NamedSharding(mesh, b_spec)))
            prev_out_sharded = out_sharded
        return out

    return {k: tower(v) for k, v in params.items()}


def shard_by_env_axis(tree, mesh: Mesh, num_envs: int):
    """Place every leaf: dim0 == num_envs -> shard on 'data', else replicate.

    PooledTracks subtrees are placed by their documented invariant (pool
    replicated, ids sharded) rather than by shape, so the geometry pool stays
    replicated even when num_tracks happens to equal num_envs."""
    from ..envs.track import GroupedPooledTracks, PooledTracks, TiledPooledTracks

    def place(x):
        if isinstance(x, TiledPooledTracks):
            # no per-env leaves at all: the pool replicates and the tiled env
            # axis is born inside the partitioned program (broadcast+reshape),
            # which SPMD slices per device when reps % data_shards == 0
            return TiledPooledTracks(
                pool=jax.tree.map(lambda a: _put(a, replicated(mesh)), x.pool),
                reps=x.reps,
            )
        if isinstance(x, PooledTracks):
            return PooledTracks(
                pool=jax.tree.map(lambda a: _put(a, replicated(mesh)), x.pool),
                ids=_put(x.ids, data_sharding(mesh, x.ids.ndim)),
            )
        if isinstance(x, GroupedPooledTracks):
            # pool replicates; block_ids shard over 'data' when blocks divide
            # evenly (each device then owns whole blocks), else replicate them
            n_data = mesh.shape[mesh.axis_names[0]]
            ids_sh = (data_sharding(mesh, 1)
                      if x.block_ids.shape[0] % n_data == 0 else replicated(mesh))
            return GroupedPooledTracks(
                pool=jax.tree.map(lambda a: _put(a, replicated(mesh)), x.pool),
                block_ids=_put(x.block_ids, ids_sh),
                block_envs=x.block_envs,
            )
        ndim = getattr(x, "ndim", 0)
        if ndim >= 1 and x.shape[0] == num_envs:
            return _put(x, data_sharding(mesh, ndim))
        return _put(x, replicated(mesh))

    return jax.tree.map(
        place, tree,
        is_leaf=lambda x: isinstance(
            x, (PooledTracks, GroupedPooledTracks, TiledPooledTracks)))


def _shard_train_state(train, mesh: Mesh):
    """Params (and the congruent Adam moment subtrees) follow param_shardings;
    every other train-state leaf replicates."""
    psh = param_shardings(train.params, mesh)
    params = jax.tree.map(_put, train.params, psh)
    param_treedef = jax.tree.structure(train.params)

    def place_sub(sub):
        if jax.tree.structure(sub) == param_treedef:
            return jax.tree.map(_put, sub, psh)
        return jax.tree.map(lambda x: _put(x, replicated(mesh)), sub)

    opt_state = jax.tree.map(
        place_sub, train.opt_state,
        is_leaf=lambda s: jax.tree.structure(s) == param_treedef,
    )
    rest = jax.tree.map(
        lambda x: _put(x, replicated(mesh)),
        train.replace(params=None, opt_state=None),
    )
    return rest.replace(params=params, opt_state=opt_state)


def shard_runner(runner, aux, mesh: Mesh, num_envs: int):
    """Place a PPO RunnerState + aux for distributed execution: env-batch leaves
    sharded over 'data', train state tensor-sharded over 'model' when present
    (replicated otherwise), PRNG keys replicated.

    num_envs must divide evenly over the mesh's data axis — uneven env shards
    would silently skew the per-device workload and break the shard-local
    minibatch layout's equal-stratum contract (ppo.run_ppo_update)."""
    n_data = mesh.shape[mesh.axis_names[0]]
    if num_envs % n_data != 0:
        raise ValueError(
            f"num_envs={num_envs} is not divisible by the mesh's data axis "
            f"({mesh.axis_names[0]}={n_data}); choose num_envs as a multiple of "
            f"the data-parallel degree so every device owns an equal env shard"
        )
    train = _shard_train_state(runner.train, mesh)
    vec = shard_by_env_axis(runner.vec, mesh, num_envs)
    runner = runner.replace(
        train=train,
        vec=vec,
        obs=_put(runner.obs, data_sharding(mesh, runner.obs.ndim)),
        done=_put(runner.done, data_sharding(mesh, 1)),
        key=_put(runner.key, replicated(mesh)),
        obs_norm=jax.tree.map(lambda x: _put(x, replicated(mesh)), runner.obs_norm),
    )
    aux = shard_by_env_axis(aux, mesh, num_envs)
    return runner, aux
