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


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_by_env_axis(tree, mesh: Mesh, num_envs: int):
    """device_put every leaf: dim0 == num_envs -> shard on 'data', else replicate."""

    def place(x):
        ndim = getattr(x, "ndim", 0)
        if ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data_sharding(mesh, ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)


def shard_runner(runner, aux, mesh: Mesh, num_envs: int):
    """Place a PPO RunnerState + aux for data-parallel execution: env-batch leaves
    sharded, train state and PRNG keys replicated."""
    train = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), runner.train)
    vec = shard_by_env_axis(runner.vec, mesh, num_envs)
    runner = runner.replace(
        train=train,
        vec=vec,
        obs=jax.device_put(runner.obs, data_sharding(mesh, runner.obs.ndim)),
        done=jax.device_put(runner.done, data_sharding(mesh, 1)),
        key=jax.device_put(runner.key, replicated(mesh)),
    )
    aux = shard_by_env_axis(aux, mesh, num_envs)
    return runner, aux
