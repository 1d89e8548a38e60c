"""PooledTracks (lazy pool-resident geometry) == eager per-env geometry.

The memory-scaling layout (envs/track.py:PooledTracks) must be a bit-exact
drop-in: the in-jit gather produces the same per-env TrackArrays the eager
gather_tracks produces, so whole training runs must match leaf-for-leaf.
"""
import numpy as np

import jax
import jax.numpy as jnp

from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.agent.trainer import PPOTrainer
from self_play_racing_tpu.configs import base_config, self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def _pool_and_ids(num_envs=8, num_tracks=4):
    cps = trk.gen_tracks(num_tracks, seed=3)
    pool = trk.make_track_pool(cps, [7.0] * num_tracks, dtype=jnp.float32)
    ids = np.arange(num_envs) % num_tracks
    return pool, ids


def _assert_trees_equal(a, b):
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b, f"{treedef_a} != {treedef_b}"
    def to_np(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for la, lb in zip(leaves_a, leaves_b):
        # every array leaf — float geometry AND int/bool env state (step
        # counters, done flags, track ids) — must match for a bit-exact drop-in
        np.testing.assert_array_equal(to_np(la), to_np(lb))


def test_resolve_matches_gather():
    pool, ids = _pool_and_ids()
    eager = trk.gather_tracks(pool, ids)
    lazy = trk.resolve(trk.pooled_tracks(pool, ids))
    _assert_trees_equal(eager, lazy)
    # resolve() on an already-per-env TrackArrays is the identity
    assert trk.resolve(eager) is eager


def test_ppo_training_identical_under_pooled_geometry():
    pool, ids = _pool_and_ids()
    cfg = base_config(num_envs=8, num_steps=32, num_minibatches=2,
                      update_epochs=2, total_timesteps=8 * 32 * 3)
    env_cfg = senv.RacingConfig(num_sensors=11)

    eager = PPOTrainer(cfg, env_cfg, trk.gather_tracks(pool, ids))
    lazy = PPOTrainer(cfg, env_cfg, trk.pooled_tracks(pool, ids))
    eager.train(num_updates=2)
    lazy.train(num_updates=2)
    _assert_trees_equal(eager.runner.train.params, lazy.runner.train.params)
    _assert_trees_equal(eager.runner.vec, lazy.runner.vec)


def test_selfplay_training_identical_under_pooled_geometry():
    pool, ids = _pool_and_ids()
    cfg = self_play_config(num_envs=8, num_steps=32, num_minibatches=2,
                           update_epochs=2, total_timesteps=8 * 32 * 3,
                           snapshot_freq=1, pool_size=2,
                           opponent_per_env=True, reset_envs_each_update=False)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    trainers = []
    for track in (trk.gather_tracks(pool, ids), trk.pooled_tracks(pool, ids)):
        sp = SelfPlayTrainer(cfg, env_cfg, track)
        sp.train(num_updates=2)
        trainers.append(sp)
    _assert_trees_equal(trainers[0].runner.train.params,
                        trainers[1].runner.train.params)
    _assert_trees_equal(trainers[0].runner.vec, trainers[1].runner.vec)


def test_grouped_resolve_matches_gather():
    """GroupedPooledTracks (block-grouped capacity layout) == eager gather of
    the equivalent repeated assignment, leaf-for-leaf."""
    pool, _ = _pool_and_ids(num_tracks=4)
    block_ids = np.array([2, 0, 3, 1])
    be = 3
    grouped = trk.grouped_pooled_tracks(pool, block_ids, be)
    eager = trk.gather_tracks(pool, np.repeat(block_ids, be))
    _assert_trees_equal(eager, trk.resolve(grouped))
    assert grouped.num_envs == 12
    assert grouped.num_tracks == 4
    np.testing.assert_array_equal(np.asarray(grouped.ids),
                                  np.repeat(block_ids, be))


def test_ppo_training_identical_under_grouped_geometry():
    pool, _ = _pool_and_ids(num_tracks=4)
    block_ids, be = np.arange(4), 2   # 8 envs in 4 blocks of 2
    env_ids = np.repeat(block_ids, be)
    cfg = base_config(num_envs=8, num_steps=32, num_minibatches=2,
                      update_epochs=2, total_timesteps=8 * 32 * 3)
    env_cfg = senv.RacingConfig(num_sensors=11)

    eager = PPOTrainer(cfg, env_cfg, trk.gather_tracks(pool, env_ids))
    lazy = PPOTrainer(cfg, env_cfg, trk.grouped_pooled_tracks(pool, block_ids, be))
    eager.train(num_updates=2)
    lazy.train(num_updates=2)
    _assert_trees_equal(eager.runner.train.params, lazy.runner.train.params)
    _assert_trees_equal(eager.runner.vec, lazy.runner.vec)


def test_selfplay_training_identical_under_grouped_geometry():
    pool, _ = _pool_and_ids(num_tracks=4)
    block_ids, be = np.arange(4), 2
    env_ids = np.repeat(block_ids, be)
    cfg = self_play_config(num_envs=8, num_steps=32, num_minibatches=2,
                           update_epochs=2, total_timesteps=8 * 32 * 3,
                           snapshot_freq=1, pool_size=2,
                           opponent_per_env=True, reset_envs_each_update=False)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    trainers = []
    for track in (trk.gather_tracks(pool, env_ids),
                  trk.grouped_pooled_tracks(pool, block_ids, be)):
        sp = SelfPlayTrainer(cfg, env_cfg, track)
        sp.train(num_updates=2)
        trainers.append(sp)
    _assert_trees_equal(trainers[0].runner.train.params,
                        trainers[1].runner.train.params)
    _assert_trees_equal(trainers[0].runner.vec, trainers[1].runner.vec)


def test_grouped_geometry_shards_pool_replicated():
    """Grouped layout under the data mesh: pool replicates, block_ids shard
    when blocks divide the axis, and the resolved geometry still matches."""
    from self_play_racing_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    n_dev = mesh.shape["data"]
    pool, _ = _pool_and_ids(num_tracks=4)
    nb, be = 2 * n_dev, 2
    grouped = trk.grouped_pooled_tracks(pool, np.arange(nb) % 4, be)
    placed = pmesh.shard_by_env_axis(grouped, mesh, nb * be)

    spec = tuple(placed.block_ids.sharding.spec)
    assert spec and spec[0] == "data"
    for leaf in jax.tree.leaves(placed.pool):
        s = tuple(leaf.sharding.spec)
        assert not s or s[0] is None, f"pool leaf sharded: {s}"
    _assert_trees_equal(trk.resolve(grouped), trk.resolve(placed))


def test_pooled_geometry_shards_pool_replicated():
    """Under the data mesh the pool leaves replicate, ids shard over 'data' —
    geometry residency per device is O(tracks), not O(envs/devices)."""
    from self_play_racing_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    # num_tracks != num_envs (the common case) AND num_tracks == num_envs (the
    # trap: pool leaves then share dim0 with the env axis and shape-based
    # placement would wrongly shard the pool over 'data').
    for num_envs, num_tracks in ((16, 4), (8, 8)):
        pool, ids = _pool_and_ids(num_envs=num_envs, num_tracks=num_tracks)
        pooled = trk.pooled_tracks(pool, ids)
        placed = pmesh.shard_by_env_axis(pooled, mesh, num_envs)

        id_spec = placed.ids.sharding.spec
        assert tuple(id_spec) and tuple(id_spec)[0] == "data"
        for leaf in jax.tree.leaves(placed.pool):
            spec = tuple(leaf.sharding.spec)
            assert not spec or spec[0] is None, f"pool leaf sharded: {spec}"


def test_tiled_resolve_matches_gather():
    """TiledPooledTracks == eager gather of the interleaved default assignment
    arange(N) % T, leaf-for-leaf — the layout must be a bit-exact drop-in for
    the framework's default geometry."""
    pool, ids = _pool_and_ids(num_envs=12, num_tracks=4)
    tiled = trk.tiled_pooled_tracks(pool, 12)
    eager = trk.gather_tracks(pool, ids)
    _assert_trees_equal(eager, trk.resolve(tiled))
    assert tiled.num_envs == 12 and tiled.num_tracks == 4
    np.testing.assert_array_equal(np.asarray(tiled.ids), ids)

    import pytest
    with pytest.raises(ValueError):
        trk.tiled_pooled_tracks(pool, 10)  # not divisible


def test_ppo_training_identical_under_tiled_geometry():
    pool, ids = _pool_and_ids(num_envs=8, num_tracks=4)
    cfg = base_config(num_envs=8, num_steps=32, num_minibatches=2,
                      update_epochs=2, total_timesteps=8 * 32 * 3)
    env_cfg = senv.RacingConfig(num_sensors=11)

    eager = PPOTrainer(cfg, env_cfg, trk.gather_tracks(pool, ids))
    lazy = PPOTrainer(cfg, env_cfg, trk.tiled_pooled_tracks(pool, 8))
    eager.train(num_updates=2)
    lazy.train(num_updates=2)
    _assert_trees_equal(eager.runner.train.params, lazy.runner.train.params)
    _assert_trees_equal(eager.runner.vec, lazy.runner.vec)


def test_tiled_geometry_shards_pool_replicated():
    """Tiled layout under the data mesh: the pool replicates; there are no
    per-env leaves at all (the env axis is born inside the partitioned
    program), and the resolved geometry matches."""
    from self_play_racing_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    n_dev = mesh.shape["data"]
    pool, _ = _pool_and_ids(num_tracks=4)
    tiled = trk.tiled_pooled_tracks(pool, 4 * 2 * n_dev)
    placed = pmesh.shard_by_env_axis(tiled, mesh, 4 * 2 * n_dev)
    for leaf in jax.tree.leaves(placed.pool):
        s = tuple(leaf.sharding.spec)
        assert not s or s[0] is None, f"pool leaf sharded: {s}"
    _assert_trees_equal(trk.resolve(tiled), trk.resolve(placed))
