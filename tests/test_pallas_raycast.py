"""Pallas track-shared raycast kernel vs the XLA reference path (interpret mode on
the CPU test mesh; the compiled TPU kernel is bit-identical — see module docstring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.ops import geometry as geo
from self_play_racing_tpu.ops import pallas_raycast as pr


def test_grouped_kernel_matches_xla():
    K, N, BN = 4, 16, 8
    pool = trk.make_track_pool(trk.gen_tracks(K, seed=1), [7.0] * K)
    track_ids, block_ids = pr.group_envs_by_track(N, K, BN)
    pertrack = trk.gather_tracks(pool, track_ids)
    rng = np.random.RandomState(0)
    ox = jnp.asarray(np.asarray(pool.start_x)[track_ids] + rng.uniform(-3, 3, N), jnp.float32)
    oy = jnp.asarray(np.asarray(pool.start_y)[track_ids] + rng.uniform(-3, 3, N), jnp.float32)
    ang = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    rel = tuple(np.linspace(-np.pi / 3, np.pi / 3, 11))

    out = pr.raycast_walls_grouped(
        ox, oy, ang, jnp.asarray(block_ids), pool.seg_sx, pool.seg_sy,
        pool.seg_vx, pool.seg_vy, pool.seg_c, rel, 50.0,
        block_envs=BN, interpret=True,
    )
    world = ang[:, None] + jnp.asarray(rel, jnp.float32)[None, :]
    ref = geo.raycast_walls(
        jnp.broadcast_to(ox[:, None], world.shape),
        jnp.broadcast_to(oy[:, None], world.shape),
        jnp.cos(world), jnp.sin(world),
        pertrack.seg_sx[:, None, :], pertrack.seg_sy[:, None, :],
        pertrack.seg_vx[:, None, :], pertrack.seg_vy[:, None, :], 50.0,
        seg_c=pertrack.seg_c[:, None, :],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_group_envs_by_track_contract():
    track_ids, block_ids = pr.group_envs_by_track(32, 3, 8)
    assert track_ids.shape == (32,)
    assert block_ids.shape == (4,)
    for b in range(4):
        assert (track_ids[b * 8:(b + 1) * 8] == block_ids[b]).all()
