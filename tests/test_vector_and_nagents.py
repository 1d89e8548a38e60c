"""Vector autoreset semantics + beyond-reference generality (N>2 agents).

The autoreset contract mirrors Gymnasium 1.x NEXT_STEP mode (what SyncVectorEnv
inserts into the reference's rollouts): the step after done ignores the action and
returns the reset observation with reward 0 and done False, and episode statistics do
not count that transition.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.envs import vector


def make_vec(n=4, with_info_fn=False):
    pool = trk.make_track_pool([trk.gen_random_track(11, 55, 12, 0.3, 0.5, seed=4)],
                               [8.0])
    track = trk.gather_tracks(pool, [0] * n)
    cfg = senv.RacingConfig(num_sensors=11)
    state, obs = senv.reset(cfg, track)
    vs = vector.init(state, n, jax.random.key(0))
    step = jax.jit(lambda vs, a: vector.step(
        vs, a,
        lambda s, a_, k: senv.transition(cfg, track, s, a_),
        lambda s: senv.observe(cfg, track, s),
        lambda k: senv.reset_state(cfg, track),
        info_fn=((lambda s: senv.info_from_state(cfg, track, s))
                 if with_info_fn else None),
    ))
    return cfg, track, vs, obs, step


def test_next_step_autoreset_contract():
    cfg, track, vs, obs0, step = make_vec()
    a = jnp.tile(jnp.asarray([[0.0, 1.0]]), (4, 1))  # drive straight -> crash
    done_step = None
    for t in range(500):
        vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
        if bool(done[0]):
            done_step = t
            break
    assert done_step is not None
    assert bool(vs.pending_reset[0])
    ep_len_at_done = int(np.asarray(rec["length"])[0])

    # the reset transition: reward 0, done False, obs == fresh reset obs
    vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
    assert float(rew[0]) == 0.0
    assert not bool(done[0])
    assert not bool(vs.pending_reset[0])
    np.testing.assert_allclose(np.asarray(obs[0]), np.asarray(obs0[0]), atol=1e-6)
    # stats: reset step contributes neither reward nor length
    assert int(np.asarray(vs.stats.ep_length)[0]) == 0
    assert float(np.asarray(vs.stats.ep_return)[0]) == 0.0

    # the episode then replays identically (deterministic env + same actions)
    for t in range(done_step + 1):
        vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
    assert bool(done[0])
    assert int(np.asarray(rec["length"])[0]) == ep_len_at_done


def test_autoreset_info_is_reset_state_info():
    """On an autoreset row, info must describe the fresh reset state (Gymnasium
    NEXT_STEP reset-info contract), not the phantom transition of the dead state."""
    cfg, track, vs, obs0, step = make_vec(with_info_fn=True)
    a = jnp.tile(jnp.asarray([[0.0, 1.0]]), (4, 1))  # drive straight -> crash
    for t in range(500):
        vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
        if bool(done[0]):
            break
    assert bool(done[0])
    assert bool(info["crashed"][0])  # terminal info: the transition's, untouched

    vs, obs, rew, done, term, trunc, info, rec = step(vs, a)
    assert bool(rec["autoreset"][0])
    # reset-row info == fresh state's info: start position, zero speed/progress,
    # no crash flag carried over from the dead episode, zero per-transition leaves
    start = senv.reset_state(cfg, track)
    assert float(info["x"][0]) == pytest.approx(float(start.car.x[0]), abs=1e-9)
    assert float(info["y"][0]) == pytest.approx(float(start.car.y[0]), abs=1e-9)
    assert float(info["speed"][0]) == 0.0
    assert not bool(info["crashed"][0])
    assert not bool(info["finished"][0])
    assert float(info["reward"][0]) == 0.0
    assert float(info["progress_delta"][0]) == 0.0
    assert float(info["progress"][0]) == pytest.approx(
        float(start.car.progress[0]), abs=1e-9)


@pytest.mark.parametrize("num_agents", [3, 4])
def test_multi_env_n_agents(num_agents):
    """The multi env generalizes past the reference's 2 cars: obs dims, start grid,
    pairwise collisions, and placement ranking all scale with num_agents."""
    pool = trk.make_track_pool([trk.gen_random_track(12, 60, 15, 0.4, 0.5, seed=5)],
                               [9.0])
    track = trk.gather_tracks(pool, [0])
    cfg = menv.MultiRacingConfig(num_agents=num_agents, num_sensors=11)
    assert cfg.obs_dim == 11 + 4 + (num_agents - 1) * 4

    state, obs = menv.reset(cfg, track, key=jax.random.key(0))
    assert obs.shape == (1, num_agents, cfg.obs_dim)
    # start grid: distinct offsets, centered around the start position
    xs = np.asarray(state.x[0])
    assert len(np.unique(np.round(xs, 6))) == num_agents

    step = jax.jit(lambda s, a: menv.step(cfg, track, s, a))
    rng = np.random.RandomState(0)
    for t in range(200):
        a = jnp.asarray(rng.uniform(-1, 1, (1, num_agents, 2)))
        state, obs, rew, term, trunc, info = step(state, a)
        assert np.isfinite(np.asarray(rew)).all()
        if bool(term[0]) or bool(trunc[0]):
            placements = sorted(np.asarray(info["placement"][0]).tolist())
            assert placements == list(range(1, num_agents + 1))
            break
    assert bool(term[0]) or bool(trunc[0]) or t == 199
