"""Single-agent environment parity vs the reference Gymnasium env (golden oracle).

Two protocols, per SURVEY.md §7:
 1. per-step parity: copy the oracle's state into the JAX env each step, advance both
    one step with the same action, compare every output to f64 round-off.
 2. free-running trajectory parity: step both for hundreds of steps from reset with an
    identical action sequence; all discrete events (crash/finish/checkpoints/dones)
    must coincide and continuous outputs must track at 1e-6.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import single as jenv
from self_play_racing_tpu.envs import track as jtrack

from environment.racing_env import RacingEnv as RefEnv


def make_pair(num_sensors=11, track_seed=5, width=7.0):
    cps = [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=track_seed)]
    pool = jtrack.make_track_pool(cps, [width], dtype=jnp.float64)
    track = jtrack.gather_tracks(pool, [0])
    cfg = jenv.RacingConfig(num_sensors=num_sensors)
    ref = RefEnv(num_sensors=num_sensors, track_pool=cps, track_id=0, track_width=width)
    return cfg, track, ref


def ref_state_to_jax(ref, cfg, track):
    """Lift the oracle's scalar state into a batch-1 RacingState."""
    f = lambda v: jnp.asarray([v], dtype=jnp.float64)
    b = lambda v: jnp.asarray([v], dtype=bool)
    car = jenv.CarState(
        x=f(ref.car.x), y=f(ref.car.y), angle=f(ref.car.angle),
        vx=f(ref.car.vx), vy=f(ref.car.vy), progress=f(ref.car.progress),
        crashed=b(ref.car.crashed), finished=b(ref.car.finished),
    )
    return jenv.RacingState(
        car=car,
        steps=jnp.asarray([ref.steps], jnp.int32),
        last_progress=f(ref.last_progress),
        last_steering=f(ref.last_steering),
        cp25=b(ref.checkpoints[0.25]),
        cp50=b(ref.checkpoints[0.50]),
        cp75=b(ref.checkpoints[0.75]),
    )


def test_reset_obs_matches():
    cfg, track, ref = make_pair()
    ref_obs, _ = ref.reset()
    state, obs = jenv.reset(cfg, track)
    np.testing.assert_allclose(np.asarray(obs[0]), ref_obs, rtol=0, atol=1e-7)


def test_per_step_parity_resynced():
    cfg, track, ref = make_pair()
    ref.reset()
    rng = np.random.RandomState(0)
    step_fn = jax.jit(lambda tr, s, a: jenv.step(cfg, tr, s, a))
    for t in range(200):
        state = ref_state_to_jax(ref, cfg, track)
        action = np.array([rng.uniform(-1, 1), rng.uniform(0, 1)])
        robs, rrew, rterm, rtrunc, rinfo = ref.step(action)
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(action)[None, :]
        )
        assert float(jrew[0]) == pytest.approx(rrew, rel=0, abs=1e-9), f"step {t}"
        assert bool(jterm[0]) == rterm, f"step {t}"
        assert bool(jtrunc[0]) == rtrunc, f"step {t}"
        np.testing.assert_allclose(np.asarray(jobs[0]), robs, rtol=0, atol=1e-6)
        assert float(jstate.car.x[0]) == pytest.approx(ref.car.x, abs=1e-10)
        assert float(jstate.car.y[0]) == pytest.approx(ref.car.y, abs=1e-10)
        assert float(jstate.car.progress[0]) == ref.car.progress
        assert bool(jstate.car.crashed[0]) == ref.car.crashed
        assert bool(jstate.car.finished[0]) == ref.car.finished
        assert float(jinfo["progress"][0]) == pytest.approx(rinfo["progress"], abs=1e-12)
        assert float(jinfo["speed"][0]) == pytest.approx(rinfo["speed"], abs=1e-10)
        if rterm or rtrunc:
            ref.reset()


def test_free_running_trajectory_parity():
    cfg, track, ref = make_pair(track_seed=9, width=8.0)
    ref.reset()
    state, obs = jenv.reset(cfg, track)
    rng = np.random.RandomState(42)
    step_fn = jax.jit(lambda tr, s, a: jenv.step(cfg, tr, s, a))
    # mild steering, constant throttle: stays alive long enough to be interesting
    for t in range(400):
        action = np.array([0.35 * np.sin(t / 17.0) + 0.05 * rng.randn(), 0.65])
        robs, rrew, rterm, rtrunc, rinfo = ref.step(action)
        state, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(action)[None, :]
        )
        assert bool(jterm[0]) == rterm, f"divergent termination at step {t}"
        assert float(jrew[0]) == pytest.approx(rrew, rel=0, abs=1e-6), f"step {t}"
        np.testing.assert_allclose(np.asarray(jobs[0]), robs, rtol=0, atol=1e-6)
        if rterm or rtrunc:
            break


def test_crash_freezes_state():
    cfg, track, _ = make_pair()
    state, _ = jenv.reset(cfg, track)
    # drive full-throttle straight ahead: the track curves away, the car doesn't
    step_fn = jax.jit(lambda tr, s, a: jenv.step(cfg, tr, s, a))
    a = jnp.asarray([[0.0, 1.0]])
    crashed_at = None
    for t in range(500):
        state, obs, rew, term, trunc, info = step_fn(track, state, a)
        if bool(state.car.crashed[0]):
            crashed_at = t
            break
    assert crashed_at is not None
    frozen = (float(state.car.x[0]), float(state.car.y[0]), float(state.car.angle[0]))
    state2, _, rew2, term2, _, _ = step_fn(track, state, a)
    assert (float(state2.car.x[0]), float(state2.car.y[0]), float(state2.car.angle[0])) == frozen
    assert bool(term2[0])
    # sticky crash keeps paying the -60 penalty like the reference would
    assert float(rew2[0]) == pytest.approx(-60.0)


@pytest.mark.parametrize(
    "num_sensors,track_seed,width",
    [
        (7, 3, 6.0),    # the reference's default sensor count (racing_env.py:9)
        (5, 11, 9.5),   # few sensors, widest track
        (11, 2, 4.0),   # narrowest eval-grid width (evaluate.py:181 draws [4,10))
        (15, 7, 7.5),   # more sensors than any entry point uses
    ],
)
def test_per_step_parity_config_fuzz(num_sensors, track_seed, width):
    """Resynced per-step parity across env configurations: sensor counts other than
    the entry points' 11 (incl. the class default 7) and the eval grid's width
    extremes must match the oracle just as tightly."""
    cfg, track, ref = make_pair(num_sensors=num_sensors, track_seed=track_seed,
                                width=width)
    ref.reset()
    rng = np.random.RandomState(track_seed)
    step_fn = jax.jit(lambda tr, s, a: jenv.step(cfg, tr, s, a))
    for t in range(60):
        state = ref_state_to_jax(ref, cfg, track)
        action = np.array([rng.uniform(-1, 1), rng.uniform(0, 1)])
        robs, rrew, rterm, rtrunc, rinfo = ref.step(action)
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(action)[None, :]
        )
        assert float(jrew[0]) == pytest.approx(rrew, rel=0, abs=1e-9), f"step {t}"
        assert bool(jterm[0]) == rterm and bool(jtrunc[0]) == rtrunc, f"step {t}"
        np.testing.assert_allclose(np.asarray(jobs[0]), robs, rtol=0, atol=1e-6)
        if rterm or rtrunc:
            ref.reset()


def test_lap_completion_parity():
    """Drive through the start/finish line with all checkpoints collected: the
    wraparound progress delta, finish bonus and step-dependent time bonus
    (racing_env.py:112-116,145-150) must match the oracle on the finishing step."""
    cfg, track, ref = make_pair()
    ref.reset()
    # teleport the oracle just before the line, aimed at waypoint 0, at speed
    wp = ref.track.waypoints
    n = len(wp)
    src = wp[n - 4]
    tgt = wp[1]
    heading = float(np.arctan2(tgt[1] - src[1], tgt[0] - src[0]))
    ref.car.x, ref.car.y = float(src[0]), float(src[1])
    ref.car.angle = heading
    ref.car.vx = 18.0 * np.cos(heading)
    ref.car.vy = 18.0 * np.sin(heading)
    ref.car.progress = (n - 4) / n
    ref.last_progress = ref.car.progress
    for k in ref.checkpoints:
        ref.checkpoints[k] = True
    ref.steps = 500

    step_fn = jax.jit(lambda tr, s, a: jenv.step(cfg, tr, s, a))
    finished_at = None
    for t in range(30):
        state = ref_state_to_jax(ref, cfg, track)
        action = np.array([0.0, 1.0])
        robs, rrew, rterm, rtrunc, rinfo = ref.step(action)
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(action)[None, :]
        )
        assert float(jrew[0]) == pytest.approx(rrew, rel=0, abs=1e-9), f"step {t}"
        assert bool(jstate.car.finished[0]) == ref.car.finished, f"step {t}"
        assert bool(jterm[0]) == rterm
        if ref.car.finished:
            finished_at = t
            # finishing reward includes the 100 bonus + max(0, 200 - steps/10)
            assert rrew > 100.0
            assert float(jinfo["progress"][0]) == 1.0
            break
    assert finished_at is not None, "car never completed the lap"
