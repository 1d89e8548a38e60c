"""Multi-agent environment parity vs the reference MultiRacingEnv (golden oracle).

Same two protocols as the single-agent suite: per-step resynced parity (state lifted
from the oracle each step) and free-running trajectory parity, plus targeted checks of
the multi-only mechanics: start grid, car-car raycast, SAT collision response,
placement/winner scoring, one-time crash penalty.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import track as jtrack

from environment.multi_racing_env import MultiRacingEnv as RefEnv


def make_pair(track_seed=5, width=7.0, num_sensors=11, num_agents=2):
    cps = [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=track_seed)]
    pool = jtrack.make_track_pool(cps, [width], dtype=jnp.float64)
    track = jtrack.gather_tracks(pool, [0])
    cfg = menv.MultiRacingConfig(num_agents=num_agents, num_sensors=num_sensors)
    ref = RefEnv(num_agents=num_agents, num_sensors=num_sensors, track_pool=cps,
                 track_id=0, track_width=width)
    return cfg, track, ref


def ref_reset_with_known_order(ref, seed):
    """Reset the oracle with a reproducible start ordering; return position_idx[A]."""
    np.random.seed(seed)
    order = list(range(ref.num_agents))
    np.random.shuffle(order)
    np.random.seed(seed)
    ref.reset()
    return np.array([order.index(i) for i in range(ref.num_agents)])


def ref_state_to_jax(ref):
    a = ref.num_agents
    arr = lambda f: jnp.asarray([[f(i) for i in range(a)]], dtype=jnp.float64)
    barr = lambda f: jnp.asarray([[f(i) for i in range(a)]], dtype=bool)
    iarr = lambda f: jnp.asarray([[f(i) for i in range(a)]], dtype=jnp.int32)
    cars = ref.cars
    data = ref.agents_data
    return menv.MultiState(
        x=arr(lambda i: cars[i].x), y=arr(lambda i: cars[i].y),
        angle=arr(lambda i: cars[i].angle),
        vx=arr(lambda i: cars[i].vx), vy=arr(lambda i: cars[i].vy),
        progress=arr(lambda i: cars[i].progress),
        crashed=barr(lambda i: cars[i].crashed),
        finished=barr(lambda i: cars[i].finished),
        steps=jnp.asarray([ref.steps], jnp.int32),
        last_progress=arr(lambda i: data[i]["last_progress"]),
        last_steering=arr(lambda i: data[i]["last_steering"]),
        cp25=barr(lambda i: data[i]["checkpoints"][0.25]),
        cp50=barr(lambda i: data[i]["checkpoints"][0.50]),
        cp75=barr(lambda i: data[i]["checkpoints"][0.75]),
        has_crashed=barr(lambda i: data[i].get("has_crashed", False)),
        finished_step=iarr(lambda i: data[i]["finished_step"] or 0),
        placement=jnp.zeros((1, a), jnp.int32),
    )


def test_reset_grid_and_obs_match():
    cfg, track, ref = make_pair()
    pos = ref_reset_with_known_order(ref, seed=11)
    state, obs = menv.reset(cfg, track, position_idx=pos[None, :])
    for i in range(2):
        assert float(state.x[0, i]) == pytest.approx(ref.cars[i].x, abs=1e-12)
        assert float(state.y[0, i]) == pytest.approx(ref.cars[i].y, abs=1e-12)
    ref_obs = {f"{i}": ref._get_obs(i) for i in range(2)}
    for i in range(2):
        np.testing.assert_allclose(np.asarray(obs[0, i]), ref_obs[f"{i}"],
                                   rtol=0, atol=1e-6)


def test_per_step_parity_resynced():
    cfg, track, ref = make_pair()
    ref_reset_with_known_order(ref, seed=3)
    rng = np.random.RandomState(0)
    step_fn = jax.jit(lambda tr, s, a: menv.step(cfg, tr, s, a))
    for t in range(250):
        state = ref_state_to_jax(ref)
        act = rng.uniform(-1, 1, size=(2, 2))
        ref_actions = {f"{i}": act[i] for i in range(2)}
        robs, rrew, rdones, rtrunc, rinfos = ref.step(ref_actions)
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(act)[None]
        )
        for i in range(2):
            assert float(jrew[0, i]) == pytest.approx(rrew[f"{i}"], rel=0, abs=1e-9), \
                f"step {t} agent {i}"
            np.testing.assert_allclose(np.asarray(jobs[0, i]), robs[f"{i}"],
                                       rtol=0, atol=1e-6)
            assert bool(jterm[0]) == rdones[f"{i}"]
            assert float(jinfo["progress"][0, i]) == pytest.approx(
                rinfos[f"{i}"]["progress"], abs=1e-12)
            assert bool(jinfo["crashed"][0, i]) == rinfos[f"{i}"]["crashed"]
            assert bool(jinfo["finished"][0, i]) == rinfos[f"{i}"]["finished"]
            if "placement" in rinfos[f"{i}"]:
                assert int(jinfo["placement"][0, i]) == rinfos[f"{i}"]["placement"]
        assert bool(jterm[0] | jtrunc[0]) == rdones["__all__"]
        if rdones["__all__"]:
            ref_reset_with_known_order(ref, seed=100 + t)


def test_free_running_parity():
    cfg, track, ref = make_pair(track_seed=9, width=8.0)
    pos = ref_reset_with_known_order(ref, seed=21)
    state, _ = menv.reset(cfg, track, position_idx=pos[None, :])
    step_fn = jax.jit(lambda tr, s, a: menv.step(cfg, tr, s, a))
    for t in range(300):
        act = np.stack([
            [0.3 * np.sin(t / 19.0), 0.4],
            [0.3 * np.cos(t / 23.0), 0.2],
        ])
        robs, rrew, rdones, rtrunc, rinfos = ref.step({f"{i}": act[i] for i in range(2)})
        state, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(act)[None]
        )
        for i in range(2):
            assert float(jrew[0, i]) == pytest.approx(rrew[f"{i}"], rel=0, abs=1e-6), \
                f"step {t} agent {i}"
            np.testing.assert_allclose(np.asarray(jobs[0, i]), robs[f"{i}"],
                                       rtol=0, atol=5e-6)
        if rdones["__all__"]:
            break


def test_collision_response_and_placement():
    """Drive both cars head-on from the start grid until they touch; check the 0.92
    velocity scaling and -5 penalties mirror the oracle, then run to episode end and
    compare placements + winner bonus."""
    cfg, track, ref = make_pair(width=9.0)
    pos = ref_reset_with_known_order(ref, seed=2)
    state, _ = menv.reset(cfg, track, position_idx=pos[None, :])
    step_fn = jax.jit(lambda tr, s, a: menv.step(cfg, tr, s, a))
    touched = False
    for t in range(3000):
        # steer both toward the centerline -> they converge and collide
        act = np.stack([[0.12 if pos[0] > pos[1] else -0.12, 0.3],
                        [-0.12 if pos[0] > pos[1] else 0.12, 0.3]])
        robs, rrew, rdones, rtrunc, rinfos = ref.step({f"{i}": act[i] for i in range(2)})
        state, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(act)[None]
        )
        for i in range(2):
            assert float(jrew[0, i]) == pytest.approx(rrew[f"{i}"], rel=0, abs=1e-6)
        if not touched and any("placement" not in rinfos[f"{i}"] for i in range(2)):
            # detect a touching step via the reward drop bookkeeping on the oracle side
            pass
        if rdones["__all__"]:
            for i in range(2):
                assert int(jinfo["placement"][0, i]) == rinfos[f"{i}"]["placement"]
            return
    pytest.fail("episode never ended")


@pytest.mark.parametrize(
    "num_agents,num_sensors,track_seed,width",
    [
        (3, 11, 4, 7.0),   # three agents: 8 opponent-relative features each
        (2, 7, 8, 9.0),    # non-default sensor count on a wide track
        (4, 5, 6, 6.0),    # four agents, few sensors
    ],
)
def test_per_step_parity_config_fuzz(num_agents, num_sensors, track_seed, width):
    """Resynced per-step parity across agent counts and sensor configurations —
    the opponent-relative obs blocks, pairwise SAT response and placement scoring
    must match the oracle for every num_agents, not just the entry points' 2."""
    cfg, track, ref = make_pair(track_seed=track_seed, width=width,
                                num_sensors=num_sensors, num_agents=num_agents)
    ref_reset_with_known_order(ref, seed=track_seed)
    rng = np.random.RandomState(track_seed)
    step_fn = jax.jit(lambda tr, s, a: menv.step(cfg, tr, s, a))
    for t in range(80):
        state = ref_state_to_jax(ref)
        act = rng.uniform(-1, 1, size=(num_agents, 2))
        robs, rrew, rdones, rtrunc, rinfos = ref.step(
            {f"{i}": act[i] for i in range(num_agents)})
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(act)[None]
        )
        for i in range(num_agents):
            assert float(jrew[0, i]) == pytest.approx(rrew[f"{i}"], rel=0, abs=1e-9), \
                f"step {t} agent {i}"
            np.testing.assert_allclose(np.asarray(jobs[0, i]), robs[f"{i}"],
                                       rtol=0, atol=1e-6)
            if "placement" in rinfos[f"{i}"]:
                assert int(jinfo["placement"][0, i]) == rinfos[f"{i}"]["placement"]
        assert bool(jterm[0] | jtrunc[0]) == rdones["__all__"]
        if rdones["__all__"]:
            ref_reset_with_known_order(ref, seed=300 + t)


def test_lap_completion_and_winner_parity():
    """One car crosses the finish line with checkpoints collected: finish + time
    bonus, terminated-on-any-finish, placement ranking and the +250 winner bonus
    (multi_racing_env.py:176-211,252-259) must match the oracle exactly."""
    cfg, track, ref = make_pair()
    ref_reset_with_known_order(ref, seed=11)
    wp = ref.track.waypoints
    n = len(wp)
    src = wp[n - 4]
    tgt = wp[1]
    heading = float(np.arctan2(tgt[1] - src[1], tgt[0] - src[0]))
    # car 0: at speed just before the line, all checkpoints; car 1: mid-track
    c0 = ref.cars[0]
    c0.x, c0.y, c0.angle = float(src[0]), float(src[1]), heading
    c0.vx, c0.vy = 18.0 * np.cos(heading), 18.0 * np.sin(heading)
    c0.progress = (n - 4) / n
    ref.agents_data[0]["last_progress"] = c0.progress
    for k in ref.agents_data[0]["checkpoints"]:
        ref.agents_data[0]["checkpoints"][k] = True
    mid = wp[n // 2]
    c1 = ref.cars[1]
    c1.x, c1.y = float(mid[0]), float(mid[1])
    c1.progress = 0.5
    ref.agents_data[1]["last_progress"] = 0.5
    ref.steps = 800

    step_fn = jax.jit(lambda tr, s, a: menv.step(cfg, tr, s, a))
    for t in range(30):
        state = ref_state_to_jax(ref)
        act = np.array([[0.0, 1.0], [0.0, -1.0]])
        robs, rrew, rdones, rtrunc, rinfos = ref.step({"0": act[0], "1": act[1]})
        jstate, jobs, jrew, jterm, jtrunc, jinfo = step_fn(
            track, state, jnp.asarray(act)[None]
        )
        for i in range(2):
            assert float(jrew[0, i]) == pytest.approx(rrew[f"{i}"], rel=0, abs=1e-9), \
                f"step {t} agent {i}"
        assert bool(jterm[0] | jtrunc[0]) == rdones["__all__"]
        if rdones["__all__"]:
            assert ref.cars[0].finished
            # winner bonus (+250) landed on the finisher and placements match
            assert rrew["0"] > 250.0
            for i in range(2):
                assert int(jinfo["placement"][0, i]) == rinfos[f"{i}"]["placement"]
            assert int(jinfo["placement"][0, 0]) == 1
            return
    pytest.fail("car 0 never completed the lap")


def test_track_query_merged_layout_bit_exact(monkeypatch):
    """The merged [envs*agents] track-query layout (taken above
    _QUERY_MERGE_THRESHOLD, the measured TPU fusion cliff) is bit-identical to
    the unmerged [envs, agents] form — same per-element math, different tiling."""
    pool = jtrack.make_track_pool(
        [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=3)], [8.0])
    track = jtrack.gather_tracks(pool, [0] * 6)
    cfg = menv.MultiRacingConfig(num_agents=5, num_sensors=11)
    state = menv.reset_state(cfg, track, jax.random.key(2))
    rng = np.random.RandomState(0)
    # drive off the start grid so corners probe varied waypoints
    for _ in range(20):
        a = jnp.asarray(rng.uniform(-1, 1, (6, 5, 2)))
        state, *_ = menv.transition(cfg, track, state, a)

    from self_play_racing_tpu.ops import geometry as geo
    ccx, ccy = geo.car_corners(state.x, state.y, state.angle,
                               cfg.car.length / 2, cfg.car.width / 2)
    small = menv._track_query(track, state.x, state.y, ccx, ccy)
    monkeypatch.setattr(menv, "_QUERY_MERGE_THRESHOLD", 0)
    merged = menv._track_query(track, state.x, state.y, ccx, ccy)
    np.testing.assert_array_equal(np.asarray(small[0]), np.asarray(merged[0]))
    np.testing.assert_array_equal(np.asarray(small[1]), np.asarray(merged[1]))
