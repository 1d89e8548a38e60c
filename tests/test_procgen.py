"""On-device procedural track generation (envs/procgen.py).

Oracles:
 - the periodic spline solver vs scipy.interpolate.CubicSpline(bc_type="periodic")
 - the batched device geometry pipeline vs the host pipeline
   (envs/track.py build_track_geometry/make_track_pool) on identical control points
 - generated pools drive the single-agent env (reset + transitions stay finite)
"""
import numpy as np
from scipy.interpolate import CubicSpline

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import procgen
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as jtrack


def _closed_polygon(seed, n):
    cp = jtrack.gen_random_track(num_points=n, seed=seed)
    closed = np.vstack([cp, cp[:1]])
    t = np.concatenate(
        ([0.0], np.cumsum(np.linalg.norm(np.diff(closed, axis=0), axis=1))))
    return closed, t


def test_periodic_spline_matches_scipy():
    for seed, n in [(0, 10), (1, 12), (2, 15)]:
        closed, t = _closed_polygon(seed, n)
        ts = np.linspace(0.0, t[-1], 173, endpoint=False)
        for dim in range(2):
            ref = CubicSpline(t, closed[:, dim], bc_type="periodic")(ts)
            m = procgen.periodic_spline_m(jnp.asarray(t), jnp.asarray(closed[:, dim]))
            ours = procgen.eval_periodic_spline(
                jnp.asarray(t), jnp.asarray(closed[:, dim]), m, jnp.asarray(ts))
            np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-8)


def test_device_geometry_matches_host_pipeline():
    # same control points through both pipelines (fixed n so the batch is regular)
    n = 12
    cps = [jtrack.gen_random_track(num_points=n, seed=s) for s in (3, 4, 5)]
    widths = [6.0, 7.5, 9.0]
    host = jtrack.make_track_pool(cps, widths, dtype=jnp.float64)
    dev = procgen.build_track_arrays(
        jnp.asarray(np.stack(cps)), jnp.asarray(widths), dtype=jnp.float64)

    assert dev.pad_waypoints == host.pad_waypoints
    np.testing.assert_array_equal(np.asarray(dev.n_wp), np.asarray(host.n_wp))
    for name in ["wp_x", "wp_y", "nrm_x", "nrm_y", "seg_sx", "seg_sy", "seg_vx",
                 "seg_vy", "seg_c", "track_width", "max_track_distance",
                 "start_x", "start_y", "start_angle", "start_nx", "start_ny"]:
        np.testing.assert_allclose(
            np.asarray(getattr(dev, name)), np.asarray(getattr(host, name)),
            atol=1e-7, err_msg=name)


def test_gen_track_pool_device_is_usable():
    pool = procgen.gen_track_pool_device(jax.random.key(0), 4)
    assert pool.num_tracks == 4
    widths = np.asarray(pool.track_width)
    assert ((widths >= 6.0) & (widths < 10.0)).all()
    assert (np.asarray(pool.max_track_distance) > 0).all()
    assert (np.asarray(pool.n_wp) == 12 * jtrack.WAYPOINT_FACTOR).all()

    # envs reset and step on the generated geometry without going non-finite
    num_envs = 8
    track = jtrack.gather_tracks(pool, np.arange(num_envs) % pool.num_tracks)
    cfg = senv.RacingConfig(num_sensors=11)
    state, obs = senv.reset(cfg, track)
    assert np.isfinite(np.asarray(obs)).all()
    action = jnp.tile(jnp.asarray([[0.0, 1.0]], jnp.float32), (num_envs, 1))
    for _ in range(5):
        state, reward, term, trunc, info = senv.transition(cfg, track, state, action)
    obs = senv.observe(cfg, track, state)
    assert np.isfinite(np.asarray(obs)).all()
    assert not np.asarray(state.car.crashed).any()  # straight start: no instant crash


def test_resampling_changes_geometry_deterministically():
    a = procgen.gen_track_pool_device(jax.random.key(1), 2)
    b = procgen.gen_track_pool_device(jax.random.key(2), 2)
    a2 = procgen.gen_track_pool_device(jax.random.key(1), 2)
    assert not np.allclose(np.asarray(a.wp_x), np.asarray(b.wp_x))
    np.testing.assert_array_equal(np.asarray(a.wp_x), np.asarray(a2.wp_x))


def test_scale_training_with_device_resampling():
    """Self-play trains across on-device track-pool swaps: geometry changes every
    K updates, envs restart on it, learner state persists, losses stay finite."""
    from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
    from self_play_racing_tpu.configs import self_play_config
    from self_play_racing_tpu.envs import multi as menv

    num_envs, k_every = 8, 2
    cfg = self_play_config(
        num_envs=num_envs, num_steps=32, num_minibatches=4, update_epochs=2,
        total_timesteps=num_envs * 32 * 5, snapshot_freq=2, pool_size=2,
        opponent_per_env=True, reset_envs_each_update=False,
    )
    env_ids = np.arange(num_envs) % 2
    pool0 = procgen.gen_track_pool_device(jax.random.key(cfg.seed), 2, 12)
    track0 = jtrack.gather_tracks(pool0, env_ids)
    tr = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11),
                         track0)
    seen = []

    def resample(update):
        if update > 0 and update % k_every == 0:
            k = jax.random.fold_in(jax.random.key(cfg.seed), update)
            new = jtrack.gather_tracks(procgen.gen_track_pool_device(k, 2, 12), env_ids)
            seen.append(update)
            return new
        return None

    tr.track_resampler = resample
    info = tr.train()
    assert seen == [2, 4]  # swapped at updates 2 and 4 of 5
    assert not np.allclose(np.asarray(tr.aux["track"].wp_x), np.asarray(track0.wp_x))
    assert np.isfinite(info["rewards"]).all()
    assert int(tr.runner.train.update) == 5


def test_procgen_generalization_eval():
    """Trained agents transfer zero-shot to unseen device-generated tracks."""
    from self_play_racing_tpu.evaluate import evaluate_multi_agent_procgen

    res = evaluate_multi_agent_procgen(
        "models/self_play_agent_scale_1B.npz", num_tracks=4, seed=9,
        max_steps=1200)
    assert res["num_episodes"] == 4
    # the 1B-step agent should complete most unseen tracks without crashing
    assert res["success_rate"] >= 0.5
    assert 0.0 <= res["crash_rate"] <= 0.5


def test_periodic_spline_properties():
    """Periodicity and C1/C2 continuity at the seam — the defining properties of
    the periodic cubic spline, independent of the scipy oracle."""
    closed, t = _closed_polygon(seed=11, n=13)
    tj, yj = jnp.asarray(t), jnp.asarray(closed[:, 0])
    m = procgen.periodic_spline_m(tj, yj)
    # second derivatives close the loop by construction
    np.testing.assert_allclose(float(m[0]), float(m[-1]), rtol=1e-12)

    def ev(x):
        return float(procgen.eval_periodic_spline(tj, yj, m, jnp.asarray([x]))[0])

    T = float(t[-1])
    eps = 1e-6 * T
    # value periodicity at the seam
    np.testing.assert_allclose(ev(0.0), closed[0, 0], atol=1e-9)
    np.testing.assert_allclose(ev(T - eps), ev(0.0), atol=1e-4)
    # C1: one-sided slopes agree across the seam
    d_left = (ev(T - eps) - ev(T - 2 * eps)) / eps
    d_right = (ev(2 * eps) - ev(eps)) / eps
    np.testing.assert_allclose(d_left, d_right, rtol=1e-3, atol=1e-3)
    # C1/C2 at an interior knot
    tk = float(t[5])
    d_l = (ev(tk) - ev(tk - eps)) / eps
    d_r = (ev(tk + eps) - ev(tk)) / eps
    np.testing.assert_allclose(d_l, d_r, rtol=1e-3, atol=1e-3)


def test_scale_resume_mid_period_restores_active_pool(tmp_path):
    """Resuming between resample boundaries must swap to the pool that was
    active at checkpoint time, not keep training on the update-0 pool."""
    from self_play_racing_tpu.train import train_scale

    kw = dict(total_timesteps=8 * 16 * 6, num_envs=8, num_steps=16, num_tracks=2,
              track_points=10, resample_tracks_every=2,
              checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=3,
              out=str(tmp_path / "m.npz"), info_out=str(tmp_path / "i.json"),
              num_minibatches=2, update_epochs=1, seed=1, snapshot_freq=100)
    train_scale(num_updates=4, **kw)  # boundaries swap at updates 2 and 4;
                                      # full checkpoint lands at update 3
    tr = train_scale(num_updates=1, **kw,
                     resume_from=str(tmp_path / "ck" / "checkpoint_update_3"))
    # update 4 (the one trained after resume) runs before the boundary-4 swap,
    # so the active pool must be boundary 2's — keyed fold_in(key(seed), 2)
    expected = jtrack.gather_tracks(
        procgen.gen_track_pool_device(
            jax.random.fold_in(jax.random.key(1), 2), 2, 10),
        np.arange(8) % 2)
    np.testing.assert_array_equal(np.asarray(tr.aux["track"].wp_x),
                                  np.asarray(expected.wp_x))
