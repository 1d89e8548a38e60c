"""Opt-in relaxed sensing (sensor LOD): decimated raycast segments.

Default (lod=1) must stay bit-exact reference semantics; lod>1 changes ONLY
the segment arrays the sensors see — waypoints/normals (progress, rewards,
collision) are untouched — and the chord approximation error on observations
must be small relative to track scale.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def _pools(lod):
    np.random.seed(1)
    cps = trk.gen_tracks(4, seed=1)
    widths = [7.0, 8.0, 9.0, 6.0]
    np.random.seed(1)
    exact = trk.make_track_pool(cps, widths)
    np.random.seed(1)
    relaxed = trk.make_track_pool(cps, widths, sensor_lod=lod)
    return exact, relaxed


def test_lod1_is_identity():
    exact, relaxed = _pools(1)
    for a, b in zip(jax.tree.leaves(exact), jax.tree.leaves(relaxed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lod_shrinks_only_segments():
    exact, relaxed = _pools(4)
    assert relaxed.seg_sx.shape[-1] < exact.seg_sx.shape[-1]
    # everything except seg_* is untouched: progress/reward machinery exact
    for name in ("wp_x", "wp_y", "nrm_x", "nrm_y", "n_wp", "track_width",
                 "max_track_distance", "start_x", "start_y", "start_angle"):
        np.testing.assert_array_equal(np.asarray(getattr(exact, name)),
                                      np.asarray(getattr(relaxed, name)))


def test_lod_observation_error_is_small():
    """Rays against the LOD boundary stay close to exact in distribution. The
    outward-offset chords bound the TYPICAL error by the local sagitta
    (sub-unit vs 6-10 unit track widths); rays near-tangent to a wall are
    inherently chaotic under any coarsening (a grazing hit can become a miss),
    so the contract is quantile-based: the error mass must be tiny, with only
    a grazing tail allowed."""
    exact, relaxed = _pools(4)
    n = 64
    cfg = senv.RacingConfig(num_sensors=11)
    te = trk.gather_tracks(exact, np.arange(n) % 4)
    tr_ = trk.gather_tracks(relaxed, np.arange(n) % 4)
    state, _ = jax.jit(lambda t: senv.reset(cfg, t))(te)
    rng = np.random.RandomState(0)
    se = state
    step = jax.jit(lambda t, s, a: senv.step(cfg, t, s, a))
    obs_fn = jax.jit(lambda t, s: senv.observe(cfg, t, s))
    errs = []
    for _ in range(50):
        a = jnp.asarray(rng.uniform([-1, 0], [1, 1], (n, 2)), jnp.float32)
        se, obs_e, *_ = step(te, se, a)
        obs_r = obs_fn(tr_, se)  # same states, relaxed sensors
        errs.append(np.abs(np.asarray(obs_e[:, :11] - obs_r[:, :11])) * 50.0)
    errs = np.concatenate([e.ravel() for e in errs])
    mean, p99, frac_big = errs.mean(), np.percentile(errs, 99), (errs > 2).mean()
    assert mean < 0.2, f"mean LOD ray error {mean:.3f} units"
    assert p99 < 2.0, f"p99 LOD ray error {p99:.3f} units"
    assert frac_big < 0.01, f"{frac_big:.2%} of rays off by >2 units (grazing tail)"


def test_device_procgen_lod_matches_host_decimation():
    """The on-device chord decimation (procgen.build_track_arrays sensor_lod)
    must match the host _decimate_boundary construction on the same boundary
    to f32 tolerance, so --sensor-lod composes with --resample-tracks-every."""
    import jax.numpy as jnp

    from self_play_racing_tpu.envs import procgen as pg
    from self_play_racing_tpu.envs.track import _decimate_boundary

    key = jax.random.key(3)
    exact = pg.gen_track_pool_device(key, 2, num_points=12)
    relaxed = pg.gen_track_pool_device(key, 2, num_points=12, sensor_lod=4)
    n = int(exact.n_wp[0])
    assert relaxed.seg_sx.shape[-1] < exact.seg_sx.shape[-1]
    # waypoints/normals untouched
    np.testing.assert_array_equal(np.asarray(exact.wp_x), np.asarray(relaxed.wp_x))

    for tr in range(2):
        left = np.stack([np.asarray(exact.seg_sx[tr][:n]),
                         np.asarray(exact.seg_sy[tr][:n])], -1)
        nrm = np.stack([np.asarray(exact.nrm_x[tr][:n]),
                        np.asarray(exact.nrm_y[tr][:n])], -1)
        host = _decimate_boundary(left.astype(np.float64),
                                  nrm.astype(np.float64), 4)
        m = len(host)
        dev_x = np.asarray(relaxed.seg_sx[tr][:m])
        np.testing.assert_allclose(dev_x, host[:, 0], rtol=0, atol=2e-3)


def test_scale_resample_with_lod_trains():
    from self_play_racing_tpu.train import train_scale

    tr = train_scale(total_timesteps=8 * 16 * 2, num_envs=8, num_steps=16,
                     num_tracks=2, resample_tracks_every=1, sensor_lod=4,
                     out="/tmp/lodres.npz", info_out="/tmp/lodres.json",
                     checkpoint_dir=None, num_minibatches=2, update_epochs=2)
    assert int(tr.runner.train.update) == 2


def test_clamp_sensor_range_bounds_reads():
    """clamp_sensor_range: every ray obs <= 1.0 (range-normalized); default
    (False) preserves the unclamped-hit quirk (reads beyond max range pass
    through, track.py:199). Non-ray features are untouched."""
    exact, relaxed = _pools(4)
    n = 32
    te = trk.gather_tracks(relaxed, np.arange(n) % 4)
    cfg = senv.RacingConfig(num_sensors=11)
    cfg_c = senv.RacingConfig(num_sensors=11, clamp_sensor_range=True)
    state = senv.reset_state(cfg, te)
    rng = np.random.RandomState(0)
    step = jax.jit(lambda t, s, a: senv.step(cfg, t, s, a))
    obs_fn = jax.jit(lambda t, s: senv.observe(cfg, t, s))
    obs_fn_c = jax.jit(lambda t, s: senv.observe(cfg_c, t, s))
    se = state
    saw_over = False
    for _ in range(60):
        a = jnp.asarray(rng.uniform([-1, 0], [1, 1], (n, 2)), jnp.float32)
        se, *_ = step(te, se, a)
        obs = obs_fn(te, se)
        obs_c = obs_fn_c(te, se)
        rays, rays_c = np.asarray(obs[:, :11]), np.asarray(obs_c[:, :11])
        assert (rays_c <= 1.0 + 1e-6).all()
        np.testing.assert_array_equal(np.minimum(rays, 1.0), rays_c)
        np.testing.assert_array_equal(np.asarray(obs[:, 11:]),
                                      np.asarray(obs_c[:, 11:]))
        saw_over = saw_over or (rays > 1.0).any()
    assert saw_over  # the quirk actually fires on these tracks
