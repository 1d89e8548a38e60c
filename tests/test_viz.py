"""Visualization subsystem: trajectory recording, mp4 rendering, grid composition,
learning-curve plot — all headless."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.utils import viz

cv2 = pytest.importorskip("cv2")
pytest.importorskip("pygame")


@pytest.fixture(scope="module")
def setup():
    cps = [trk.gen_random_track(11, 55, 12, 0.3, 0.5, seed=4)]
    geometry = trk.build_track_geometry(cps[0], 8.0)
    pool = trk.make_track_pool(cps, [8.0])
    track = trk.gather_tracks(pool, [0])
    return cps, geometry, track


def test_record_and_render_single(setup, tmp_path):
    cps, geometry, track = setup
    env_cfg = senv.RacingConfig(num_sensors=11)
    params = net.init_params(jax.random.key(0), env_cfg.obs_dim, 2)
    log_std = jnp.full((2,), -0.7, jnp.float32)
    traj = viz.record_trajectory_single(params, log_std, env_cfg, track,
                                        jax.random.key(1), max_steps=120)
    assert 1 <= len(traj["x"]) <= 120
    out = str(tmp_path / "single.mp4")
    frames = viz.render_video(geometry, traj, out, label="test", frame_skip=4)
    assert frames > 0 and os.path.getsize(out) > 1000
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    assert ok and frame.shape == (600, 800, 3)
    assert frame.sum() > 0  # not a black frame
    cap.release()


def test_record_and_render_multi_plus_grid(setup, tmp_path):
    cps, geometry, track = setup
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    params = net.init_params(jax.random.key(0), env_cfg.obs_dim, 2)
    log_std = jnp.full((2,), -0.7, jnp.float32)
    traj = viz.record_trajectory_multi(params, log_std, env_cfg, track,
                                       jax.random.key(1), max_steps=100)
    assert traj["x"].shape[1] == 2
    v1 = str(tmp_path / "multi.mp4")
    viz.render_video(geometry, traj, v1, label="multi", frame_skip=4)

    grid = str(tmp_path / "grid.mp4")
    n = viz.visualization_grid([v1, v1, v1, v1], ["a", "b", "c", "d"], grid)
    assert n > 0 and os.path.getsize(grid) > 1000


def test_recorded_trajectory_has_no_phantom_terminal_row(setup):
    """Every returned row must come from an active step: the row after the done
    step re-steps the frozen terminal state (re-firing the crash penalty), so it
    must be trimmed. A random-ish policy crashes well before max_steps here."""
    cps, geometry, track = setup
    env_cfg = senv.RacingConfig(num_sensors=11)
    params = net.init_params(jax.random.key(0), env_cfg.obs_dim, 2)
    log_std = jnp.full((2,), 0.5, jnp.float32)  # noisy -> crashes quickly
    traj = viz.record_trajectory_single(params, log_std, env_cfg, track,
                                        jax.random.key(3), max_steps=500,
                                        deterministic=False)
    assert len(traj["x"]) < 500  # episode actually ended
    assert traj["active"].all()
    # the crash penalty appears at most once (it would repeat on phantom rows)
    assert (traj["reward"] < -30).sum() <= 1


def test_render_video_hud_reward_counts_skipped_frames(setup, tmp_path):
    """frame_skip > 1 must not drop skipped steps' rewards from the HUD total —
    exercised by rendering with skip 5 (the cumulative total is internal, so this
    is a smoke check that the cumsum path handles [T] and [T, A] shapes)."""
    cps, geometry, track = setup
    T = 23
    traj = {
        "x": np.linspace(0, 5, T), "y": np.zeros(T), "angle": np.zeros(T),
        "speed": np.ones(T), "progress": np.linspace(0, 0.2, T),
        "reward": np.ones(T),
    }
    out = str(tmp_path / "skip.mp4")
    frames = viz.render_video(geometry, traj, out, frame_skip=5)
    assert frames == (T + 4) // 5 and os.path.getsize(out) > 1000


def test_eval_training_plot(tmp_path):
    for name in ("a", "b"):
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump({"steps": list(range(0, 1000, 100)),
                       "rewards": list(np.random.randn(10))}, f)
    out = str(tmp_path / "curves.png")
    viz.eval_training({"A": str(tmp_path / "a.json"), "B": str(tmp_path / "b.json")}, out)
    assert os.path.getsize(out) > 1000


def test_record_and_render_match(setup, tmp_path):
    """Per-seat match recording (one policy per car) renders like any multi traj."""
    cps, geometry, track = setup
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)
    bundles = [
        (net.init_params(jax.random.key(s), env_cfg.obs_dim, 2),
         jnp.full((2,), -0.7, jnp.float32), None)
        for s in (0, 1)
    ]
    traj = viz.record_trajectory_match(bundles, env_cfg, track, jax.random.key(2),
                                       max_steps=120, deterministic=True)
    assert 1 <= len(traj["x"]) <= 120
    assert traj["x"].shape[1] == 2  # both seats recorded
    out = str(tmp_path / "match.mp4")
    frames = viz.render_video(geometry, traj, out, label="a vs b", frame_skip=4)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == frames
    cap.release()

    # seats act differently: distinct policies should diverge within the episode
    if len(traj["x"]) > 10:
        assert not np.allclose(traj["x"][:, 0], traj["x"][:, 1])
