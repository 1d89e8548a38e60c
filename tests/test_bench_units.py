"""Units of the driver's benchmark instrument (bench.py) that must not rot:
the analytic flop count scales with the real padded shapes it reads."""
import sys
import os

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import rollout_flop_count
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk


def test_rollout_flop_count_tracks_shapes():
    pool = trk.make_track_pool([trk.gen_random_track(12, 60, 15, 0.4, 0.5, seed=1)],
                               [7.0], dtype=jnp.float32)
    track = trk.gather_tracks(pool, [0, 0])
    r11 = senv.RacingConfig(num_sensors=11)
    total, parts = rollout_flop_count(r11, track)
    assert total == sum(parts.values())
    s = track.seg_sx.shape[-1]
    w = track.wp_x.shape[-1]
    assert parts["raycast"] == 11 * s * 11 + s * 5
    assert parts["track_query"] == 5 * w * 10

    # sensors double -> the ray-dependent raycast term doubles exactly
    r22 = senv.RacingConfig(num_sensors=22)
    _, parts22 = rollout_flop_count(r22, track)
    assert parts22["raycast"] - s * 5 == 2 * (parts["raycast"] - s * 5)
    # wider obs -> more MLP flops
    assert parts22["mlp"] > parts["mlp"]


def test_resolve_roofline_calibration_logic(tmp_path, monkeypatch):
    """Calibrated denominator of record; >5% upward drift adopts the
    measurement; downward drift only reports (VERDICT r3 #4)."""
    import json

    import bench

    calib_file = tmp_path / "cal.json"
    monkeypatch.setattr(bench, "CALIBRATION_PATH", str(calib_file))

    # no calibration file -> measured passes through
    v, src, drift = bench.resolve_roofline(4.0e12)
    assert v == 4.0e12 and "no calibration" in src and drift is None

    calib_file.write_text(json.dumps({"vpu_fma_flops_per_s": 4.2e12}))
    # small downward drift -> calibrated value wins, drift reported
    v, src, drift = bench.resolve_roofline(3.0e12)
    assert v == 4.2e12 and src == "calibrated" and drift < 0

    # measurement exceeding calibration by >5% -> adopted
    v, src, drift = bench.resolve_roofline(4.6e12)
    assert v == 4.6e12 and "exceeds" in src and drift > 0.05

    # failed measurement -> calibrated fallback
    v, src, drift = bench.resolve_roofline(None)
    assert v == 4.2e12 and "failed" in src
