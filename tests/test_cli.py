"""CLI entry-point tests: argument plumbing through train/evaluate mains.

The trainers themselves are covered by test_train_smoke/test_selfplay_parity;
these check that the command-line layer (reference train.py:190-193 /
evaluate.py:173-238 equivalents) wires overrides, outputs, and model loading.
"""
import json
import os

import numpy as np
import pytest

from self_play_racing_tpu import evaluate as eval_mod
from self_play_racing_tpu import train as train_mod


@pytest.fixture()
def run_dir(tmp_path, monkeypatch):
    """Entry points write models/ and data/ relative to cwd."""
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_train_single_cli(run_dir):
    train_mod.main(["single", "--num-envs", "4",
                    "--total-timesteps", str(4 * 2048),
                    "--num-updates", "1", "--seed", "3"])
    assert os.path.exists("models/single_agent.npz")
    with open("data/training_info_single.json") as f:
        info = json.load(f)
    assert set(info) >= {"steps", "rewards"}


def test_train_multi_cli_and_evaluate_cli(run_dir):
    train_mod.main(["multi", "--num-envs", "4",
                    "--total-timesteps", str(4 * 2048),
                    "--num-updates", "1"])
    model = "models/self_play_agent.npz"
    assert os.path.exists(model)

    eval_mod.main(["--multi", model, "--num-tracks", "2", "--num-runs", "1"])
    out = "data/eval_info_self_play.json"
    assert os.path.exists(out)
    with open(out) as f:
        results = json.load(f)
    # the aggregation contract of evaluate.py:39-64
    assert set(results) >= {"success_rate", "crash_rate", "avg_speed",
                            "avg_distance", "avg_steps_per_progress"}
    assert len(results["all_episodes"]) == 2  # 2 tracks x 1 run
    assert os.path.exists("static/eval_comparison.png")


def test_evaluate_cli_requires_a_model():
    with pytest.raises(SystemExit):
        eval_mod.main([])


def test_adapter_evaluator_matches_grid_contract():
    """The host-loop evaluator (SB3 path minus SB3): same grid quirks, same
    aggregation keys, drives the gym adapter with a plain predict callable."""
    import numpy as np
    from self_play_racing_tpu.evaluate import evaluate_adapter_agent_overall

    rng = np.random.RandomState(0)

    def predict(obs):
        return rng.uniform([-1, 0], [1, 1]).astype(np.float32)

    results = evaluate_adapter_agent_overall(predict, num_tracks=2, num_runs=2,
                                             seed=42, max_steps=200)
    assert results["num_episodes"] == 4
    assert set(results) >= {"success_rate", "crash_rate", "avg_speed",
                            "avg_distance", "avg_steps_per_progress",
                            "all_episodes"}
    # random policies crash: every episode must report a terminal state
    for ep in results["all_episodes"]:
        assert ep["crashed"] or ep["finished"] or ep["steps"] == 200


def test_sb3_evaluator_gate(tmp_path):
    """Without stable_baselines3 installed, the SB3 leg runs through the
    vendored compat PPO (interop/sb3_compat.py) rather than exiting: missing
    checkpoints surface as FileNotFoundError (no double .zip suffixing), and
    foreign torch files are rejected with a message naming the real dep."""
    import importlib.util

    if importlib.util.find_spec("stable_baselines3") is not None:
        pytest.skip("real stable_baselines3 installed; compat gate not in play")
    torch = pytest.importorskip("torch")

    from self_play_racing_tpu.evaluate import evaluate_sb3_agent_overall

    with pytest.raises(FileNotFoundError, match=r"nonexistent\.zip'"):
        evaluate_sb3_agent_overall("nonexistent.zip", 1, 1)
    with pytest.raises(FileNotFoundError, match=r"nonexistent\.zip'"):
        evaluate_sb3_agent_overall("nonexistent", 1, 1)  # suffix retry path

    foreign = tmp_path / "foreign.zip"
    torch.save({"not_sb3_compat": True}, str(foreign))
    with pytest.raises(ValueError, match="stable_baselines3"):
        evaluate_sb3_agent_overall(str(foreign), 1, 1)
