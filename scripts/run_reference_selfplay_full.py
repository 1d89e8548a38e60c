"""Resumable full-budget reference self-play run (VERDICT r2 next-round #1).

Runs the in-container reference torch SelfPlayPPO at its own flagship config
(/root/reference/configs/self_play_config.py: 3M steps = 91 updates of 32768)
in a PERSISTENT work dir, leaning on the reference's own checkpoint-every-10
(-updates) + ``train(resume_from=...)`` machinery (self_play_ppo.py:52-68,
96-103, 154-167) so a multi-hour CPU run survives kills: re-invoking this
script resumes from the newest ``models/checkpoint_update_*.pth``.

On completion, merges the reference curve into
``data/learning_curve_parity_selfplay.json`` exactly like
``learning_curve_parity.py --reference-only`` does; run
``learning_curve_parity.py --mode selfplay --skip-reference --updates 91``
afterwards for our side + the plot.

  python scripts/run_reference_selfplay_full.py [--updates 91]
      [--workdir /tmp/ref_selfplay_work] [--harvest-only] [--train-seed N]

``--harvest-only`` reads the newest checkpoint's embedded training_info and
writes the partial curve without training (progress inspection mid-run).

``--train-seed N`` (VERDICT r3 next-round #2, seed-variance bands): keeps the
TRACK POOL and width draws pinned to the parity convention (global seed 1 —
identical envs, so curves stay level-comparable) but hands the trainer
config["seed"]=N, which the reference re-seeds random/np/torch with in
PPO.__init__ (ppo.py:73-75) — varying torch init, env reset seeds (seed+i,
ppo.py:91-93) and opponent selection draws. The curve lands in
``reference_rewards_seed{N}`` instead of ``reference_rewards``; use a per-seed
--workdir.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import random
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(ROOT, "data", "learning_curve_parity_selfplay.json")


def latest_checkpoint(workdir):
    ckpts = glob.glob(os.path.join(workdir, "models", "checkpoint_update_*.pth"))
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: int(re.search(r"_(\d+)\.pth$", p).group(1)))


def merge_reference_curve(steps, rewards, pool_sizes=None, train_seed=None):
    old = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            old = json.load(f)
    key = ("reference_rewards" if train_seed is None
           else f"reference_rewards_seed{train_seed}")
    old.update({"steps": steps, key: rewards})
    if pool_sizes is not None and train_seed is None:
        old["reference_pool_sizes"] = pool_sizes
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(old, f, indent=2)
    print(f"merged reference curve ({len(rewards)} updates) into {OUT_JSON}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--updates", type=int, default=91)
    p.add_argument("--workdir", default="/tmp/ref_selfplay_work")
    p.add_argument("--harvest-only", action="store_true")
    p.add_argument("--train-seed", type=int, default=None,
                   help="vary the trainer seed while keeping the seed-1 track "
                        "pool (seed-variance band runs)")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    if args.harvest_only:
        ck = latest_checkpoint(args.workdir)
        if ck is None:
            print("no checkpoint yet")
            return
        data = torch.load(ck, map_location="cpu", weights_only=False)
        info = data.get("training_info", {})
        print(f"harvest from {ck}: update {data['update']}, "
              f"{len(info.get('rewards', []))} curve points")
        merge_reference_curve(info.get("steps", []), info.get("rewards", []),
                              info.get("opponent_pool_size"),
                              train_seed=args.train_seed)
        return

    sys.path.insert(0, "/root/reference")
    from agent.self_play_ppo import SelfPlayPPO
    from configs.self_play_config import hyperparams_config
    from environment.multi_racing_env import MultiRacingEnv
    from environment.track import gen_tracks

    config = hyperparams_config()
    config["total_timesteps"] = args.updates * config["batch_size"]
    # identical seeding/draw order to learning_curve_parity.run_reference (and
    # the reference's own train.train_multi, train.py:16-63) — this re-runs at
    # process start, so a resumed process rebuilds the identical track pool.
    # The POOL seed stays 1 even under --train-seed: seed-variance runs vary
    # only the training stochasticity, not the task.
    pool_seed = config["seed"]
    random.seed(pool_seed)
    np.random.seed(pool_seed)
    torch.manual_seed(pool_seed)
    pool = gen_tracks(num_tracks=config["num_envs"], seed=pool_seed)
    widths = [np.random.randint(6, 10) for _ in range(config["num_envs"])]
    if args.train_seed is not None:
        # the reference re-seeds random/np/torch from config["seed"] inside
        # PPO.__init__ (ppo.py:73-75) and derives per-env reset seeds seed+i
        # (ppo.py:91-93); everything after this point follows the new seed
        config["seed"] = args.train_seed

    def env_fn(i):
        return MultiRacingEnv(num_agents=2, num_sensors=11, track_pool=pool,
                              track_id=i, track_width=widths)

    os.makedirs(os.path.join(args.workdir, "data"), exist_ok=True)
    os.makedirs(os.path.join(args.workdir, "models"), exist_ok=True)
    os.chdir(args.workdir)

    trainer = SelfPlayPPO(env_fn, config, device="cpu")
    resume = latest_checkpoint(args.workdir)
    if resume:
        print(f"resuming from {resume}")
    trainer.train(resume_from=resume)

    # the reference dumps its curve to data/training_info_self_play_3.json
    # relative to cwd (self_play_ppo.py:180-185)
    with open(os.path.join(args.workdir, "data",
                           "training_info_self_play_3.json")) as f:
        info = json.load(f)
    merge_reference_curve(info["steps"], info["rewards"],
                          info.get("opponent_pool_size"),
                          train_seed=args.train_seed)


if __name__ == "__main__":
    main()
