"""Head-to-head learning-curve parity: reference torch PPO vs this framework.

Runs both trainers at the identical config (16 envs, 2048-step rollouts, seed 1,
the same gen_tracks(16, seed=1) pool + width draws, anneals over the same
NUM_UPDATES) and writes mean-episode-reward-per-update curves to
data/learning_curve_parity.json + static/learning_curve_parity.png.

The RNG streams differ by construction (torch sampling vs jax.random), so parity
is statistical: the curves should track within seed-level variance (SURVEY §7).

  python scripts/learning_curve_parity.py --updates 12
  python scripts/learning_curve_parity.py --updates 12 --skip-reference
      # reuse the reference curve already in data/learning_curve_parity.json
      # (the reference implementation is frozen; only our side changed)

The reference side steps 16 Python envs serially (~550 s for 12 updates on CPU);
our side takes ~30 s on one TPU chip including compilation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_JSON = os.path.join(ROOT, "data", "learning_curve_parity.json")
OUT_PNG = os.path.join(ROOT, "static", "learning_curve_parity.png")


def run_ours(updates: int):
    import numpy as np
    from self_play_racing_tpu.agent.trainer import PPOTrainer
    from self_play_racing_tpu.configs import base_config
    from self_play_racing_tpu.envs import single as senv
    from self_play_racing_tpu.train import _seed_all, make_training_pool

    cfg = base_config(total_timesteps=updates * 16 * 2048)
    _seed_all(cfg.seed)
    track = make_training_pool(cfg)
    trainer = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    info = trainer.train()
    return info["steps"], info["rewards"]


def run_reference(updates: int):
    """Reference torch PPO at the same config; per-update mean episode reward."""
    import random

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from agent.ppo import PPO as RefPPO
    from configs.base_config import hyperparams_config as ref_base_config
    from environment.racing_env import RacingEnv as RefRacingEnv
    from environment.track import gen_tracks as ref_gen_tracks

    config = ref_base_config()
    config["total_timesteps"] = updates * config["batch_size"]
    random.seed(config["seed"])
    np.random.seed(config["seed"])
    torch.manual_seed(config["seed"])
    pool = ref_gen_tracks(num_tracks=config["num_envs"], seed=config["seed"])
    widths = [np.random.randint(6, 10) for _ in range(config["num_envs"])]

    def env_fn(i):
        return RefRacingEnv(num_sensors=11, track_pool=pool, track_id=i,
                            track_width=widths[i])

    trainer = RefPPO(env_fn, config, device="cpu")
    # RefPPO.train writes its curve to data/training_info_single_3.json
    # (ppo.py:284); run it in a temp cwd and read that file back.
    cwd = os.getcwd()
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "data"))
        os.chdir(td)
        try:
            trainer.train()
            with open("data/training_info_single_3.json") as f:
                info = json.load(f)
        finally:
            os.chdir(cwd)
    return info["steps"], info["rewards"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--updates", type=int, default=12)
    p.add_argument("--skip-reference", action="store_true",
                   help="reuse the reference curve from the existing json")
    p.add_argument("--reference-only", action="store_true",
                   help="run only the (slow, CPU) reference side and update the json")
    args = p.parse_args(argv)

    if args.reference_only:
        ref_steps, ref_rewards = run_reference(args.updates)
        old = {}
        if os.path.exists(OUT_JSON):
            with open(OUT_JSON) as f:
                old = json.load(f)
        old.update({"steps": ref_steps, "reference_rewards": ref_rewards})
        with open(OUT_JSON, "w") as f:
            json.dump(old, f, indent=2)
        print(f"wrote reference curve to {OUT_JSON}; "
              "now run with --skip-reference for our side + the plot")
        return

    if args.skip_reference:
        with open(OUT_JSON) as f:
            old = json.load(f)
        ref_steps, ref_rewards = old["steps"], old["reference_rewards"]
        assert len(ref_rewards) == args.updates, \
            f"existing reference curve has {len(ref_rewards)} updates"
    else:
        ref_steps, ref_rewards = run_reference(args.updates)

    our_steps, our_rewards = run_ours(args.updates)

    payload = {
        "description": (
            f"{args.updates}-update head-to-head at the identical reference config "
            "(16 envs, 2048 steps, seed 1, same track pool): mean episode reward "
            "per update. Reference = original torch implementation run in this "
            "container (CPU); ours = TPU-native framework (one v5e chip). "
            "Generated by scripts/learning_curve_parity.py."
        ),
        "steps": ref_steps,
        "reference_rewards": ref_rewards,
        "ours_rewards": our_rewards,
    }
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {OUT_JSON}")
    print(f"final rewards: reference {ref_rewards[-1]:.0f} vs ours {our_rewards[-1]:.0f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(ref_steps, ref_rewards, "o-", label="reference (torch, CPU)")
    ax.plot(our_steps, our_rewards, "s-", label="ours (JAX, TPU)")
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episode reward")
    ax.set_title("Learning-curve parity: identical config, seed-level variance")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(OUT_PNG), exist_ok=True)
    fig.savefig(OUT_PNG, dpi=150)
    print(f"wrote {OUT_PNG}")


if __name__ == "__main__":
    main()
