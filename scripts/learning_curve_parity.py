"""Head-to-head learning-curve parity: reference torch PPO vs this framework.

Runs both trainers at the identical config (16 envs, 2048-step rollouts, seed 1,
the same gen_tracks(16, seed=1) pool + width draws, anneals over the same
NUM_UPDATES) and writes mean-episode-reward-per-update curves to
data/learning_curve_parity[_selfplay].json + static/learning_curve_parity[_selfplay].png.

The RNG streams differ by construction (torch sampling vs jax.random), so parity
is statistical: the curves should track within seed-level variance (SURVEY §7).

  python scripts/learning_curve_parity.py --updates 12
  python scripts/learning_curve_parity.py --mode selfplay --updates 12
  python scripts/learning_curve_parity.py --updates 12 --skip-reference
      # reuse the reference curve already in the json
      # (the reference implementation is frozen; only our side changed)
  python scripts/learning_curve_parity.py --reference-only --updates 152
      # run only the (slow, CPU) reference side and stash its curve

The reference side steps 16 Python envs serially (~550 s for 12 single-agent
updates on CPU; self-play is slower — per-env opponent inference); our side takes
~30 s on one TPU chip including compilation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def out_paths(mode: str):
    suffix = "" if mode == "single" else "_selfplay"
    return (os.path.join(ROOT, "data", f"learning_curve_parity{suffix}.json"),
            os.path.join(ROOT, "static", f"learning_curve_parity{suffix}.png"))


def run_ours(mode: str, updates: int):
    from self_play_racing_tpu.train import _seed_all, make_training_pool

    if mode == "single":
        from self_play_racing_tpu.agent.trainer import PPOTrainer
        from self_play_racing_tpu.configs import base_config
        from self_play_racing_tpu.envs import single as senv

        cfg = base_config(total_timesteps=updates * 16 * 2048)
        _seed_all(cfg.seed)
        track = make_training_pool(cfg)
        trainer = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    else:
        from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
        from self_play_racing_tpu.configs import self_play_config
        from self_play_racing_tpu.envs import multi as menv

        # parity settings are the self_play_config defaults: one opponent per
        # update shared across envs, forced env resets each update (quirk #7)
        cfg = self_play_config(total_timesteps=updates * 16 * 2048)
        _seed_all(cfg.seed)
        track = make_training_pool(cfg)
        trainer = SelfPlayTrainer(
            cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11), track)
    info = trainer.train()
    return info["steps"], info["rewards"]


def run_reference(mode: str, updates: int):
    """Reference torch trainer at the same config; per-update mean episode reward."""
    import random
    import tempfile

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from environment.track import gen_tracks as ref_gen_tracks

    if mode == "single":
        from agent.ppo import PPO as RefTrainer
        from configs.base_config import hyperparams_config as ref_config_fn
        from environment.racing_env import RacingEnv as RefRacingEnv
    else:
        from agent.self_play_ppo import SelfPlayPPO as RefTrainer
        from configs.self_play_config import hyperparams_config as ref_config_fn
        from environment.multi_racing_env import MultiRacingEnv as RefMultiEnv

    config = ref_config_fn()
    config["total_timesteps"] = updates * config["batch_size"]
    random.seed(config["seed"])
    np.random.seed(config["seed"])
    torch.manual_seed(config["seed"])
    pool = ref_gen_tracks(num_tracks=config["num_envs"], seed=config["seed"])
    widths = [np.random.randint(6, 10) for _ in range(config["num_envs"])]

    if mode == "single":
        def env_fn(i):
            return RefRacingEnv(num_sensors=11, track_pool=pool, track_id=i,
                                track_width=widths[i])
        info_file = "data/training_info_single_3.json"
    else:
        # train.py:47-49: widths passed as the full list, indexed by track_id
        def env_fn(i):
            return RefMultiEnv(num_agents=2, num_sensors=11, track_pool=pool,
                               track_id=i, track_width=widths)
        info_file = "data/training_info_self_play_3.json"

    trainer = RefTrainer(env_fn, config, device="cpu")
    # The reference writes its curve (and, for self-play, periodic checkpoints)
    # to relative paths (ppo.py:284, self_play_ppo.py:165); run it in a temp cwd.
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "data"))
        os.makedirs(os.path.join(td, "models"))
        os.chdir(td)
        try:
            trainer.train()
            with open(info_file) as f:
                info = json.load(f)
        finally:
            os.chdir(cwd)
    return info["steps"], info["rewards"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["single", "selfplay"], default="single")
    p.add_argument("--updates", type=int, default=12)
    p.add_argument("--skip-reference", action="store_true",
                   help="reuse the reference curve from the existing json")
    p.add_argument("--reference-only", action="store_true",
                   help="run only the (slow, CPU) reference side and update the json")
    args = p.parse_args(argv)
    out_json, out_png = out_paths(args.mode)

    if args.reference_only:
        ref_steps, ref_rewards = run_reference(args.mode, args.updates)
        old = {}
        if os.path.exists(out_json):
            with open(out_json) as f:
                old = json.load(f)
        old.update({"steps": ref_steps, "reference_rewards": ref_rewards})
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(old, f, indent=2)
        print(f"wrote reference curve to {out_json}; "
              "now run with --skip-reference for our side + the plot")
        return

    if args.skip_reference:
        with open(out_json) as f:
            old = json.load(f)
        ref_steps, ref_rewards = old["steps"], old["reference_rewards"]
        # updates with zero completed episodes are skipped in the curve, so the
        # stored curve may be shorter than --updates
        assert len(ref_rewards) <= args.updates, \
            f"existing reference curve has {len(ref_rewards)} updates"
    else:
        ref_steps, ref_rewards = run_reference(args.mode, args.updates)

    our_steps, our_rewards = run_ours(args.mode, args.updates)

    payload = {
        "description": (
            f"{args.updates}-update head-to-head at the identical reference "
            f"{args.mode} config (16 envs, 2048 steps, seed 1, same track pool): "
            "mean episode reward per update. Reference = original torch "
            "implementation run in this container (CPU); ours = TPU-native "
            "framework (one v5e chip). Generated by "
            "scripts/learning_curve_parity.py."
        ),
        "steps": ref_steps,
        "reference_rewards": ref_rewards,
        "ours_steps": our_steps,
        "ours_rewards": our_rewards,
    }
    # preserve side-channel keys stashed by --reference-only runs (pool sizes)
    if os.path.exists(out_json):
        with open(out_json) as f:
            prev = json.load(f)
        for k in ("reference_pool_sizes",):
            if k in prev:
                payload[k] = prev[k]

    # parity statistic: mean absolute pointwise gap over the converged
    # (second) half of the curve, relative to the reference's mean level there
    m = min(len(ref_rewards), len(our_rewards))
    if m >= 4:
        h = m // 2
        import numpy as _np

        r = _np.asarray(ref_rewards[h:m], float)
        o = _np.asarray(our_rewards[h:m], float)
        gap = float(_np.mean(_np.abs(o - r)) / max(abs(_np.mean(r)), 1e-9))
        payload["mean_abs_gap_converged_half"] = gap
        print(f"mean abs gap over converged half ({m - h} updates): {gap:.1%}")
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_json}")
    print(f"final rewards: reference {ref_rewards[-1]:.0f} vs ours {our_rewards[-1]:.0f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(ref_steps, ref_rewards, "o-", label="reference (torch, CPU)", ms=3)
    ax.plot(our_steps, our_rewards, "s-", label="ours (JAX, TPU)", ms=3)
    if args.mode == "selfplay":
        # snapshot cadence (self_play_ppo.py:113-122): pool grows every 15
        # updates to 5, then the oldest member is evicted
        batch = 32768
        for u in range(15, args.updates, 15):
            filled = u // 15
            ax.axvline(u * batch, color="gray", ls=":", lw=0.8)
            label = (f"snap {filled}" if filled <= 5
                     else f"snap {filled} (evict)")
            ax.annotate(label, (u * batch, ax.get_ylim()[0]), fontsize=6,
                        rotation=90, va="bottom", ha="right", color="gray")
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episode reward")
    title_mode = "single-agent" if args.mode == "single" else "self-play"
    gap_note = (f" | converged-half gap "
                f"{payload['mean_abs_gap_converged_half']:.1%}"
                if "mean_abs_gap_converged_half" in payload else "")
    ax.set_title(f"Learning-curve parity ({title_mode}): identical config, "
                 f"seed-level variance{gap_note}")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    fig.savefig(out_png, dpi=150)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
