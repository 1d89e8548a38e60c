"""Seed-variance bands for the learning-curve parity claims (VERDICT r3 #2).

The north-star asks our curves to sit "within seed variance" of the reference's;
rounds 1-3 compared one seed against one seed and judged the gap against the
reference's *adjacent-update swing* (temporal noise — a proxy). This script
produces the real statistic:

- OUR side: the full-budget single-agent (5M steps / 152 updates) and self-play
  (3M / 91 updates) legs at ≥3 training seeds, with the TRACK POOL PINNED to
  the seed-1 parity pool (identical envs — the seed varies only weight init,
  action sampling, env-reset and opponent-draw streams, exactly what
  run_reference_selfplay_full.py --train-seed varies on the torch side).
- The cross-seed σ of the converged-half mean (the statistic the 4.0% / 8.7%
  level gaps are quoted on) lands in data/learning_curve_parity*.json under
  "seed_band"; per-seed curves under "ours_rewards_seed{N}".

Reference torch seeds run separately (hours on CPU):
  python scripts/run_reference_selfplay_full.py --train-seed N --workdir ...
and merge into the same json as "reference_rewards_seed{N}"; re-running this
script afterwards recomputes the bands including the reference side.

  python scripts/seed_variance.py --mode selfplay --seeds 1 2 3
  python scripts/seed_variance.py --mode single --seeds 1 2 3 [--updates 152]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def out_path(mode: str) -> str:
    suffix = "" if mode == "single" else "_selfplay"
    return os.path.join(ROOT, "data", f"learning_curve_parity{suffix}.json")


def pinned_parity_pool(dtype):
    """The seed-1 parity track pool + widths, independent of the train seed
    (identical construction to train.py:make_training_pool under _seed_all(1) —
    reference train.py:28-31 draw order)."""
    import jax.numpy as jnp  # noqa: F401  (dtype arg is a jnp dtype)

    from self_play_racing_tpu.envs import track as trk
    from self_play_racing_tpu.train import _seed_all

    _seed_all(1)
    cps = trk.gen_tracks(num_tracks=16, seed=1)
    widths = [float(np.random.randint(6, 10)) for _ in range(16)]
    pool = trk.make_track_pool(cps, widths, dtype=dtype)
    return trk.gather_tracks(pool, np.arange(16))


def run_seed(mode: str, seed: int, updates: int):
    import jax.numpy as jnp

    from self_play_racing_tpu.train import _seed_all

    if mode == "single":
        from self_play_racing_tpu.agent.trainer import PPOTrainer
        from self_play_racing_tpu.configs import base_config
        from self_play_racing_tpu.envs import single as senv

        cfg = base_config(total_timesteps=updates * 16 * 2048, seed=seed)
        track = pinned_parity_pool(jnp.float32)
        _seed_all(seed)
        trainer = PPOTrainer(cfg, senv.RacingConfig(num_sensors=11), track)
    else:
        from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
        from self_play_racing_tpu.configs import self_play_config
        from self_play_racing_tpu.envs import multi as menv

        cfg = self_play_config(total_timesteps=updates * 16 * 2048, seed=seed)
        track = pinned_parity_pool(jnp.float32)
        _seed_all(seed)
        trainer = SelfPlayTrainer(
            cfg, menv.MultiRacingConfig(num_agents=2, num_sensors=11), track)
    info = trainer.train()
    return info["steps"], info["rewards"]


def converged_half_mean(rewards):
    r = np.asarray(rewards, float)
    return float(r[len(r) // 2:].mean()) if len(r) >= 4 else float("nan")


def recompute_band(data):
    """Cross-seed statistics for both sides from whatever seeds are present."""
    ours = {k: v for k, v in data.items() if k.startswith("ours_rewards_seed")}
    refs = {k: v for k, v in data.items()
            if k.startswith("reference_rewards_seed")}
    if "reference_rewards" in data:
        refs.setdefault("reference_rewards_seed1", data["reference_rewards"])
    if "ours_rewards" in data:
        ours.setdefault("ours_rewards_seed1", data["ours_rewards"])

    band = {}
    for label, curves in (("ours", ours), ("reference", refs)):
        means = {k.rsplit("seed", 1)[1]: converged_half_mean(v)
                 for k, v in sorted(curves.items())}
        vals = [v for v in means.values() if np.isfinite(v)]
        band[label] = {
            "converged_half_means_by_seed": means,
            "n_seeds": len(vals),
            "mean": float(np.mean(vals)) if vals else None,
            "std": float(np.std(vals, ddof=1)) if len(vals) >= 2 else None,
        }
    o, r = band["ours"], band["reference"]
    if o["mean"] is not None and r["mean"] is not None:
        gap = abs(o["mean"] - r["mean"]) / max(abs(r["mean"]), 1e-9)
        band["level_gap_of_seed_means"] = float(gap)
        sigmas = [s for s in (o["std"], r["std"]) if s]
        if sigmas:
            sigma = float(np.sqrt(np.mean([s * s for s in sigmas])))
            band["gap_over_sigma"] = float(
                abs(o["mean"] - r["mean"]) / sigma) if sigma else None
    return band


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["single", "selfplay"], default="selfplay")
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--updates", type=int, default=None,
                   help="default: 152 (single) / 91 (selfplay) — the full "
                        "reference budgets")
    p.add_argument("--band-only", action="store_true",
                   help="recompute the band from curves already in the json "
                        "(no training)")
    args = p.parse_args(argv)
    updates = args.updates or (152 if args.mode == "single" else 91)
    path = out_path(args.mode)
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)

    if not args.band_only:
        for seed in args.seeds:
            key = f"ours_rewards_seed{seed}"
            if key in data:
                print(f"{key}: already present, skipping")
                continue
            print(f"training {args.mode} seed {seed} ({updates} updates)...")
            steps, rewards = run_seed(args.mode, seed, updates)
            data[key] = rewards
            data.setdefault("ours_steps", steps)
            with open(path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"  converged-half mean: {converged_half_mean(rewards):.1f}")

    data["seed_band"] = recompute_band(data)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data["seed_band"], indent=2))
    print(f"wrote {path}")
    plot_band(args.mode, data)


def plot_band(mode: str, data: dict):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    steps = data.get("ours_steps") or data.get("steps")
    for k in sorted(data):
        if k.startswith("ours_rewards_seed"):
            r = data[k]
            ax.plot(steps[: len(r)] if steps else range(len(r)), r, "-",
                    lw=1.0, alpha=0.8, color="tab:orange",
                    label=f"ours seed {k.rsplit('seed', 1)[1]}")
    rsteps = data.get("steps")
    if "reference_rewards" in data:
        r = data["reference_rewards"]
        ax.plot(rsteps[: len(r)] if rsteps else range(len(r)), r, "-",
                lw=1.6, color="tab:blue", label="reference seed 1")
    for k in sorted(data):
        if k.startswith("reference_rewards_seed"):
            r = data[k]
            ax.plot(rsteps[: len(r)] if rsteps else range(len(r)), r, "--",
                    lw=1.0, alpha=0.8, color="tab:blue",
                    label=f"reference seed {k.rsplit('seed', 1)[1]}")
    band = data.get("seed_band", {})
    o = band.get("ours", {})
    if o.get("mean") is not None and o.get("std"):
        ax.axhspan(o["mean"] - o["std"], o["mean"] + o["std"],
                   color="tab:orange", alpha=0.12,
                   label=f"ours converged-half mean ±σ ({o['std']:.0f})")
    gap = band.get("level_gap_of_seed_means")
    title_mode = "single-agent" if mode == "single" else "self-play"
    ax.set_title(
        f"Seed-variance bands ({title_mode}): pinned parity pool, "
        f"{o.get('n_seeds', 0)} framework seeds"
        + (f" | gap of seed-means {gap:.1%}" if gap is not None else ""))
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episode reward")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    suffix = "" if mode == "single" else "_selfplay"
    out = os.path.join(ROOT, "static", f"learning_curve_parity{suffix}_seeds.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
