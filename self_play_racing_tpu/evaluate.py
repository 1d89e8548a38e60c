"""Evaluation entry point (reference evaluate.py equivalent).

Runs the cross-model evaluation grid — 40 tracks x 5 runs, seed 42, the reference's
exact width-draw quirk (RandomState(seed+i) indexed by run, evaluate.py:181,30) — as
batched jitted rollouts, dumps per-model JSON results, and renders the comparison bar
chart. Accepts our ``.npz`` checkpoints or reference torch ``.pth`` state dicts (the
interop layer transposes the weights).

  python -m self_play_racing_tpu.evaluate --single models/single_agent.npz \
      --multi models/self_play_agent.npz
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from .envs import multi as menv
from .envs import single as senv
from .models import actor_critic as net
from .utils import metrics as M


def load_policy(path):
    """(params, log_std) from .npz (ours) or .pth (reference torch state dict)."""
    params, log_std, _ = load_policy_bundle(path)
    return params, log_std


def load_policy_bundle(path):
    """(params, log_std, obs_norm_or_None). ``obs_norm`` is the running observation
    normalizer saved with policies trained under ``normalize_obs=True`` — consumers
    MUST apply it before the policy or the inputs are on the wrong scale."""
    if path.endswith(".pth") or path.endswith(".pt"):
        params, log_std = net.params_from_torch_state_dict(path)
        return params, log_std, None
    data = np.load(path, allow_pickle=False)
    n = sum(1 for k in data.files if k.startswith("p") and k[1:].isdigit())
    flat = [jnp.asarray(data[f"p{i}"]) for i in range(n)]
    # infer the tower depth from the leaf count: 2 towers x L layers x (w, b)
    # leaves, so checkpoints from any cfg.hidden depth load (treedef depends only
    # on the layer count, not shapes)
    if n % 4 != 0:
        raise ValueError(f"{path}: {n} parameter arrays is not 2 towers of (w, b) layers")
    layers = n // 4
    template = net.init_params(jax.random.key(0), 1, 1, hidden=(1,) * (layers - 1))
    treedef = jax.tree.structure(template)
    params = jax.tree.unflatten(treedef, flat)
    obs_norm = None
    if "obs_mean" in data.files:
        from .envs import normalize as obsnorm

        obs_norm = obsnorm.ObsNormState(
            mean=jnp.asarray(data["obs_mean"]),
            var=jnp.asarray(data["obs_var"]),
            count=jnp.asarray(data["obs_count"]),
        )
    return params, jnp.asarray(data["log_std"]), obs_norm


def _evaluate_overall(grid, model_path, env_cfg, rollout_fn, max_steps,
                      seed, deterministic):
    """Shared grid evaluation: one batched rollout over all (track, run) cells."""
    params, log_std, obs_norm = load_policy_bundle(model_path)
    track, track_ids, run_ids = grid
    # rollout_single/rollout_multi jit internally (one cached program per
    # env_cfg/horizon/mode, shared across models) with the track as an argument
    eps = rollout_fn(params, log_std, env_cfg, track, jax.random.key(seed),
                     max_steps=max_steps, deterministic=deterministic,
                     obs_norm=obs_norm)
    eps = {k: np.asarray(v) for k, v in eps.items()}
    results = M.aggregate(eps)
    results["all_episodes"] = [
        {k: (float(v[i]) if v.dtype.kind == "f" else
             (bool(v[i]) if v.dtype.kind == "b" else int(v[i])))
         for k, v in eps.items()}
        for i in range(len(eps["steps"]))
    ]
    return results


def evaluate_single_agent_overall(grid, model_path, seed=42, deterministic=False):
    """evaluate.py:12-66 equivalent, one batched rollout for the whole grid.

    The grid (from ``metrics.build_eval_grid``) already fixes the track/run
    layout; its size is not re-declared here."""
    return _evaluate_overall(grid, model_path, senv.RacingConfig(num_sensors=11),
                             M.rollout_single, 2000, seed, deterministic)


def evaluate_multi_agent_overall(grid, model_path, seed=42, deterministic=False,
                                 num_agents=2):
    """evaluate.py:68-122 equivalent: shared policy drives all ``num_agents`` cars
    (the reference evaluates 2; the policy must have been trained at this count —
    the observation width depends on it)."""
    return _evaluate_overall(grid, model_path,
                             menv.MultiRacingConfig(num_agents=num_agents,
                                                    num_sensors=11),
                             M.rollout_multi, 3000, seed, deterministic)


def evaluate_multi_agent_procgen(model_path, num_tracks=40, num_points=12,
                                 width_range=(4.0, 10.0), seed=777, eval_seed=42,
                                 deterministic=False, num_agents=2,
                                 max_steps=3000):
    """Zero-shot track generalization: the same shared-policy multi eval, but on
    ``num_tracks`` *unseen* tracks generated on device (envs/procgen.py) instead
    of the reference grid — no model was ever trained on these. Pairs with
    ``train.py scale --resample-tracks-every`` to measure what domain
    randomization buys."""
    from .envs import procgen as pg

    pool = pg.gen_track_pool_device(jax.random.key(seed), num_tracks, num_points,
                                    width_range=width_range)
    params, log_std, obs_norm = load_policy_bundle(model_path)
    eps = M.rollout_multi(
        params, log_std,
        menv.MultiRacingConfig(num_agents=num_agents, num_sensors=11),
        pool, jax.random.key(eval_seed), max_steps=max_steps,
        deterministic=deterministic, obs_norm=obs_norm)
    return M.aggregate(eps)


def _adapter_episode(env, predict, max_steps=2000):
    """One host-side episode through the gym adapter (utils/metrics.py:152-183
    equivalent): path length integrated from info positions, final-info stats."""
    obs, _ = env.reset()
    total_reward = 0.0
    total_distance = 0.0
    prev = None
    info = {}
    step = 0
    for step in range(max_steps):
        action = predict(obs)
        obs, reward, terminated, truncated, info = env.step(action)
        total_reward += float(reward)
        pos = info["position"]
        if prev is not None:
            total_distance += float(np.hypot(pos[0] - prev[0], pos[1] - prev[1]))
        prev = pos
        if terminated or truncated:
            break
    return {
        "total_reward": total_reward,
        "steps": step + 1,
        "progress": float(info["progress"]),
        "finished": bool(info["finished"]),
        "crashed": bool(info["crashed"]),
        "speed": float(info["speed"]),
        "total_distance": total_distance,
        "distance_per_step": total_distance / (step + 1) if step > 0 else 0.0,
    }


def evaluate_adapter_agent_overall(predict, num_tracks=40, num_runs=5, seed=42,
                                   max_steps=2000, num_sensors=11):
    """Host-loop grid evaluation for policies that only expose ``predict(obs) ->
    action`` (SB3 models, external baselines). Same track/width grid as the
    batched evaluators (evaluate.py:176-182 incl. the width-by-run quirk,
    evaluate.py:30), same aggregation."""
    from .envs import track as trk
    from .envs.gym_adapter import RacingEnv

    np.random.seed(seed)
    cps = trk.gen_tracks(num_tracks=num_tracks, seed=seed)
    widths = [np.random.RandomState(seed + i).randint(4, 10)
              for i in range(num_tracks)]
    episodes = []
    for t in range(num_tracks):
        for r in range(num_runs):
            env = RacingEnv(num_sensors=num_sensors, track_pool=cps, track_id=t,
                            track_width=float(widths[r]), dtype=jnp.float32)
            episodes.append(_adapter_episode(env, predict, max_steps))
    cols = {k: np.asarray([e[k] for e in episodes]) for k in episodes[0]}
    results = M.aggregate(cols)
    results["all_episodes"] = episodes
    return results


def evaluate_sb3_agent_overall(model_path, num_tracks=40, num_runs=5, seed=42,
                               max_steps=2000):
    """evaluate.py:124-171 equivalent: SB3 PPO driven deterministically through
    the gym adapter. Uses stable_baselines3 when installed, else the vendored
    sb3_compat implementation (interop/sb3_compat.py) for its checkpoints."""
    try:
        from stable_baselines3 import PPO as SB3_PPO
    except ImportError:
        from .interop.sb3_compat import PPO as SB3_PPO
        model = SB3_PPO.load(model_path)
    else:
        # Real SB3 cannot read checkpoints the vendored compat trainer saved
        # (torch-pickle zips, not SB3 archives) and fails on them with an
        # opaque unpickling error; fall back to the compat loader for those.
        try:
            model = SB3_PPO.load(model_path)
        except Exception as sb3_err:
            from .interop import sb3_compat
            try:
                model = sb3_compat.PPO.load(model_path)
            except Exception:
                raise sb3_err
    return evaluate_adapter_agent_overall(
        lambda obs: model.predict(obs, deterministic=True)[0],
        num_tracks, num_runs, seed, max_steps)


def display_comparison(results_files, labels, output_path):
    """Grouped normalized bar chart (utils/metrics.py:185-235)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    all_results = []
    for file in results_files:
        with open(file) as f:
            all_results.append(json.load(f))

    categories = ["Success Rate", "Avg Speed\n(normalized)",
                  "Avg Distance\n(normalized)", "Steps / Progress"]
    max_speed = max((r["avg_speed"] for r in all_results if r["avg_speed"] > 0),
                    default=1.0)
    max_distance = max((r["avg_distance"] for r in all_results if r["avg_distance"] > 0),
                       default=1.0)
    max_spp = max((r["avg_steps_per_progress"] for r in all_results), default=1.0) or 1.0

    data = [
        [r["success_rate"],
         r["avg_speed"] / max_speed if r["avg_speed"] > 0 else 0,
         r["avg_distance"] / max_distance if r["avg_distance"] > 0 else 0,
         r["avg_steps_per_progress"] / max_spp]
        for r in all_results
    ]
    x = np.arange(len(categories))
    width = 0.8 / len(data)
    fig, ax = plt.subplots(figsize=(16, 7))
    for i, (agent_data, label) in enumerate(zip(data, labels)):
        offset = (i - len(data) / 2 + 0.5) * width
        ax.bar(x + offset, agent_data, width, label=label, alpha=0.8)
    ax.set_ylabel("Normalized Value")
    ax.set_title("Agent Performance Comparison")
    ax.set_xticks(x)
    ax.set_xticklabels(categories)
    ax.legend(loc="upper right")
    ax.grid(axis="y", alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Performance comparison chart saved to {output_path}")


def eval(models: dict, num_tracks=40, num_runs=5, seed=42, out_dir="data",
         chart="static/eval_comparison.png", deterministic=False):
    """Full eval flow (evaluate.py:173-238). ``models`` maps label ->
    (kind, path) with kind in {"single", "multi"}."""
    os.makedirs(out_dir, exist_ok=True)
    grid = M.build_eval_grid(num_tracks, num_runs, seed)
    by_label = {}
    for label, (kind, path) in models.items():
        print(f"Evaluating {label} ({kind}) from {path}")
        if kind == "sb3":
            results = evaluate_sb3_agent_overall(path, num_tracks, num_runs, seed)
        else:
            fn = (evaluate_single_agent_overall if kind == "single"
                  else evaluate_multi_agent_overall)
            results = fn(grid, path, seed=seed, deterministic=deterministic)
        out_path = os.path.join(out_dir, f"eval_info_{label}.json")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"  success_rate={results['success_rate']:.3f} "
              f"crash_rate={results['crash_rate']:.3f} "
              f"avg_speed={results['avg_speed']:.2f}")
        by_label[label] = {"path": out_path, "results": results}
    if chart and by_label:
        os.makedirs(os.path.dirname(chart) or ".", exist_ok=True)
        display_comparison([v["path"] for v in by_label.values()],
                           list(by_label), chart)
    return by_label


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--single", action="append", default=[],
                   help="path to a single-agent policy (.npz or .pth)")
    p.add_argument("--multi", action="append", default=[],
                   help="path to a self-play/multi policy (.npz or .pth)")
    p.add_argument("--sb3", action="append", default=[],
                   help="path to an SB3 PPO model (.zip; needs stable_baselines3)")
    p.add_argument("--num-tracks", type=int, default=40)
    p.add_argument("--num-runs", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--procgen", action="store_true",
                   help="also evaluate each --multi model zero-shot on "
                        "--num-tracks UNSEEN device-generated tracks "
                        "(envs/procgen.py) and report the transfer gap")
    args = p.parse_args(argv)
    models = {}
    for i, path in enumerate(args.single):
        models[f"single_{i}" if len(args.single) > 1 else "single"] = ("single", path)
    for i, path in enumerate(args.multi):
        models[f"self_play_{i}" if len(args.multi) > 1 else "self_play"] = ("multi", path)
    for i, path in enumerate(args.sb3):
        models[f"sb3_{i}" if len(args.sb3) > 1 else "sb3"] = ("sb3", path)
    if not models:
        raise SystemExit("pass at least one --single/--multi/--sb3 model path")
    by_label = eval(models, args.num_tracks, args.num_runs, args.seed,
                    deterministic=args.deterministic)
    if args.procgen:
        if not args.multi:
            print("--procgen: no --multi models to evaluate (flag only applies "
                  "to multi policies)")
        for i, path in enumerate(args.multi):
            r = evaluate_multi_agent_procgen(path, num_tracks=args.num_tracks,
                                             deterministic=args.deterministic)
            label = f"self_play_{i}" if len(args.multi) > 1 else "self_play"
            grid = by_label[label]["results"]  # in-memory, not a re-read
            print(f"procgen zero-shot ({os.path.basename(path)}): "
                  f"success_rate={r['success_rate']:.3f} "
                  f"crash_rate={r['crash_rate']:.3f} "
                  f"avg_speed={r['avg_speed']:.2f} | transfer gap vs grid: "
                  f"success {r['success_rate'] - grid['success_rate']:+.3f} "
                  f"speed {r['avg_speed'] - grid['avg_speed']:+.2f}")


if __name__ == "__main__":
    main()
