"""Round-robin tournament evaluation between trained policies.

League-style evaluation beyond the reference's shared-policy multi eval
(/root/reference/evaluate.py:68-122 drives every car with the SAME model): here
every ordered pair of models races head-to-head — one policy per seat — over the
held-out eval grid, and a Bradley-Terry fit turns the win matrix into ratings
reported on the Elo scale. All matches for a pair run as ONE batched device
rollout (the whole grid in lockstep), so an M-model tournament costs M*(M-1)
compiled rollouts total.

  python -m self_play_racing_tpu.tournament models/a.npz models/b.npz models/c.pth \
      --tracks 20 --runs 2 --out data/tournament.json
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from .envs import multi as menv
from .envs import normalize as obsnorm
from .utils import metrics as M


def stack_bundles(bundles, obs_dim: int):
    """Stack per-model (params, log_std, obs_norm_or_None) into per-seat pytrees.

    All models must share one architecture (same tower shapes) — they are raced
    inside a single compiled program. Models saved without observation
    normalization get identity normalizer rows.
    """
    params_list, log_std_list, norm_list = [], [], []
    for params, log_std, norm in bundles:
        params_list.append(params)
        log_std_list.append(jnp.asarray(log_std, jnp.float32))
        norm_list.append(norm if norm is not None else obsnorm.init(obs_dim))
    shapes = [jax.tree.map(jnp.shape, p) for p in params_list]
    if any(s != shapes[0] for s in shapes[1:]):
        raise ValueError(
            "tournament seats must share one architecture; got param shapes "
            f"{shapes}")
    stack = lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs])
    return (jax.tree.map(stack, *params_list),
            jax.tree.map(stack, *log_std_list),
            jax.tree.map(stack, *norm_list))


def play_match(bundle_a, bundle_b, track, key, num_sensors: int = 11,
               max_steps: int = 3000, deterministic: bool = False):
    """Race model A (seat 0) vs model B (seat 1) on every env in ``track``.

    Returns (wins_a, wins_b, draws) summed over envs. An env whose episode never
    ends inside ``max_steps`` (placement stays 0) counts as a draw.
    """
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=num_sensors)
    p, ls, nrm = stack_bundles([bundle_a, bundle_b], env_cfg.obs_dim)
    acc = M.rollout_match(p, ls, nrm, env_cfg, track, key,
                          max_steps=max_steps, deterministic=deterministic)
    place = acc["placement"]                      # [envs, 2]; 1 = winner
    wins_a = int((place[:, 0] == 1).sum())
    wins_b = int((place[:, 1] == 1).sum())
    draws = int((place == 0).all(axis=1).sum())
    return wins_a, wins_b, draws


def bradley_terry_elo(wins: np.ndarray, draws: np.ndarray = None,
                      prior: float = 0.1, iters: int = 1000, tol: float = 1e-12):
    """Elo-scale ratings from a win matrix via the Bradley-Terry MM algorithm.

    ``wins[i, j]`` = wins of i over j; draws count half a win each way; ``prior``
    adds a virtual fractional win both ways per pair so undefeated / winless
    models keep finite ratings. Ratings are centered (geometric mean strength 1
    -> mean Elo 0); differences are what matter: P(i beats j) =
    1 / (1 + 10^((elo_j - elo_i)/400)).
    """
    w = np.asarray(wins, float).copy()
    if draws is not None:
        w += np.asarray(draws, float) / 2.0
    n = w.shape[0]
    off = ~np.eye(n, dtype=bool)
    w[off] += prior
    np.fill_diagonal(w, 0.0)
    games = w + w.T
    p = np.ones(n)
    for _ in range(iters):
        denom = games / (p[:, None] + p[None, :])
        np.fill_diagonal(denom, 0.0)
        p_new = w.sum(axis=1) / denom.sum(axis=1)
        p_new /= np.exp(np.mean(np.log(p_new)))
        if np.max(np.abs(p_new - p)) < tol:
            p = p_new
            break
        p = p_new
    return 400.0 * np.log10(p)


def run_tournament(model_paths, num_tracks: int = 20, num_runs: int = 2,
                   seed: int = 42, num_sensors: int = 11, max_steps: int = 3000,
                   deterministic: bool = False):
    """Full round robin: every ordered pair (i seat 0, j seat 1) plays the whole
    eval grid once, so each unordered pair is seen from both grid positions.
    Returns {names, wins, draws, elo, ranking}."""
    from .evaluate import load_policy_bundle

    bundles = [load_policy_bundle(p) for p in model_paths]
    grid_track, _, _ = M.build_eval_grid(num_tracks, num_runs, seed)
    m = len(model_paths)
    wins = np.zeros((m, m), int)
    draws = np.zeros((m, m), int)
    for i in range(m):
        for j in range(m):
            if i == j:
                continue
            key = jax.random.fold_in(jax.random.key(seed), i * m + j)
            wa, wb, d = play_match(bundles[i], bundles[j], grid_track, key,
                                   num_sensors=num_sensors, max_steps=max_steps,
                                   deterministic=deterministic)
            wins[i, j] += wa
            wins[j, i] += wb
            draws[i, j] += d
            draws[j, i] += d
    elo = bradley_terry_elo(wins, draws)
    order = np.argsort(-elo)
    names = [os.path.basename(p) for p in model_paths]
    return {
        "models": list(model_paths),
        "names": names,
        "wins": wins.tolist(),
        "draws": draws.tolist(),
        "elo": [float(e) for e in elo],
        "ranking": [
            {"rank": r + 1, "name": names[i], "elo": float(elo[i]),
             "wins": int(wins[i].sum()), "losses": int(wins[:, i].sum()),
             "draws": int(draws[i].sum())}
            for r, i in enumerate(order)
        ],
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("models", nargs="+", help=".npz / .pth policy checkpoints")
    p.add_argument("--tracks", type=int, default=20)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-steps", type=int, default=3000)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--out", default=None, help="JSON results path")
    args = p.parse_args(argv)
    if len(args.models) < 2:
        raise SystemExit("need at least 2 models for a tournament")

    results = run_tournament(args.models, num_tracks=args.tracks,
                             num_runs=args.runs, seed=args.seed,
                             max_steps=args.max_steps,
                             deterministic=args.deterministic)
    print(f"{'rank':>4}  {'elo':>7}  {'W':>5} {'L':>5} {'D':>5}  model")
    for row in results["ranking"]:
        print(f"{row['rank']:>4}  {row['elo']:>7.1f}  {row['wins']:>5} "
              f"{row['losses']:>5} {row['draws']:>5}  {row['name']}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"results -> {args.out}")
    return results


if __name__ == "__main__":
    main()
