"""Tournament evaluation (self_play_racing_tpu/tournament.py): per-seat match
rollouts, Bradley-Terry/Elo ratings, and the round-robin harness."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from self_play_racing_tpu import tournament as T
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.utils import metrics as M


def _save_policy(path, seed, obs_dim=19, act=2, hidden=(64, 64)):
    params = net.init_params(jax.random.key(seed), obs_dim, act, hidden=hidden)
    flat, treedef = jax.tree.flatten(params)
    np.savez(path, treedef=str(treedef),
             log_std=np.full((act,), -0.5, np.float32),
             **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})
    return str(path)


def test_bradley_terry_elo_orders_by_strength():
    wins = np.array([[0, 9, 8], [1, 0, 7], [2, 3, 0]], float)
    elo = T.bradley_terry_elo(wins)
    assert elo[0] > elo[1] > elo[2]
    assert abs(np.mean(elo)) < 1e-6  # centered

    even = np.array([[0, 5], [5, 0]], float)
    np.testing.assert_allclose(T.bradley_terry_elo(even), [0.0, 0.0], atol=1e-6)

    # an undefeated model stays finite thanks to the virtual-win prior
    sweep = np.array([[0, 10], [0, 0]], float)
    elo = T.bradley_terry_elo(sweep)
    assert np.isfinite(elo).all() and elo[0] > elo[1]


def test_play_match_accounts_every_env():
    grid, _, _ = M.build_eval_grid(num_tracks=2, num_runs=2, seed=42)
    n = grid.wp_x.shape[0]
    from self_play_racing_tpu.evaluate import load_policy_bundle
    a = load_policy_bundle(_save_policy("/tmp/tourn_a.npz", 0))
    b = load_policy_bundle(_save_policy("/tmp/tourn_b.npz", 1))
    wa, wb, d = T.play_match(a, b, grid, jax.random.key(0), max_steps=200)
    # every env resolves to exactly one of: seat-0 win, seat-1 win, draw
    assert wa + wb + d == n
    assert min(wa, wb, d) >= 0


def test_trained_model_beats_random_init():
    grid, _, _ = M.build_eval_grid(num_tracks=3, num_runs=1, seed=42)
    from self_play_racing_tpu.evaluate import load_policy_bundle
    trained = load_policy_bundle("models/self_play_agent_scale_1B.npz")
    random_ = load_policy_bundle(_save_policy("/tmp/tourn_rand.npz", 123))
    wa, wb, d = T.play_match(trained, random_, grid, jax.random.key(7),
                             max_steps=1500)
    assert wa > wb  # the 1B-step agent dominates an untrained policy


def test_stack_bundles_rejects_mixed_architectures():
    from self_play_racing_tpu.evaluate import load_policy_bundle
    a = load_policy_bundle(_save_policy("/tmp/tourn_h64.npz", 0, hidden=(64, 64)))
    b = load_policy_bundle(_save_policy("/tmp/tourn_h32.npz", 1, hidden=(32, 32)))
    with pytest.raises(ValueError, match="architecture"):
        T.stack_bundles([a, b], obs_dim=19)


def test_round_robin_end_to_end(tmp_path):
    paths = [_save_policy(tmp_path / f"m{i}.npz", seed=i) for i in range(3)]
    res = T.run_tournament(paths, num_tracks=2, num_runs=1, max_steps=150)
    wins = np.array(res["wins"])
    assert wins.shape == (3, 3) and (np.diag(wins) == 0).all()
    assert len(res["ranking"]) == 3
    elo = np.array(res["elo"])
    assert np.isfinite(elo).all()
    ranks = [r["elo"] for r in res["ranking"]]
    assert ranks == sorted(ranks, reverse=True)
