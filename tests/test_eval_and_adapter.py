"""Eval harness + gym adapter checks against the reference.

- the eval grid reproduces evaluate.py:176-182's track/width draws (including the
  width-indexed-by-run quirk)
- aggregation matches the reference formulas (evaluate.py:39-64)
- a near-deterministic policy yields the same episode outcome through our batched
  rollout and the reference's per-env eval loop
- the Gymnasium adapter walks in lockstep with the reference env
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from self_play_racing_tpu.envs import gym_adapter, single as senv
from self_play_racing_tpu.envs import track as jtrack
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.utils import metrics as M

from agent.ppo import Agent as RefAgent
from environment.racing_env import RacingEnv as RefEnv
from environment.track import gen_tracks as ref_gen_tracks
from utils.metrics import eval_single_agent as ref_eval_single_agent


class _Space:
    def __init__(self, shape):
        self.shape = shape


def test_eval_grid_matches_reference_draws():
    seed, num_tracks = 42, 8
    pool, track_ids, run_ids = M.build_eval_grid(num_tracks=num_tracks, num_runs=3,
                                                 seed=seed, dtype=jnp.float64)
    np.random.seed(seed)
    ref_cps = ref_gen_tracks(num_tracks=num_tracks, seed=seed)
    ref_widths = [np.random.RandomState(seed + i).randint(4, 10)
                  for i in range(num_tracks)]
    for row in range(pool.num_tracks):
        t, r = int(track_ids[row]), int(run_ids[row])
        n = int(pool.n_wp[row])
        assert n == len(ref_cps[t]) * 30
        assert float(pool.track_width[row]) == float(ref_widths[r])


def test_aggregate_matches_reference_formulas():
    rng = np.random.RandomState(0)
    n = 50
    eps = {
        "steps": rng.randint(10, 2000, n),
        "total_reward": rng.randn(n) * 100,
        "progress": rng.rand(n),
        "finished": rng.rand(n) < 0.4,
        "crashed": rng.rand(n) < 0.3,
        "speed": rng.rand(n) * 30,
        "total_distance": rng.rand(n) * 500,
    }
    agg = M.aggregate(eps)
    succ = [i for i in range(n) if eps["finished"][i]]
    assert agg["success_rate"] == pytest.approx(len(succ) / n)
    assert agg["crash_rate"] == pytest.approx(sum(eps["crashed"]) / n)
    assert agg["avg_reward"] == pytest.approx(
        np.mean([eps["total_reward"][i] for i in succ]))
    eff = [i for i in range(n) if eps["progress"][i] > 0.01]
    assert agg["avg_steps_per_progress"] == pytest.approx(
        np.mean([eps["steps"][i] / eps["progress"][i] for i in eff]))


def test_rollout_single_matches_reference_eval():
    width = 8.0
    cps = [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=9)]
    pool = jtrack.make_track_pool(cps, [width], dtype=jnp.float64)
    track = jtrack.gather_tracks(pool, [0])
    env_cfg = senv.RacingConfig(num_sensors=11)

    params = net.init_params(jax.random.key(1), env_cfg.obs_dim, 2)
    log_std = jnp.full((2,), -20.0, jnp.float32)  # effectively deterministic
    ref_agent = RefAgent(_Space((env_cfg.obs_dim,)), _Space((2,)))
    ref_agent.load_state_dict(net.params_to_torch_state_dict(params, log_std))
    ref_agent.eval()
    ref_env = RefEnv(num_sensors=11, track_pool=cps, track_id=0, track_width=width)
    ref_metrics = ref_eval_single_agent(ref_env, ref_agent, torch.device("cpu"),
                                        max_steps=400)

    ours = M.rollout_single(params, log_std, env_cfg, track, jax.random.key(0),
                            max_steps=400, deterministic=True)
    assert bool(ours["finished"][0]) == ref_metrics["finished"]
    assert bool(ours["crashed"][0]) == ref_metrics["crashed"]
    assert abs(int(ours["steps"][0]) - ref_metrics["steps"]) <= 2
    assert float(ours["total_reward"][0]) == pytest.approx(
        ref_metrics["total_reward"], rel=0.05, abs=2.0)
    assert float(ours["total_distance"][0]) == pytest.approx(
        ref_metrics["total_distance"], rel=0.05, abs=2.0)


def test_gym_adapter_lockstep_with_reference():
    width = 7.0
    cps = [jtrack.gen_random_track(11, 55, 12, 0.3, 0.5, seed=4)]
    ours = gym_adapter.RacingEnv(num_sensors=11, track_pool=cps, track_id=0,
                                 track_width=width)
    ref = RefEnv(num_sensors=11, track_pool=cps, track_id=0, track_width=width)
    o1, _ = ours.reset()
    o2, _ = ref.reset()
    np.testing.assert_allclose(o1, o2, atol=1e-7)
    rng = np.random.RandomState(0)
    boundaries = 0
    for t in range(300):
        a = np.array([rng.uniform(-1, 1), rng.uniform(0, 1)], np.float32)
        o1, r1, term1, trunc1, i1 = ours.step(a)
        o2, r2, term2, trunc2, i2 = ref.step(a)
        assert r1 == pytest.approx(r2, rel=0, abs=1e-7), f"step {t}"
        assert (term1, trunc1) == (term2, trunc2)
        np.testing.assert_allclose(o1, o2, atol=1e-6)
        _assert_info_matches(i1, i2, f"step {t}")
        if term1 or trunc1:
            # episode boundary: the reset obs AND reset info must agree too
            # (Gymnasium reset-info contract, racing_env.py:86-102)
            boundaries += 1
            o1, i1 = ours.reset()
            o2, i2 = ref.reset()
            np.testing.assert_allclose(o1, o2, atol=1e-7)
            _assert_info_matches(i1, i2, f"reset after step {t}")
    assert boundaries >= 1, "no episode boundary crossed in 300 steps"


def _assert_info_matches(ours, ref, where):
    np.testing.assert_allclose(ours["position"], ref["position"], atol=1e-6,
                               err_msg=where)
    assert ours["speed"] == pytest.approx(float(ref["speed"]), abs=1e-6), where
    assert ours["progress"] == pytest.approx(float(ref["progress"]), abs=1e-6), where
    assert bool(ours["crashed"]) == bool(ref["crashed"]), where
    assert bool(ours["finished"]) == bool(ref["finished"]), where


def test_multi_adapter_contract():
    env = gym_adapter.MultiRacingEnv(num_agents=2, num_sensors=11)
    obs, infos = env.reset(seed=0)
    assert set(obs) == {"0", "1"}
    assert obs["0"].shape == (19,)
    a = {"0": np.zeros(2, np.float32), "1": np.zeros(2, np.float32)}
    obs, rewards, dones, truncated, infos = env.step(a)
    assert set(dones) == {"0", "1", "__all__"}
    assert isinstance(rewards["0"], float)


def test_selfplay_wrapper_adapter_lockstep_with_reference():
    """gym_adapter.SelfPlayWrapper walks in lockstep with the reference
    SelfPlayWrapper under an identical (near-deterministic) frozen opponent."""
    from environment.multi_racing_env import MultiRacingEnv as RefMultiEnv
    from environment.wrappers import SelfPlayWrapper as RefWrapper

    width = 7.5
    cps = [jtrack.gen_random_track(12, 58, 14, 0.35, 0.5, seed=9)]
    opp_params = net.init_params(jax.random.key(5), 19, 2)
    log_std = jnp.full((2,), -20.0, jnp.float32)  # std ~ 2e-9: effectively greedy

    ours = gym_adapter.SelfPlayWrapper(
        gym_adapter.MultiRacingEnv(num_agents=2, num_sensors=11, track_pool=cps,
                                   track_id=0, track_width=width), 0)
    ours.set_opponent((opp_params, log_std))

    ref_opp = RefAgent(_Space((19,)), _Space((2,)))
    ref_opp.load_state_dict(net.params_to_torch_state_dict(opp_params, log_std))
    ref_opp.eval()
    ref = RefWrapper(RefMultiEnv(num_agents=2, num_sensors=11, track_pool=cps,
                                 track_id=0, track_width=width), 0)
    ref.set_opponent(ref_opp)

    np.random.seed(7)
    o1, _ = ours.reset()
    np.random.seed(7)
    o2, _ = ref.reset()
    np.testing.assert_allclose(o1, o2, atol=1e-6)

    for t in range(150):
        a = np.array([0.25 * np.sin(t / 11.0), 0.6], np.float32)
        o1, r1, d1, tr1, i1 = ours.step(a)
        o2, r2, d2, tr2, i2 = ref.step(a)
        np.testing.assert_allclose(o1, o2, atol=1e-4, err_msg=f"step {t}")
        assert r1 == pytest.approx(r2, abs=1e-4), f"step {t}"
        assert d1 == d2, f"step {t}"
        if d1 or tr1:
            break
    assert t > 20


def test_rollout_multi_matches_reference_eval():
    """Shared-policy 2-car eval through our batched rollout_multi vs the reference's
    per-env eval loop (utils/metrics.py:80-150), near-deterministic policy. The
    start-grid ordering is random on both sides, so pick a jax key whose ordering
    matches the reference's draw before comparing trajectories."""
    from self_play_racing_tpu.envs import multi as menv
    from environment.multi_racing_env import MultiRacingEnv as RefMultiEnv
    from utils.metrics import eval_multi_agent as ref_eval_multi_agent

    width = 8.0
    cps = [jtrack.gen_random_track(12, 60, 15, 0.4, 0.5, seed=9)]
    pool = jtrack.make_track_pool(cps, [width], dtype=jnp.float64)
    track = jtrack.gather_tracks(pool, [0])
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    params = net.init_params(jax.random.key(1), env_cfg.obs_dim, 2)
    log_std = jnp.full((2,), -20.0, jnp.float32)  # effectively deterministic
    ref_agent = RefAgent(_Space((env_cfg.obs_dim,)), _Space((2,)))
    ref_agent.load_state_dict(net.params_to_torch_state_dict(params, log_std))
    ref_agent.eval()

    ref_env = RefMultiEnv(num_agents=2, num_sensors=11, track_pool=cps, track_id=0,
                          track_width=width)
    np.random.seed(7)
    ref_metrics = ref_eval_multi_agent(ref_env, ref_agent, torch.device("cpu"),
                                       max_steps=400)
    # reference reset (inside eval_multi_agent) consumed np.random under seed 7;
    # find a jax key whose start ordering reproduces the same grid
    np.random.seed(7)
    ref_env2 = RefMultiEnv(num_agents=2, num_sensors=11, track_pool=cps, track_id=0,
                           track_width=width)
    ref_env2.reset()
    want = np.array([round(float(c.x), 9) for c in ref_env2.cars])
    key = None
    for sk in range(64):
        st = menv.reset_state(env_cfg, track, jax.random.key(sk))
        got = np.array([round(float(st.x[0, i]), 9) for i in range(2)])
        if np.allclose(got, want, atol=1e-9):
            key = jax.random.key(sk)
            break
    assert key is not None, "no candidate key reproduced the reference start grid"

    ours = M.rollout_multi(params, log_std, env_cfg, track, key,
                           max_steps=400, deterministic=True)
    assert bool(ours["finished"][0]) == ref_metrics["finished"]
    assert bool(ours["crashed"][0]) == ref_metrics["crashed"]
    assert abs(int(ours["steps"][0]) - ref_metrics["steps"]) <= 2
    assert float(ours["total_reward"][0]) == pytest.approx(
        ref_metrics["total_reward"], rel=0.05, abs=2.0)
    assert float(ours["total_distance"][0]) == pytest.approx(
        ref_metrics["total_distance"], rel=0.05, abs=2.0)
