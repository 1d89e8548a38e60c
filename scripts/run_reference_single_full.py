"""Resumable full-budget reference SINGLE-AGENT run for seed-variance bands.

The reference's ``PPO.train`` (ppo.py:211-287) has no checkpoint/resume — a
multi-hour CPU run would die with the process. This driver replicates its
update loop faithfully against the reference's public methods (identical
anneals incl. the speed-weight setattr no-op quirk #2, identical
collect_rollout/compute_advantages/ppo_update calls and logging schema) and
checkpoints agent+optimizer+RNG states+curves every ``--save-every`` updates.

Resume caveat (documented deviation): the Gymnasium vector env's Python-side
state cannot be pickled mid-episode, so a resumed process starts its envs
fresh — one extra synchronized env reset per resume point (0-3 over a 152-
update run; episodes are ~300 steps inside 2048-step rollouts, so the effect
on the converged-half statistic is negligible).

Like run_reference_selfplay_full.py --train-seed: the TRACK POOL stays pinned
to the parity convention (global seed 1) while ``--train-seed N`` re-seeds
random/np/torch before trainer construction (the reference re-seeds again from
config["seed"] in PPO.__init__, ppo.py:73-75). The curve merges into
data/learning_curve_parity.json as ``reference_rewards_seed{N}``.

  python scripts/run_reference_single_full.py --train-seed 2 \
      --workdir /tmp/ref_single_seed2
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(ROOT, "data", "learning_curve_parity.json")


def merge_curve(steps, rewards, train_seed):
    old = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            old = json.load(f)
    key = ("reference_rewards" if train_seed is None
           else f"reference_rewards_seed{train_seed}")
    old[key] = rewards
    old.setdefault("steps", steps)
    with open(OUT_JSON, "w") as f:
        json.dump(old, f, indent=2)
    print(f"merged {key} ({len(rewards)} points) into {OUT_JSON}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--updates", type=int, default=152)
    p.add_argument("--train-seed", type=int, default=None)
    p.add_argument("--workdir", default="/tmp/ref_single_work")
    p.add_argument("--save-every", type=int, default=10)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from agent.ppo import PPO
    from configs.base_config import hyperparams_config
    from environment.racing_env import RacingEnv
    from environment.track import gen_tracks

    config = hyperparams_config()
    config["total_timesteps"] = args.updates * config["batch_size"]
    pool_seed = config["seed"]
    random.seed(pool_seed)
    np.random.seed(pool_seed)
    torch.manual_seed(pool_seed)
    pool = gen_tracks(num_tracks=config["num_envs"], seed=pool_seed)
    widths = [np.random.randint(6, 10) for _ in range(config["num_envs"])]
    if args.train_seed is not None:
        config["seed"] = args.train_seed

    def env_fn(i):
        return RacingEnv(num_sensors=11, track_pool=pool, track_id=i,
                         track_width=widths[i])

    os.makedirs(args.workdir, exist_ok=True)
    ck_path = os.path.join(args.workdir, "driver_checkpoint.pkl")

    trainer = PPO(env_fn, config, device="cpu")
    c = trainer.config
    NUM_UPDATES = c["total_timesteps"] // c["batch_size"]

    start_update = 0
    training_info = {"steps": [], "rewards": []}
    if os.path.exists(ck_path):
        with open(ck_path, "rb") as f:
            ck = pickle.load(f)
        trainer.agent.load_state_dict(ck["agent"])
        trainer.optimizer.load_state_dict(ck["optimizer"])
        torch.set_rng_state(ck["torch_rng"])
        np.random.set_state(ck["np_rng"])
        random.setstate(ck["py_rng"])
        start_update = ck["update"]
        training_info = ck["training_info"]
        print(f"resumed at update {start_update}")

    obs_shape = trainer.envs.single_observation_space.shape
    action_shape = trainer.envs.single_action_space.shape
    obs = torch.zeros((c["num_steps"], c["num_envs"]) + tuple(obs_shape))
    actions = torch.zeros((c["num_steps"], c["num_envs"]) + tuple(action_shape))
    logprobs = torch.zeros((c["num_steps"], c["num_envs"]))
    dones = torch.zeros((c["num_steps"], c["num_envs"]))
    rewards = torch.zeros((c["num_steps"], c["num_envs"]))
    values = torch.zeros((c["num_steps"], c["num_envs"]))
    init_obs, _ = trainer.envs.reset()
    next_obs = torch.from_numpy(init_obs)
    next_done = torch.zeros(c["num_envs"], dtype=torch.bool)
    global_step = start_update * c["batch_size"]

    for update in range(start_update, NUM_UPDATES):
        # identical anneals (ppo.py:245-258) incl. the speed-weight setattr
        # QUIRK #2: the target is the RecordEpisodeStatistics wrapper, which
        # does not forward __setattr__, so the inner env keeps 8.0
        frac = max(0.0, 1.0 - update / NUM_UPDATES)
        trainer.optimizer.param_groups[0]["lr"] = frac * c["learning_rate"]
        current_log_std = frac * -0.5 + (1 - frac) * -1.6
        trainer.agent.log_std.data.fill_(current_log_std)
        speed_weight = 8.0 + (1 - frac) * 6.0
        for env_idx in range(c["num_envs"]):
            setattr(trainer.envs.envs[env_idx], "speed_weight", speed_weight)

        (obs, actions, logprobs, dones, rewards, values, next_obs, next_done,
         episode_info) = trainer.collect_rollout(
            obs, actions, logprobs, dones, rewards, values, next_obs, next_done)
        with torch.no_grad():
            next_value = trainer.agent.get_value(next_obs).flatten()
        advantages, returns = trainer.compute_advantages(
            rewards, dones, values, next_value, next_done)
        trainer.ppo_update(advantages, returns, values, logprobs, actions, obs)

        global_step += c["batch_size"]
        if episode_info:
            mean_reward = float(np.mean([ep["reward"] for ep in episode_info]))
            training_info["steps"].append(global_step)
            training_info["rewards"].append(mean_reward)
            print(f"Update {update+1}/{NUM_UPDATES} | Step {global_step} | "
                  f"Episodes: {len(episode_info)} | Mean Reward: "
                  f"{mean_reward:.2f}", flush=True)
        else:
            print(f"Update {update+1}/{NUM_UPDATES} | Step {global_step} | "
                  f"No episodes completed this rollout", flush=True)

        if (update + 1) % args.save_every == 0 or update + 1 == NUM_UPDATES:
            with open(ck_path + ".tmp", "wb") as f:
                pickle.dump({
                    "update": update + 1,
                    "agent": trainer.agent.state_dict(),
                    "optimizer": trainer.optimizer.state_dict(),
                    "torch_rng": torch.get_rng_state(),
                    "np_rng": np.random.get_state(),
                    "py_rng": random.getstate(),
                    "training_info": training_info,
                }, f)
            os.replace(ck_path + ".tmp", ck_path)

    merge_curve(training_info["steps"], training_info["rewards"],
                args.train_seed)


if __name__ == "__main__":
    main()
