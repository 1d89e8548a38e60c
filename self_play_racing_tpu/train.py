"""Training entry points (reference train.py:16,65,117 equivalents) with a CLI.

  python -m self_play_racing_tpu.train multi    # self-play PPO   (train_multi)
  python -m self_play_racing_tpu.train single   # single-agent PPO (train_single)
  python -m self_play_racing_tpu.train scale    # 1B-step scale-mode self-play
                                                 (4096 envs, per-env opponents)
  python -m self_play_racing_tpu.train sb3      # SB3 baseline through the gym adapter
                                                 (train_single_baseline; needs SB3)

Track pools are generated with the reference's exact seed/stream conventions
(train.py:28-31: gen_tracks(num_envs, seed) then per-env widths randint[6,10) drawn
from the global RNG, identity track assignment).
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np

import jax.numpy as jnp

from .agent.self_play import SelfPlayTrainer
from .agent.trainer import PPOTrainer
from .configs import base_config, self_play_config
from .envs import multi as menv
from .envs import single as senv
from .envs import track as trk


def _seed_all(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def make_training_pool(cfg, dtype=jnp.float32):
    """TRACK_POOL + TRACK_WIDTHS + identity assignment (train.py:28-31)."""
    cps = trk.gen_tracks(num_tracks=cfg.num_envs, seed=cfg.seed)
    widths = [float(np.random.randint(6, 10)) for _ in range(cfg.num_envs)]
    pool = trk.make_track_pool(cps, widths, dtype=dtype)
    return trk.gather_tracks(pool, np.arange(cfg.num_envs))


def train_multi(total_timesteps=None, num_envs=None, out="models/self_play_agent.npz",
                checkpoint_dir="models", num_updates=None, resume_from=None,
                **cfg_overrides):
    overrides = dict(cfg_overrides)
    if total_timesteps:
        overrides["total_timesteps"] = total_timesteps
    if num_envs:
        overrides["num_envs"] = num_envs
    cfg = self_play_config(**overrides)
    _seed_all(cfg.seed)
    print("Generating track pool")
    track = make_training_pool(cfg)
    env_cfg = menv.MultiRacingConfig(num_agents=2, num_sensors=11)

    print("=" * 60)
    print("SELF PLAY PPO TRAINING")
    print("=" * 60)
    print(f"Total timesteps: {cfg.total_timesteps:,} | Envs: {cfg.num_envs} | "
          f"Batch: {cfg.batch_size:,} | Updates: {cfg.num_updates} | "
          f"Snapshot freq: {cfg.snapshot_freq} | Pool: {cfg.pool_size}")
    trainer = SelfPlayTrainer(cfg, env_cfg, track)
    trainer.train(num_updates=num_updates, checkpoint_dir=checkpoint_dir,
                  resume_from=resume_from)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    trainer.save(out)
    os.makedirs("data", exist_ok=True)
    trainer.save_training_info("data/training_info_self_play.json")
    print(f"Final model saved to {out}")
    return trainer


def train_single(total_timesteps=None, num_envs=None, out="models/single_agent.npz",
                 num_updates=None, **cfg_overrides):
    overrides = dict(cfg_overrides)
    if total_timesteps:
        overrides["total_timesteps"] = total_timesteps
    if num_envs:
        overrides["num_envs"] = num_envs
    cfg = base_config(**overrides)
    _seed_all(cfg.seed)
    print("Generating track pool")
    track = make_training_pool(cfg)
    env_cfg = senv.RacingConfig(num_sensors=11)

    print("=" * 60)
    print("PPO TRAINING")
    print("=" * 60)
    print(f"Total timesteps: {cfg.total_timesteps:,} | Envs: {cfg.num_envs} | "
          f"Batch: {cfg.batch_size:,} | Updates: {cfg.num_updates}")
    trainer = PPOTrainer(cfg, env_cfg, track)
    trainer.train(num_updates=num_updates)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    trainer.save(out)
    os.makedirs("data", exist_ok=True)
    trainer.save_training_info("data/training_info_single.json")
    print(f"Final model saved to {out}")
    return trainer


def train_scale(total_timesteps=1_000_000_000, num_envs=4096, num_steps=256,
                num_tracks=16, out="models/self_play_agent_scale_1B.npz",
                info_out="data/training_info_self_play_scale_1B.json",
                num_updates=None, checkpoint_dir="models/scale",
                checkpoint_every=200, resume_from=None, num_agents=2,
                resample_tracks_every=0, track_points=12, pooled_geometry=False,
                sensor_lod=1, **cfg_overrides):
    """Scale-mode self-play: resident env state, per-env opponents, big batch.

    The TPU-native generalization beyond the reference's 16-env parity config
    (SURVEY quirk #7): 4096 envs tiled over a track pool, opponents sampled per
    env, no forced resets. One v5e chip trains 1B env-steps in ~6 minutes.
    ``num_agents`` > 2 races the learner against that many frozen-pool seats
    (the reference wrapper is 2-agent-only). ``resample_tracks_every`` > 0 turns
    on domain randomization: every K updates a fresh ``num_tracks``-track pool
    is generated *on device* (envs/procgen.py — no host round-trips) and all
    envs restart on it; pools are keyed by update index, so resumes see the
    same pool sequence. ``pooled_geometry`` keeps the [tracks, ...] pool
    resident instead of per-env copies — the CAPACITY path for env counts where
    per-env copies OOM (~500k envs/chip; eager is faster wherever it fits —
    docs/DESIGN.md "Geometry layouts"): ``"tiled"`` keeps the default
    interleaved assignment (trajectories bit-identical to eager),
    ``"grouped"`` uses block-grouped assignment, ``"gather"`` (or True)
    arbitrary env->track ids (slowest).
    """
    overrides = dict(
        total_timesteps=total_timesteps, num_envs=num_envs, num_steps=num_steps,
        opponent_per_env=True, reset_envs_each_update=False,
    )
    # Multi-chip: shard the env batch over all visible devices, and size the
    # shard-local minibatch shuffle to the data axis so the update phase runs
    # with zero data collectives (agent/ppo.py:run_ppo_update).
    import jax as _jax

    n_dev = len(_jax.devices())
    overrides.update(cfg_overrides)
    # Shard-local minibatching needs every minibatch to take an equal stratum
    # from each device's shard; derive the would-be minibatch size from the
    # final overrides and fall back to the single-shard layout (still legal to
    # shard, just with the global shuffle) for configs it doesn't divide.
    probe = self_play_config(**overrides)
    use_mesh = n_dev > 1 and probe.num_envs % n_dev == 0
    if (use_mesh and "data_shards" not in cfg_overrides
            and probe.minibatch_size % n_dev == 0):
        overrides["data_shards"] = n_dev
    cfg = self_play_config(**overrides)
    _seed_all(cfg.seed)
    env_ids = np.arange(cfg.num_envs) % num_tracks

    def track_view(pool):
        if pooled_geometry == "grouped":
            if cfg.num_envs % num_tracks:
                raise ValueError("grouped geometry needs num_envs % num_tracks == 0")
            return trk.grouped_pooled_tracks(pool, np.arange(num_tracks),
                                             cfg.num_envs // num_tracks)
        if pooled_geometry == "tiled":
            return trk.tiled_pooled_tracks(pool, cfg.num_envs)
        if pooled_geometry:
            return trk.pooled_tracks(pool, env_ids)
        return trk.gather_tracks(pool, env_ids)
    if resample_tracks_every:
        import jax

        from .envs import procgen as pg

        def pool_for_boundary(boundary: int):
            """Per-env track view of the pool active from update ``boundary`` on.

            Keyed by the boundary update index, so a resumed run lands on the
            same pool the original run was training on at that update — not the
            update-0 pool. Boundary 0 is the construction pool. All pools share
            the generator's static shapes, so swaps never re-compile."""
            k = jax.random.key(cfg.seed)
            if boundary:
                k = jax.random.fold_in(k, boundary)
            pool = pg.gen_track_pool_device(k, num_tracks, track_points,
                                            sensor_lod=sensor_lod)
            return track_view(pool)

        print(f"Generating {num_tracks}-track pool on device "
              f"(resampled every {resample_tracks_every} updates)")
        track = pool_for_boundary(0)
    else:
        print(f"Generating {num_tracks}-track pool (tiled over {cfg.num_envs} envs)")
        cps = trk.gen_tracks(num_tracks=num_tracks, seed=cfg.seed)
        widths = [float(np.random.randint(6, 10)) for _ in range(num_tracks)]
        pool = trk.make_track_pool(cps, widths, sensor_lod=sensor_lod)
        track = track_view(pool)
    # NOTE: relaxed sensing (sensor_lod>1) deliberately does NOT pair with
    # clamp_sensor_range: clamping LOD reads makes them LESS faithful to the
    # exact-mode observations policies are evaluated on (the reference's
    # unclamped-hit quirk routinely reads >50 down straights; clamping shifts
    # 7% of all rays, raising mean error 30x — docs/DESIGN.md "Relaxed
    # sensing error tail"). The knob stays available for users who want
    # bounded observations in both modes.
    env_cfg = menv.MultiRacingConfig(num_agents=num_agents, num_sensors=11)

    print("=" * 60)
    print("SELF PLAY PPO TRAINING (SCALE MODE)")
    print("=" * 60)
    print(f"Total timesteps: {cfg.total_timesteps:,} | Envs: {cfg.num_envs} | "
          f"Batch: {cfg.batch_size:,} | Updates: {cfg.num_updates} | "
          f"Snapshot freq: {cfg.snapshot_freq} | Pool: {cfg.pool_size}")
    trainer = SelfPlayTrainer(cfg, env_cfg, track)
    if use_mesh:
        from .parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        layout = (f"shard-local minibatching (data_shards={cfg.data_shards})"
                  if cfg.data_shards > 1 else
                  "global-shuffle minibatching (minibatch size not divisible "
                  "by the device count)")
        print(f"Sharding over {n_dev} devices: mesh {dict(mesh.shape)}, {layout}")
        trainer.shard(mesh)
    if resample_tracks_every:
        applied = {"boundary": 0}

        def resample(update):
            # boundary-keyed, not multiple-triggered: a resume that lands
            # mid-period (update % K != 0) still swaps to the pool that was
            # active at checkpoint time instead of training on the initial pool
            boundary = (update // resample_tracks_every) * resample_tracks_every
            if boundary != applied["boundary"]:
                applied["boundary"] = boundary
                return pool_for_boundary(boundary)
            return None

        trainer.track_resampler = resample
    # multi-hour runs need crash recovery: full checkpoint every `checkpoint_every`
    # updates (default 200 ≈ every 210M steps at the default batch) + --resume
    trainer.train(num_updates=num_updates, log_every=50,
                  checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
                  resume_from=resume_from)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    trainer.save(out)
    os.makedirs(os.path.dirname(info_out) or ".", exist_ok=True)
    trainer.save_training_info(info_out)
    print(f"Final model saved to {out}")
    return trainer


def train_single_baseline(total_timesteps=None,
                          out="models/sb3_baseline_agent_general",
                          sb3_kwargs=None,
                          info_out="data/training_info_sb3.json",
                          **cfg_overrides):
    """SB3 PPO on the gym adapter (train.py:117-188). Uses stable_baselines3 when
    installed; otherwise the vendored torch reimplementation of SB3's default PPO
    (interop/sb3_compat.py) so the baseline cross-check leg still runs."""
    import gymnasium as gym
    try:
        from stable_baselines3 import PPO as SB3_PPO
        from stable_baselines3.common.vec_env import DummyVecEnv
    except ImportError:
        from .interop.sb3_compat import PPO as SB3_PPO, DummyVecEnv
        print("stable_baselines3 not installed - using the vendored "
              "sb3_compat PPO (identical defaults, torch)")

    overrides = dict(cfg_overrides)
    if total_timesteps:
        overrides["total_timesteps"] = total_timesteps
    cfg = base_config(**overrides)
    _seed_all(cfg.seed)
    cps = trk.gen_tracks(num_tracks=cfg.num_envs, seed=cfg.seed)
    widths = [float(np.random.randint(6, 10)) for _ in range(cfg.num_envs)]

    from .envs.gym_adapter import RacingEnv

    def make_env(i):
        def thunk():
            env = RacingEnv(num_sensors=11, track_pool=cps, track_id=i,
                            track_width=widths[i], dtype=jnp.float32)
            return gym.wrappers.RecordEpisodeStatistics(env)
        return thunk

    from .interop.sb3_compat import TrainingLoggerCallback

    env = DummyVecEnv([make_env(i) for i in range(cfg.num_envs)])
    model = SB3_PPO("MlpPolicy", env, seed=cfg.seed, **(sb3_kwargs or {}))
    model.learn(total_timesteps=cfg.total_timesteps, progress_bar=False,
                callback=TrainingLoggerCallback(save_path=info_out))
    model.save(out)
    env.close()
    return model


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["multi", "single", "scale", "sb3", "all"])
    p.add_argument("--total-timesteps", type=int, default=None)
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--num-updates", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="multi/scale modes: resume from a full checkpoint "
                        "(e.g. models/checkpoint_update_30)")
    p.add_argument("--agents", type=int, default=None,
                   help="scale mode: cars per race (learner + N-1 frozen-pool "
                        "opponents; default 2)")
    p.add_argument("--resample-tracks-every", type=int, default=None, metavar="K",
                   help="scale mode: resample the whole track pool on device "
                        "every K updates (domain randomization; 0 = off)")
    p.add_argument("--pooled-geometry", nargs="?", const="tiled",
                   choices=["gather", "grouped", "tiled"], default=None,
                   help="scale mode: keep track geometry as the [tracks, ...] "
                        "pool instead of per-env copies (O(tracks) geometry "
                        "HBM — the capacity path for env counts where per-env "
                        "copies OOM, ~500k envs/chip; eager is faster "
                        "wherever it fits). 'tiled' (default when a value is "
                        "omitted) keeps the interleaved arange(N)%%T "
                        "assignment — trajectories bit-identical to eager; "
                        "'grouped' = block-grouped repeat(arange(T), N/T) "
                        "assignment (NOT seed-for-seed comparable to eager "
                        "runs — per-env track assignments differ); 'gather' = "
                        "arbitrary env->track ids, ~2-3x slower update")
    p.add_argument("--pfsp", action="store_true",
                   help="scale/multi modes: prioritized fictitious self-play — "
                        "sample pool opponents by (1-winrate)^2 instead of "
                        "uniformly, from training-rollout outcomes")
    p.add_argument("--sensor-lod", type=int, default=None, metavar="K",
                   help="scale mode: RELAXED SENSING (documented divergence "
                        "from the reference, default off) — raycast against a "
                        "K-x coarser chord approximation of the boundary. "
                        "Progress/rewards/collision stay exact; only the "
                        "sensor rays see the LOD walls. Cuts the dominant "
                        "raycast cost ~K-x at high agent counts "
                        "(data/relaxed_sensing.json quantifies speed + "
                        "behavioral equivalence)")
    args = p.parse_args(argv)
    kw = {}
    if args.seed is not None:
        kw["seed"] = args.seed
    if args.pfsp:
        kw["opponent_sampling"] = "pfsp"
    if args.mode in ("multi", "all"):
        train_multi(args.total_timesteps, args.num_envs,
                    num_updates=args.num_updates, resume_from=args.resume, **kw)
    if args.mode in ("single", "all"):
        train_single(args.total_timesteps, args.num_envs,
                     num_updates=args.num_updates, **kw)
    if args.mode == "scale":
        skw = dict(kw)
        if args.total_timesteps:
            skw["total_timesteps"] = args.total_timesteps
        if args.num_envs:
            skw["num_envs"] = args.num_envs
        if args.agents:
            skw["num_agents"] = args.agents
        if args.resample_tracks_every is not None:
            skw["resample_tracks_every"] = args.resample_tracks_every
        if args.pooled_geometry:
            skw["pooled_geometry"] = args.pooled_geometry
        if args.sensor_lod:
            skw["sensor_lod"] = args.sensor_lod
        train_scale(num_updates=args.num_updates, resume_from=args.resume, **skw)
    if args.mode in ("sb3", "all"):
        train_single_baseline(args.total_timesteps, **kw)


if __name__ == "__main__":
    main()
