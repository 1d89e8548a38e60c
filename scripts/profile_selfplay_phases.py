"""Per-phase attribution of the FULL A=2 self-play update (VERDICT r4 #2).

Splits the benched self-play update (bench.py's tertiary leg: 4096 envs x 256
steps, parity config — per-update shared pool opponent, env reset each update)
into marginal phase costs by monkeypatched ablation: the exact update program
is re-jitted with ONE seam stubbed to a cheap shape-equivalent, and
full - ablated = that phase's marginal cost inside the composed program,
fusion effects included. Seams (all late-bound module attributes):

  wall raycast        ops.geometry.raycast_walls        (2 agent seats/step)
  track query         ops.geometry.progress_and_collision
  car-car raycast     ops.geometry.raycast_cars
  SAT collisions      ops.geometry.rectangles_intersect
  opponent inference  envs.selfplay.opponent_actions_all_seats
  learner MLP+sample  models.actor_critic.sample_action
  obs assembly (all)  envs.multi.observe  (raycasts + features; features
                      reported as observe - raycast - cars residual)
  minibatch update    agent.ppo.run_ppo_update

(GAE deliberately has no ablation seam — see the note in main(); its exact
cost comes from scripts/trace_attribution.py.)

Timing: best of SIX windows of 3 chained dispatches with ONE host sync
(bench.py's chained-dispatch instrument with twice the windows — ablation
marginals difference two large numbers, so each side gets more chances at a
clean-tunnel window; the floor cancels in the marginals).

    python scripts/profile_selfplay_phases.py [--envs 4096] [--steps 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.agent import ppo as jppo
from self_play_racing_tpu.agent.ppo import unpack_metrics
from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import selfplay as sp
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.ops import geometry as geo

WINDOWS, REPS = 6, 3


def measure(trainer):
    """ms/update, best of WINDOWS x REPS chained dispatches, one sync each."""
    trainer.runner, m = trainer.update_step(trainer.runner, trainer.aux)
    unpack_metrics(m)  # compile + warm + sync
    dts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        mm = None
        for _ in range(REPS):
            trainer.runner, mm = trainer.update_step(trainer.runner, trainer.aux)
        unpack_metrics(mm)
        dts.append((time.perf_counter() - t0) / REPS)
    return min(dts) * 1e3


def build_trainer(num_envs, num_steps):
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool()
    track = trk.gather_tracks(pool, np.arange(num_envs) % 16)
    cfg = self_play_config(num_envs=num_envs, num_steps=num_steps,
                           total_timesteps=num_envs * num_steps * 100)
    tr = SelfPlayTrainer(cfg, menv.MultiRacingConfig(num_agents=2,
                                                     num_sensors=11), track)
    tr.snapshot_agent()
    tr.select_opponent()
    return tr


# ---- cheap shape-equivalent stubs ------------------------------------------

def cheap_raycast_walls(ox, oy, dx, dy, *a, **kw):
    return jnp.full(ox.shape, 50.0, ox.dtype) + 1e-12 * dx


def cheap_query(x, y, cx, cy, wp_x, wp_y, nrm_x, nrm_y, n_wp, track_width):
    return jnp.mod(jnp.abs(x) * 1e-3, 1.0), jnp.zeros(x.shape, bool)


def cheap_raycast_cars(ox, oy, dx, dy, ccx, ccy, cx, cy, max_dist):
    return jnp.full(ox.shape, float(max_dist), ox.dtype) + 1e-12 * dx


def cheap_sat(ax, ay, bx, by):
    return jnp.zeros(ax.shape[:-1], bool) | (ax[..., 0] > 1e30)


def cheap_opponents(cfg, opp, obs_seats, key):
    return jnp.clip(obs_seats[..., :2] * 0.01, -1.0, 1.0)


def cheap_sample(params, log_std, obs, key):
    action = jnp.clip(obs[:, :2] * 0.01, -1.0, 1.0)
    z = obs[:, 0] * 1e-6
    return action, z, z


def make_cheap_observe(cfg):
    def cheap_observe(c, track, state):
        base = state.x[..., None] * 1e-6                       # [N, A, 1]
        return jnp.broadcast_to(base, state.x.shape + (cfg.obs_dim,)
                                ).astype(jnp.float32)
    return cheap_observe


def make_cheap_update(cfg):
    def cheap_update(cfg_, opt, params, opt_state, log_std, lr, flat, key):
        stats = {name: jnp.zeros((cfg.update_epochs, cfg.num_minibatches),
                                 jnp.float32)
                 for name in ("loss", "pg_loss", "v_loss", "entropy",
                              "approx_kl", "clip_frac", "applied", "computed")}
        # tiny data dep so the flattened batch isn't entirely dead
        stats["loss"] = stats["loss"] + flat.obs[0, 0] * 1e-12
        return params, opt_state, jnp.zeros((), bool), stats
    return cheap_update


SEAMS = {
    "wall_raycast": [(geo, "raycast_walls", cheap_raycast_walls)],
    "track_query": [(geo, "progress_and_collision", cheap_query)],
    "car_raycast": [(geo, "raycast_cars", cheap_raycast_cars)],
    "sat_collisions": [(geo, "rectangles_intersect", cheap_sat)],
    "opponent_mlp": [(sp, "opponent_actions_all_seats", cheap_opponents)],
    "learner_mlp_sample": [(net, "sample_action", cheap_sample)],
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    tr = build_trainer(args.envs, args.steps)
    cfg = tr.cfg
    results = {}
    results["full"] = measure(tr)
    print(f"{'full update':24s} {results['full']:8.1f} ms", file=sys.stderr)

    seams = dict(SEAMS)
    seams["obs_assembly_total"] = [(menv, "observe", make_cheap_observe(
        menv.MultiRacingConfig(num_agents=2, num_sensors=11)))]
    seams["minibatch_update"] = [(jppo, "run_ppo_update",
                                  make_cheap_update(cfg))]

    for name, patches in seams.items():
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        try:
            for mod, attr, stub in patches:
                setattr(mod, attr, stub)
            tr2 = build_trainer(args.envs, args.steps)
            results[f"ablate_{name}"] = measure(tr2)
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        marg = results["full"] - results[f"ablate_{name}"]
        # provisional: the saved artifact recomputes marginals against
        # min(full, full_end) once the end-of-run drift guard has measured
        print(f"{name:24s} ablated {results[f'ablate_{name}']:8.1f} ms "
              f"-> marginal {marg:8.1f} ms (provisional)", file=sys.stderr)

    # GAE has NO row here by design: stubbing compute_gae reproducibly makes
    # the whole update ~20 ms SLOWER (the near-constant advantages change the
    # downstream minibatch fusions), so full - ablated is invalid for it, and
    # a standalone-jitted GAE measures the tunnel's per-dispatch floor, not
    # the device (a ~0.5 ms program reads as 13-16 ms). The exact number comes
    # from the trace instrument (scripts/trace_attribution.py): 0.13 ms/update.

    # guard against tunnel drift over the run: re-measure the full program at
    # the end and attribute against the best of the two (the device's
    # demonstrated rate; slow windows are host/tunnel contention)
    results["full_end"] = measure(build_trainer(args.envs, args.steps))
    print(f"{'full update (re-measure)':24s} {results['full_end']:8.1f} ms",
          file=sys.stderr)

    # derived rows
    full = min(results["full"], results["full_end"])
    marg = {k[len("ablate_"):]: full - v for k, v in results.items()
            if k.startswith("ablate_")}
    marg["obs_features_residual"] = (marg["obs_assembly_total"]
                                     - marg["wall_raycast"]
                                     - marg["car_raycast"])
    accounted = (marg["wall_raycast"] + marg["track_query"]
                 + marg["car_raycast"] + marg["sat_collisions"]
                 + marg["opponent_mlp"] + marg["learner_mlp_sample"]
                 + marg["obs_features_residual"]
                 + marg["minibatch_update"])
    marg["unattributed"] = full - accounted
    print("\nmarginal attribution (ms of the full update):", file=sys.stderr)
    for k, v in marg.items():
        print(f"  {k:24s} {v:8.1f}", file=sys.stderr)
    print(f"  {'full':24s} {full:8.1f}", file=sys.stderr)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "selfplay_phase_profile.json")
    with open(out, "w") as f:
        json.dump({
            "description": "Marginal ablation attribution of the benched A=2 "
                           "self-play update (bench.py tertiary leg, parity "
                           "config). scripts/profile_selfplay_phases.py",
            "num_envs": args.envs, "num_steps": args.steps,
            "ms_per_update": results,
            "marginal_ms": marg,
        }, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
