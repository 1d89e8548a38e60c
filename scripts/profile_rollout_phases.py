"""Per-phase attribution of the benched rollout (VERDICT r3 next-round #1).

Two complementary instruments, both slope-timed (per-step = (T(L_hi) - T(L_lo)) /
(L_hi - L_lo) over chained scans with one host sync, so the tunnel dispatch floor
and loop-invariant setup cancel):

1. ISOLATED scans: each phase (wall raycast, track query, policy MLP + sampling,
   car dynamics, autoreset/stats plumbing) runs alone in its own lax.scan with a
   minimal carry and a data dependency to defeat DCE. Sum-of-isolated vs full
   measures what fusion composition costs/saves.
2. ABLATIONS of the exact bench program: the full rollout re-jitted with ONE
   phase stubbed to a cheap equivalent (monkeypatched at the geometry/net module
   seam, which the env reads late-bound). full - ablated = the phase's
   *marginal* cost inside the composed program, fusion effects included.

Writes data/rollout_phase_profile.json and prints a table with each phase's
analytic FLOP count and HBM byte traffic so phases can be judged against their
own bound (compute vs bandwidth), not a single global roofline.

    python scripts/profile_rollout_phases.py [--envs 4096] [--layout tiled|eager|grouped]
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

from self_play_racing_tpu.agent.trainer import make_single_env_hooks
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.envs import vector
from self_play_racing_tpu.models import actor_critic as net
from self_play_racing_tpu.ops import geometry as geo

L_HI, L_LO, WINDOWS, REPS = 256, 16, 3, 4


def slope_time(make_scan, *args):
    """Best-of-WINDOWS per-step seconds via two scan lengths (floor cancels)."""
    f_hi = jax.jit(make_scan(L_HI))
    f_lo = jax.jit(make_scan(L_LO))

    def run(f, *a):
        out = f(*a)  # compile + warm
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = f(*a)  # same args: independent dispatches, serial on device
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts.append((time.perf_counter() - t0) / REPS)
        return min(ts)

    t_hi = run(f_hi, *args)
    t_lo = run(f_lo, *args)
    return (t_hi - t_lo) / (L_HI - L_LO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--layout", choices=["tiled", "eager", "grouped"],
                   default="tiled",
                   help="geometry layout (tiled = the production default)")
    p.add_argument("--grouped", action="store_true",
                   help="alias for --layout grouped")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.grouped:
        args.layout = "grouped"

    N = args.envs
    num_tracks = 16
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool(num_tracks)
    if args.layout == "grouped":
        assert N % num_tracks == 0
        track = trk.grouped_pooled_tracks(pool, np.arange(num_tracks),
                                          N // num_tracks)
    elif args.layout == "tiled":
        track = trk.tiled_pooled_tracks(pool, N)
    else:
        track = trk.gather_tracks(pool, np.arange(N) % num_tracks)
    env_cfg = senv.RacingConfig(num_sensors=11)
    hooks = make_single_env_hooks(env_cfg)
    R = env_cfg.num_sensors
    S = int(pool.seg_sx.shape[-1])
    W = int(pool.wp_x.shape[-1])
    D = env_cfg.obs_dim

    params = net.init_params(jax.random.key(0), D, env_cfg.action_dim)
    log_std = jnp.full((env_cfg.action_dim,), -0.5, jnp.float32)

    state, obs0 = jax.jit(lambda t: senv.reset(env_cfg, trk.resolve(t)))(track)
    vstate = vector.init(state, N, jax.random.key(1))
    key = jax.random.key(2)

    results = {}

    # ---------------- full bench rollout ----------------
    def make_full(length, use_hooks=None, use_net=None):
        h = use_hooks or hooks
        sample = use_net or net.sample_action

        def rollout(track, params, vstate, obs, key):
            def one_step(carry, _):
                vstate, obs, key = carry
                key, akey = jax.random.split(key)
                action, logprob, value = sample(params, log_std, obs, akey)
                vstate, next_obs, reward, *_ = vector.step(
                    vstate, action,
                    lambda s, a, k: h.transition(track, s, a, k),
                    lambda s: h.observe(track, s),
                    lambda k: h.reset(track, k),
                )
                return (vstate, next_obs, key), reward.sum()

            (vstate_, obs_, key_), rews = jax.lax.scan(
                one_step, (vstate, obs, key), None, length=length)
            return rews.sum()

        return rollout

    results["full"] = slope_time(make_full, track, params, vstate, obs0, key)
    print(f"{'full rollout':28s} {results['full']*1e6:9.1f} us/step", file=sys.stderr)

    # ---------------- isolated phases ----------------
    car = state.car

    def make_raycast(length):
        rel = jnp.asarray(env_cfg.sensor_angles(), jnp.float32)
        t = trk.resolve(track)

        def f(x, y, angle):
            def step(carry, _):
                x, y, angle = carry
                world = angle[:, None] + rel[None, :]
                dist = geo.raycast_walls(
                    jnp.broadcast_to(x[:, None], world.shape),
                    jnp.broadcast_to(y[:, None], world.shape),
                    jnp.cos(world), jnp.sin(world),
                    t.seg_sx[:, None, :], t.seg_sy[:, None, :],
                    t.seg_vx[:, None, :], t.seg_vy[:, None, :],
                    env_cfg.max_sensor_range, seg_c=t.seg_c[:, None, :])
                return (x + 1e-12 * dist.sum(-1), y, angle), None

            (x, y, angle), _ = jax.lax.scan(step, (x, y, angle), None,
                                            length=length)
            return x.sum()

        return f

    results["raycast"] = slope_time(make_raycast, car.x, car.y, car.angle)
    print(f"{'raycast (isolated)':28s} {results['raycast']*1e6:9.1f} us/step",
          file=sys.stderr)

    def make_query(length):
        t = trk.resolve(track)

        def f(x, y, angle):
            def step(carry, _):
                x, y, angle = carry
                cx, cy = geo.car_corners(x, y, angle, env_cfg.car.length / 2,
                                         env_cfg.car.width / 2)
                prog, hit = geo.progress_and_collision(
                    x, y, cx, cy, t.wp_x, t.wp_y, t.nrm_x, t.nrm_y,
                    t.n_wp, t.track_width)
                return (x + 1e-12 * prog, y, angle), None

            (x, y, angle), _ = jax.lax.scan(step, (x, y, angle), None,
                                            length=length)
            return x.sum()

        return f

    results["query"] = slope_time(make_query, car.x, car.y, car.angle)
    print(f"{'track query (isolated)':28s} {results['query']*1e6:9.1f} us/step",
          file=sys.stderr)

    def make_mlp(length):
        def f(params, obs, key):
            def step(carry, _):
                obs, key = carry
                key, akey = jax.random.split(key)
                action, logprob, value = net.sample_action(params, log_std, obs,
                                                           akey)
                return (obs * (1.0 + 1e-12 * logprob[:, None]), key), None

            (obs, key), _ = jax.lax.scan(step, (obs, key), None, length=length)
            return obs.sum()

        return f

    results["mlp_sample"] = slope_time(make_mlp, params, obs0, key)
    print(f"{'policy MLP+sample (isolated)':28s} "
          f"{results['mlp_sample']*1e6:9.1f} us/step", file=sys.stderr)

    def make_dynamics(length):
        from self_play_racing_tpu.ops.dynamics import car_update
        action = jnp.tile(jnp.asarray([[0.1, 0.7]], jnp.float32), (N, 1))

        def f(x, y, angle, vx, vy):
            crashed = jnp.zeros((N,), bool)

            def step(carry, _):
                x, y, angle, vx, vy = carry
                nx, ny, nang, nvx, nvy = car_update(
                    x, y, angle, vx, vy, crashed,
                    action[:, 0], action[:, 1], env_cfg.dt, env_cfg.car)
                return (nx, ny, nang, nvx, nvy), None

            out, _ = jax.lax.scan(step, (x, y, angle, vx, vy), None,
                                  length=length)
            return out[0].sum()

        return f

    results["dynamics"] = slope_time(make_dynamics, car.x, car.y, car.angle,
                                     car.vx, car.vy)
    print(f"{'car dynamics (isolated)':28s} {results['dynamics']*1e6:9.1f} us/step",
          file=sys.stderr)

    def make_plumbing(length):
        """vector.step autoreset/stats/RNG plumbing with stub env fns: the full
        state pytree merge, episode stats, key splits — none of the sensing."""
        t = trk.resolve(track)

        def stub_transition(s, a, k):
            info = senv.info_from_state(env_cfg, t, s)
            return s, s.car.x * 0.0, s.car.crashed, s.steps >= 10**9, info

        def stub_observe(s):
            return jnp.zeros((N, D), jnp.float32)

        def stub_reset(k):
            return senv.reset_state(env_cfg, t)

        def f(vstate, key):
            action = jnp.zeros((N, 2), jnp.float32)

            def step(carry, _):
                vstate, key = carry
                key, _ = jax.random.split(key)
                vstate, o, r, *_ = vector.step(vstate, action, stub_transition,
                                               stub_observe, stub_reset)
                return (vstate, key), r.sum()

            (vstate_, key_), rews = jax.lax.scan(step, (vstate, key), None,
                                                 length=length)
            return rews.sum()

        return f

    results["plumbing"] = slope_time(make_plumbing, vstate, key)
    print(f"{'autoreset/stats (isolated)':28s} "
          f"{results['plumbing']*1e6:9.1f} us/step", file=sys.stderr)

    # ---------------- ablations (monkeypatched seams) ----------------
    real_raycast = geo.raycast_walls
    real_query = geo.progress_and_collision

    def cheap_raycast(ox, oy, dx, dy, *a, **kw):
        md = kw.get("seg_c")
        return jnp.full(ox.shape, 50.0, ox.dtype) + 1e-12 * dx

    def cheap_query(x, y, cx, cy, wp_x, wp_y, nrm_x, nrm_y, n_wp, track_width):
        prog = jnp.mod(jnp.abs(x) * 0.001, 1.0)
        return prog, jnp.zeros(x.shape, bool)

    try:
        geo.raycast_walls = cheap_raycast
        senv.geo.raycast_walls = cheap_raycast
        results["full_minus_raycast"] = slope_time(
            make_full, track, params, vstate, obs0, key)
    finally:
        geo.raycast_walls = real_raycast
        senv.geo.raycast_walls = real_raycast
    print(f"{'full - raycast (ablated)':28s} "
          f"{results['full_minus_raycast']*1e6:9.1f} us/step", file=sys.stderr)

    try:
        geo.progress_and_collision = cheap_query
        senv.geo.progress_and_collision = cheap_query
        results["full_minus_query"] = slope_time(
            make_full, track, params, vstate, obs0, key)
    finally:
        geo.progress_and_collision = real_query
        senv.geo.progress_and_collision = real_query
    print(f"{'full - query (ablated)':28s} "
          f"{results['full_minus_query']*1e6:9.1f} us/step", file=sys.stderr)

    def cheap_sample(params, log_std, obs, key):
        action = obs[:, :2] * 0.01
        z = obs[:, 0] * 0.0
        return action, z, z

    results["full_minus_mlp"] = slope_time(
        lambda L: make_full(L, use_net=cheap_sample),
        track, params, vstate, obs0, key)
    print(f"{'full - MLP (ablated)':28s} "
          f"{results['full_minus_mlp']*1e6:9.1f} us/step", file=sys.stderr)

    def make_noreset(length):
        """Plain stepping without the autoreset merge/stats (not semantically
        equivalent — measures what the vector plumbing costs the composition)."""

        def rollout(track, params, state, obs, key):
            def one_step(carry, _):
                state, obs, key = carry
                key, akey = jax.random.split(key)
                action, logprob, value = net.sample_action(params, log_std, obs,
                                                           akey)
                state, reward, term, trunc, info = hooks.transition(
                    track, state, action, akey)
                next_obs = hooks.observe(track, state)
                return (state, next_obs, key), reward.sum()

            (state_, obs_, key_), rews = jax.lax.scan(
                one_step, (state, obs, key), None, length=length)
            return rews.sum()

        return rollout

    results["full_minus_autoreset"] = slope_time(
        make_noreset, track, params, state, obs0, key)
    print(f"{'full - autoreset (ablated)':28s} "
          f"{results['full_minus_autoreset']*1e6:9.1f} us/step", file=sys.stderr)

    # ---------------- bounds table ----------------
    BW = 8.19e11   # v5e HBM, datasheet-class estimate; printed, not load-bearing
    flops = {
        "raycast": R * S * 11 + S * 5,
        "query": 5 * W * 10,
        "mlp_sample": 2 * 2 * (D * 64 + 64 * 64) + 2 * (64 * 2 + 64) + 12 * 64,
        "dynamics": 60,
        "plumbing": 40,
    }
    pool_resident = args.layout in ("tiled", "grouped")
    geom_bytes = 0 if pool_resident else 5 * S * 4  # per-env segment reads
    query_bytes = 0 if pool_resident else 4 * W * 4
    bytes_per_step = {
        "raycast": geom_bytes + R * 4,
        "query": query_bytes + 8,
        "mlp_sample": D * 4 + 64 * 2 * 2 + 2 * 4,  # obs + activations + action
        "dynamics": 10 * 4,
        "plumbing": 2 * 16 * 4,                    # state pytree read+write
    }
    print(f"\n{'phase':28s} {'us/step':>9s} {'flops/env':>10s} "
          f"{'bytes/env':>10s} {'compute-bound us':>17s} {'HBM-bound us':>13s}",
          file=sys.stderr)
    for k in ("raycast", "query", "mlp_sample", "dynamics", "plumbing"):
        f_bound = flops[k] * N / 4.19e12 * 1e6
        b_bound = bytes_per_step[k] * N / BW * 1e6
        print(f"{k:28s} {results[k]*1e6:9.1f} {flops[k]:10,d} "
              f"{bytes_per_step[k]:10,d} {f_bound:17.1f} {b_bound:13.1f}",
              file=sys.stderr)

    iso_sum = sum(results[k] for k in
                  ("raycast", "query", "mlp_sample", "dynamics", "plumbing"))
    print(f"\nsum of isolated phases: {iso_sum*1e6:.1f} vs full "
          f"{results['full']*1e6:.1f} us/step "
          f"(composition {'saves' if iso_sum > results['full'] else 'costs'} "
          f"{abs(results['full']-iso_sum)*1e6:.1f})", file=sys.stderr)
    for k in ("raycast", "query", "mlp"):
        kk = f"full_minus_{k}"
        if kk in results:
            print(f"marginal {k:10s} (full - ablated): "
                  f"{(results['full']-results[kk])*1e6:9.1f} us/step",
                  file=sys.stderr)
    print(f"marginal autoreset (full - ablated): "
          f"{(results['full']-results['full_minus_autoreset'])*1e6:9.1f} us/step",
          file=sys.stderr)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "rollout_phase_profile.json")
    payload = {
        "description": "Per-phase rollout attribution, us/step at "
                       f"{N} envs (canonical pinned pool W={W} S={S}); "
                       "isolated slope-timed scans + monkeypatched ablations "
                       "of the exact bench program. "
                       "scripts/profile_rollout_phases.py",
        "num_envs": N, "layout": args.layout,
        "us_per_step": {k: v * 1e6 for k, v in results.items()},
        "flops_per_env_step": flops,
        "hbm_bytes_per_env_step": bytes_per_step,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
