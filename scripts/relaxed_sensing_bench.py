"""Relaxed sensing (--sensor-lod) artifact: speedup AND behavioral equivalence.

VERDICT r3 #7: the exact wall raycast is the A=8 flop wall; a relaxed
(coarsened) sensing mode can break it IF the behavior transfers. This script
quantifies both sides into data/relaxed_sensing.json:

1. SPEED — full A=8 self-play update (the raycast-dominated operating point)
   at sensor_lod 1 / 2 / 4 on the canonical pinned pool.
2. BEHAVIOR — two same-budget scale trainings (A=2, 50M steps) at lod=1 and
   lod=4, both evaluated on the EXACT-sensing held-out 40x5 grid (seed 42):
   an agent trained on LOD walls must still drive real walls.
3. OBS ERROR — ray-error distribution (mean / p99 / >2-unit tail) between
   exact and LOD sensors over on-policy-ish random rollouts.

  python scripts/relaxed_sensing_bench.py [--skip-train]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.agent.ppo import unpack_metrics
from self_play_racing_tpu.agent.self_play import SelfPlayTrainer
from self_play_racing_tpu.configs import self_play_config
from self_play_racing_tpu.envs import multi as menv
from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk

NUM_ENVS, NUM_STEPS, NUM_TRACKS = 4096, 128, 16


def canonical_pool(lod):
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    return canonical_bench_pool(NUM_TRACKS, sensor_lod=lod)


def speed_row(lod, num_agents=8):
    pool = canonical_pool(lod)
    track = trk.gather_tracks(pool, np.arange(NUM_ENVS) % NUM_TRACKS)
    cfg = self_play_config(num_envs=NUM_ENVS, num_steps=NUM_STEPS,
                           total_timesteps=NUM_ENVS * NUM_STEPS * 100,
                           opponent_per_env=True, reset_envs_each_update=False)
    tr = SelfPlayTrainer(
        cfg, menv.MultiRacingConfig(num_agents=num_agents, num_sensors=11),
        track)
    tr.snapshot_agent()
    tr.select_opponent()
    tr.runner, m = tr.update_step(tr.runner, tr.aux)
    unpack_metrics(m)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            tr.runner, m = tr.update_step(tr.runner, tr.aux)
        unpack_metrics(m)
        dts.append((time.perf_counter() - t0) / 3)
    d = min(dts)
    row = {"sensor_lod": lod, "num_agents": num_agents,
           "segments": int(pool.seg_sx.shape[-1]),
           "ms_per_update": d * 1e3,
           "env_steps_per_s": cfg.batch_size / d,
           "agent_steps_per_s": cfg.batch_size * num_agents / d}
    print(json.dumps(row), file=sys.stderr)
    return row


def lod_outward_bound(exact, relaxed):
    """Max outward distance d_out from the true boundary to the LOD polyline,
    per pool: the geometric driver of the grazing-ray overshoot (a ray crossing
    the true wall at incidence angle theta travels ~d_out/sin(theta) further
    before crossing the LOD polyline — docs/DESIGN.md 'Relaxed sensing error
    tail'). Sampled densely along every LOD segment against the true segments."""
    d_out = 0.0
    for t in range(NUM_TRACKS):
        es = np.stack([np.asarray(exact.seg_sx[t]), np.asarray(exact.seg_sy[t])], -1)
        ev = np.stack([np.asarray(exact.seg_vx[t]), np.asarray(exact.seg_vy[t])], -1)
        live = (np.abs(ev) > 0).any(-1)
        es, ev = es[live], ev[live]
        rs = np.stack([np.asarray(relaxed.seg_sx[t]), np.asarray(relaxed.seg_sy[t])], -1)
        rv = np.stack([np.asarray(relaxed.seg_vx[t]), np.asarray(relaxed.seg_vy[t])], -1)
        livr = (np.abs(rv) > 0).any(-1)
        rs, rv = rs[livr], rv[livr]
        # sample 8 points per LOD segment; min distance to any true segment
        u = np.linspace(0.0, 1.0, 8)
        pts = (rs[:, None, :] + u[None, :, None] * rv[:, None, :]).reshape(-1, 2)
        w = pts[:, None, :] - es[None, :, :]                  # [P, S, 2]
        seg_len2 = np.maximum((ev * ev).sum(-1), 1e-12)
        tproj = np.clip((w * ev[None]).sum(-1) / seg_len2, 0.0, 1.0)
        closest = es[None] + tproj[..., None] * ev[None]
        dist = np.sqrt(((pts[:, None, :] - closest) ** 2).sum(-1)).min(-1)
        d_out = max(d_out, float(dist.max()))
    return d_out


def obs_error_stats(lod):
    """Ray-error tails exact vs LOD, with and without the opt-in range clamp
    (clamp_sensor_range). Production relaxed training runs UNCLAMPED — the
    unclamped row is what trained policies see; the clamped row is the
    measurement that showed clamping makes LOD obs LESS faithful to exact-mode
    obs (the reference's unclamped-hit quirk reads >range on ~7% of rays), so
    train_scale deliberately does not pair the knob with sensor_lod
    (docs/DESIGN.md 'Relaxed sensing error tail')."""
    exact = canonical_pool(1)
    relaxed = canonical_pool(lod)
    n = 512
    cfg = senv.RacingConfig(num_sensors=11)
    cfg_clamp = senv.RacingConfig(num_sensors=11, clamp_sensor_range=True)
    te = trk.gather_tracks(exact, np.arange(n) % NUM_TRACKS)
    tl = trk.gather_tracks(relaxed, np.arange(n) % NUM_TRACKS)
    state, _ = jax.jit(lambda t: senv.reset(cfg, t))(te)
    step = jax.jit(lambda t, s, a: senv.step(cfg, t, s, a))
    obs_fn = jax.jit(lambda t, s: senv.observe(cfg, t, s))
    obs_fn_c = jax.jit(lambda t, s: senv.observe(cfg_clamp, t, s))
    rng = np.random.RandomState(0)
    errs, errs_c = [], []
    se = state
    for _ in range(100):
        a = jnp.asarray(rng.uniform([-1, 0], [1, 1], (n, 2)), jnp.float32)
        se, obs_e, *_ = step(te, se, a)
        obs_l = obs_fn(tl, se)
        obs_lc = obs_fn_c(tl, se)
        errs.append(np.abs(np.asarray(obs_e[:, :11] - obs_l[:, :11])) * 50.0)
        errs_c.append(np.abs(np.asarray(obs_e[:, :11] - obs_lc[:, :11])) * 50.0)
    e = np.concatenate([x.ravel() for x in errs])
    ec = np.concatenate([x.ravel() for x in errs_c])
    return {"sensor_lod": lod, "mean": float(e.mean()),
            "p99": float(np.percentile(e, 99)),
            "frac_over_2_units": float((e > 2).mean()),
            "max": float(e.max()),
            "clamped": {"mean": float(ec.mean()),
                        "p99": float(np.percentile(ec, 99)),
                        "frac_over_2_units": float((ec > 2).mean()),
                        "max": float(ec.max())},
            "d_out_units": lod_outward_bound(exact, relaxed)}


def behavior_leg(lod, budget=50_000_000, tmpdir="/tmp/relaxed_sensing"):
    from self_play_racing_tpu.evaluate import evaluate_multi_agent_overall
    from self_play_racing_tpu.train import train_scale
    from self_play_racing_tpu.utils.metrics import build_eval_grid

    os.makedirs(tmpdir, exist_ok=True)
    out = os.path.join(tmpdir, f"agent_lod{lod}.npz")
    info = os.path.join(tmpdir, f"info_lod{lod}.json")
    t0 = time.perf_counter()
    train_scale(total_timesteps=budget, num_envs=NUM_ENVS, num_steps=NUM_STEPS,
                num_tracks=NUM_TRACKS, out=out, info_out=info,
                checkpoint_dir=os.path.join(tmpdir, f"ck{lod}"),
                checkpoint_every=10**9, sensor_lod=lod)
    wall = time.perf_counter() - t0
    # held-out EXACT-sensing grid — both agents face the true walls
    grid = build_eval_grid(num_tracks=40, num_runs=5, seed=42)
    res = evaluate_multi_agent_overall(grid, out)
    return {"sensor_lod": lod, "train_steps": budget,
            "train_wall_s": wall,
            "exact_grid_success_rate": res.get("success_rate"),
            "exact_grid_crash_rate": res.get("crash_rate"),
            "exact_grid_avg_speed": res.get("avg_speed")}


def behavior_leg_a8(lod, budget=500_000_000, tmpdir="/tmp/relaxed_a8"):
    """Same-budget A=8 leg at production scale (VERDICT r4 #3: the exact-
    sensing control for the 500M relaxed flagship run): train 500M env-steps
    of 8-car self-play at the given sensor LOD, then evaluate on the
    EXACT-sensing held-out grid. Results merge into relaxed_sensing.json as
    ``behavior_a8`` and land in data/{eval,training}_info_8car_*_500M.json."""
    from self_play_racing_tpu.evaluate import evaluate_multi_agent_overall
    from self_play_racing_tpu.train import train_scale
    from self_play_racing_tpu.utils.metrics import build_eval_grid

    # stable names for the two shipped legs; other LODs get their own files so
    # they can never shadow (or silently reuse) a different LOD's model, and
    # non-default budgets get budget-suffixed files for the same reason
    tag = {1: "exact", 4: "relaxed"}.get(lod, f"relaxed_lod{lod}")
    suffix = f"{budget // 1_000_000}M"
    os.makedirs(tmpdir, exist_ok=True)
    out = os.path.join(ROOT, "models", f"self_play_agent_8car_{tag}_{suffix}.npz")
    info = os.path.join(ROOT, "data", f"training_info_8car_{tag}_{suffix}.json")
    prev = os.path.join(ROOT, "data", f"eval_info_8car_{tag}_{suffix}.json")
    prev_row = None
    if os.path.exists(prev):
        with open(prev) as f:
            prev_row = json.load(f)
    reusable = (os.path.exists(out) and os.path.exists(info) and prev_row
                and prev_row.get("sensor_lod_train") == lod
                and prev_row.get("steps") == budget)
    if reusable:
        # model already trained at THIS lod/budget (eval-only rerun): reuse it
        wall = prev_row.get("wall_s")
        print(f"reusing trained model {out}", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        train_scale(total_timesteps=budget, num_envs=NUM_ENVS,
                    num_steps=NUM_STEPS, num_tracks=NUM_TRACKS, num_agents=8,
                    out=out, info_out=info,
                    checkpoint_dir=os.path.join(tmpdir, f"ck{lod}"),
                    checkpoint_every=10**9, sensor_lod=lod)
        wall = time.perf_counter() - t0
    grid = build_eval_grid(num_tracks=40, num_runs=5, seed=42)
    res = evaluate_multi_agent_overall(grid, out, num_agents=8)
    row = {"wall_s": wall, "steps": budget, "num_agents": 8,
           "sensor_lod_train": lod, "eval_sensing": "exact",
           **res}
    with open(os.path.join(ROOT, "data",
                           f"eval_info_8car_{tag}_{suffix}.json"), "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row), file=sys.stderr)
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--budget", type=int, default=None,
                   help="env-step budget per behavior leg (default: 50M for "
                        "the A=2 legs, 500M for --a8 legs)")
    p.add_argument("--a8", nargs="*", type=int, metavar="LOD",
                   help="run ONLY the A=8 behavior legs at these LODs "
                        "(e.g. --a8 1 4) and merge behavior_a8 into the "
                        "artifact")
    args = p.parse_args(argv)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    out = os.path.join(ROOT, "data", "relaxed_sensing.json")
    if args.a8 is not None:
        lods = args.a8 or [1, 4]
        a8_budget = args.budget if args.budget is not None else 500_000_000
        rows = [behavior_leg_a8(lod, budget=a8_budget) for lod in lods]
        payload = {}
        if os.path.exists(out):
            with open(out) as f:
                payload = json.load(f)
        merged = {r["sensor_lod_train"]: r
                  for r in payload.get("behavior_a8", [])}
        merged.update({r["sensor_lod_train"]: r for r in rows})
        payload["behavior_a8"] = [merged[k] for k in sorted(merged)]
        with open(out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {out}")
        return

    payload = {
        "description": "Opt-in relaxed sensing (make_track_pool sensor_lod): "
                       "chord-LOD sensor walls with conservative outward "
                       "offsets. Speed at the A=8 raycast-wall operating "
                       "point; behavioral transfer = same-budget trainings "
                       "evaluated on the EXACT-sensing held-out grid. "
                       "scripts/relaxed_sensing_bench.py",
        "speed_a8": [speed_row(lod) for lod in (1, 2, 4)],
        "obs_error": [obs_error_stats(lod) for lod in (2, 4)],
    }
    if not args.skip_train:
        a2_budget = args.budget if args.budget is not None else 50_000_000
        payload["behavior"] = [behavior_leg(1, a2_budget),
                               behavior_leg(4, a2_budget)]
    if os.path.exists(out):  # preserve sections a full rerun doesn't touch
        with open(out) as f:
            old = json.load(f)
        for k, v in old.items():
            payload.setdefault(k, v)
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
