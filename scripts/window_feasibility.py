"""Feasibility numbers for a windowed wall raycast with exact fallback.

For window half-widths K: compute per-waypoint D_min = min distance from waypoint w
to any boundary segment OUTSIDE the +-K-waypoint window (host numpy), then roll out
the trained single-agent policy and measure how often a ray's true hit distance
exceeds rho = D_min(w) - |origin - wp_w| (the exactness threshold -> fallback rate).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def seg_point_dist(px, py, sx, sy, vx, vy):
    """Distance from points [P] to segments [S] -> [P, S]."""
    wx = px[:, None] - sx[None, :]
    wy = py[:, None] - sy[None, :]
    vv = vx * vx + vy * vy
    t = np.clip((wx * vx[None, :] + wy * vy[None, :]) / np.where(vv == 0, 1.0, vv),
                0.0, 1.0)
    dx = wx - t * vx[None, :]
    dy = wy - t * vy[None, :]
    return np.sqrt(dx * dx + dy * dy)


def dmin_for_track(g, K):
    """D_min per waypoint: distance to nearest out-of-window segment."""
    wp = g["waypoints"]
    n = len(wp)
    sx, sy = g["seg_start"][:, 0], g["seg_start"][:, 1]
    vx, vy = g["seg_vec"][:, 0], g["seg_vec"][:, 1]
    d = seg_point_dist(wp[:, 0], wp[:, 1], sx, sy, vx, vy)  # [n, 2n]
    # segment j (left) and n+j (right) belong to waypoint j
    wp_of_seg = np.concatenate([np.arange(n), np.arange(n)])
    # circular distance in waypoint index between waypoint w and segment's waypoint
    diff = np.abs(np.arange(n)[:, None] - wp_of_seg[None, :])
    circ = np.minimum(diff, n - diff)
    outside = circ > K  # [n, 2n]
    dmasked = np.where(outside, d, np.inf)
    return dmasked.min(axis=1)  # [n]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from self_play_racing_tpu.envs import single as senv
    from self_play_racing_tpu.envs import track as trk
    from self_play_racing_tpu.envs import vector
    from self_play_racing_tpu.models import actor_critic as net

    np.random.seed(1)  # the reference seeds the global RNG before gen_tracks
    cps = trk.gen_tracks(16, seed=1)
    widths = [float(np.random.RandomState(i).randint(6, 10)) for i in range(16)]
    geoms = [trk.build_track_geometry(cp, w) for cp, w in zip(cps, widths)]

    w_pad = ((max(g["n_wp"] for g in geoms) + 127) // 128) * 128
    Ks = [47, 63, 95, 127]
    dmins = {K: np.stack([
        np.pad(dmin_for_track(g, K), (0, w_pad - g["n_wp"]), constant_values=np.inf)
        for g in geoms]) for K in Ks}
    for K in Ks:
        real = np.concatenate([d[:g["n_wp"]] for d, g in zip(dmins[K], geoms)])
        print(f"K={K:4d}: D_min p1={np.percentile(real,1):6.1f} "
              f"p10={np.percentile(real,10):6.1f} med={np.median(real):6.1f} "
              f"segs scanned {2*(2*K+1)} / 768", file=sys.stderr)

    # --- rollout with the trained agent to histogram hit distances ---
    NUM_ENVS = 4096
    pool = trk.make_track_pool(cps, widths, dtype=jnp.float32)
    track_ids = np.arange(NUM_ENVS) % 16
    track = trk.gather_tracks(pool, track_ids)
    cfg = senv.RacingConfig(num_sensors=11)

    from self_play_racing_tpu.evaluate import load_policy_bundle
    params, log_std, obs_norm = load_policy_bundle("models/single_agent.npz")
    assert obs_norm is None

    state, obs = senv.reset(cfg, track)
    vs = vector.init(state, NUM_ENVS, jax.random.key(0))

    @jax.jit
    def roll(track, vs, obs, key, steps=256):
        def body(carry, _):
            vs, obs, key = carry
            key, akey = jax.random.split(key)
            action, _, _ = net.sample_action(params, log_std, obs, akey)
            vs, nobs, rew, done, term, trunc, info, rec = vector.step(
                vs, action,
                lambda s, a, k: senv.transition(cfg, track, s, a),
                lambda s: senv.observe(cfg, track, s),
                lambda k: senv.reset_state(cfg, track),
            )
            # per-step record: ray dists (t), waypoint idx, origin offset d0
            st = vs.env
            idx = jnp.round(st.car.progress * track.n_wp).astype(jnp.int32) % track.n_wp
            wx = jnp.take_along_axis(track.wp_x, idx[:, None], axis=1)[:, 0]
            wy = jnp.take_along_axis(track.wp_y, idx[:, None], axis=1)[:, 0]
            d0 = jnp.sqrt((st.car.x - wx) ** 2 + (st.car.y - wy) ** 2)
            t_rays = nobs[:, :cfg.num_sensors] * cfg.max_sensor_range
            return (vs, nobs, key), (t_rays, idx, d0)
        (vs, obs, key), recs = jax.lax.scan(body, (vs, obs, key), None, length=steps)
        return vs, obs, key, recs

    vs, obs, key, (t_rays, idx, d0) = roll(track, vs, obs, jax.random.key(1))
    t_rays = np.asarray(t_rays)     # [T, N, R]
    idx = np.asarray(idx)           # [T, N]
    d0 = np.asarray(d0)             # [T, N]
    print(f"rollout: t_rays mean {t_rays.mean():.1f} p50 {np.median(t_rays):.1f} "
          f"p95 {np.percentile(t_rays,95):.1f} max {t_rays.max():.1f}; "
          f"d0 max {d0.max():.2f}", file=sys.stderr)

    tid = track_ids[None, :].repeat(t_rays.shape[0], 0)  # [T, N]
    for K in Ks:
        dm = dmins[K][tid, idx]                           # [T, N]
        rho = dm - d0                                      # [T, N]
        need = t_rays > rho[:, :, None]                    # [T, N, R]
        per_ray = need.mean()
        per_step_any = need.reshape(need.shape[0], -1).any(axis=1).mean()
        worst_step = need.reshape(need.shape[0], -1).sum(axis=1).max()
        print(f"K={K:4d}: fallback per-ray {per_ray:.5f}, steps with any "
              f"{per_step_any:.3f}, worst rays/step {worst_step}", file=sys.stderr)


if __name__ == "__main__":
    main()
