"""Prototype faster raycast / progress kernels and A/B them on the chip vs current.

Variants must match the current kernels to ~1 ulp (same math up to reassociation).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from self_play_racing_tpu.envs import single as senv
from self_play_racing_tpu.envs import track as trk
from self_play_racing_tpu.ops import geometry as geo

NUM_ENVS = 4096
T = 16
REPS = 30
K = 20
_PARALLEL_EPS = 1e-10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:46s} {min(ts)/K*1e6:8.1f} us/step", file=sys.stderr)
    return min(ts)


# ---- raycast variants -----------------------------------------------------------

def raycast_v2(ox, oy, dx, dy, seg_sx, seg_sy, seg_vx, seg_vy, max_dist, seg_c):
    """cn hoisted out of the ray axis: ox/oy have NO ray axis (shape B), dx/dy have a
    trailing ray axis (B + (R,)), segments B + (S,). Returns B + (R,)."""
    cn = oy[..., None] * seg_vx - ox[..., None] * seg_vy + seg_c      # [B, S]
    u = ox[..., None] * dy - oy[..., None] * dx                       # [B, R]
    dotp = (seg_vy[..., None, :] * dx[..., :, None]
            - seg_vx[..., None, :] * dy[..., :, None])                # [B, R, S]
    sn = (seg_sx[..., None, :] * dy[..., :, None]
          - seg_sy[..., None, :] * dx[..., :, None]
          - u[..., None])                                             # [B, R, S]
    valid = jnp.abs(dotp) > _PARALLEL_EPS
    inv = 1.0 / dotp
    t = cn[..., None, :] * inv
    s = sn * inv
    hit = valid & (t >= 0.0) & (s >= 0.0) & (s <= 1.0)
    tmin = jnp.min(jnp.where(hit, t, jnp.inf), axis=-1)
    return jnp.where(jnp.isinf(tmin), jnp.asarray(max_dist, tmin.dtype), tmin)


# ---- progress/collision variants --------------------------------------------------

def pc_v2(x, y, cx, cy, wp_x, wp_y, nrm_x, nrm_y, n_wp, track_width):
    """Single-pass argmin-with-payload via variadic lax.reduce: no second pass over
    the waypoint axis and no [B, 5, W] intermediates handed between fusions."""
    qx = jnp.concatenate([x[..., None], cx], axis=-1)    # B + (Q,)
    qy = jnp.concatenate([y[..., None], cy], axis=-1)
    dx = qx[..., :, None] - wp_x[..., None, :]           # B + (Q, W)
    dy = qy[..., :, None] - wp_y[..., None, :]
    d2 = dx * dx + dy * dy
    proj = dx * nrm_x[..., None, :] + dy * nrm_y[..., None, :]
    w = wp_x.shape[-1]
    idx = jnp.broadcast_to(jax.lax.broadcasted_iota(jnp.int32, (w,), 0), d2.shape)

    def reducer(a, b):
        ad, ai, ap = a
        bd, bi, bp = b
        # first-occurrence argmin: strict less, ties -> smaller index
        take_b = (bd < ad) | ((bd == ad) & (bi < ai))
        return (jnp.where(take_b, bd, ad), jnp.where(take_b, bi, ai),
                jnp.where(take_b, bp, ap))

    init = (jnp.asarray(jnp.inf, d2.dtype), jnp.asarray(2**31 - 1, jnp.int32),
            jnp.asarray(0.0, proj.dtype))
    _, min_idx, min_proj = jax.lax.reduce((d2, idx, proj), init, reducer, (d2.ndim - 1,))
    progress = min_idx[..., 0].astype(wp_x.dtype) / jnp.asarray(n_wp, wp_x.dtype)
    dist = jnp.abs(min_proj[..., 1:])
    tw = jnp.asarray(track_width)
    return progress, jnp.any(dist > tw[..., None], axis=-1)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    from self_play_racing_tpu.utils.profiling import canonical_bench_pool

    pool = canonical_bench_pool(T)
    track = trk.gather_tracks(pool, np.arange(NUM_ENVS) % T)

    scfg = senv.RacingConfig(num_sensors=11)
    state = senv.reset_state(scfg, track)
    car = state.car
    rel = jnp.asarray(scfg.sensor_angles(), jnp.float32)

    key = jax.random.key(0)
    # scatter cars to random track positions for realism
    jitter = jax.random.normal(key, (4, NUM_ENVS), jnp.float32)
    x = car.x + jitter[0] * 2.0
    y = car.y + jitter[1] * 2.0
    ang = car.angle + jitter[2]

    # --- raycast A/B ---
    def loop(fn):
        def run(x, y, ang, track):
            def body(c, _):
                x, y, ang = c
                world = ang[:, None] + rel[None, :]
                d = fn(x, y, ang, world, track)
                return (x + d[:, 0] * 1e-6, y, ang), d.sum()
            c, outs = jax.lax.scan(body, (x, y, ang), None, length=K)
            return outs.sum()
        return jax.jit(run)

    def cur_ray(x, y, ang, world, track):
        return geo.raycast_walls(
            jnp.broadcast_to(x[:, None], world.shape),
            jnp.broadcast_to(y[:, None], world.shape),
            jnp.cos(world), jnp.sin(world),
            track.seg_sx[:, None, :], track.seg_sy[:, None, :],
            track.seg_vx[:, None, :], track.seg_vy[:, None, :],
            50.0, seg_c=track.seg_c[:, None, :])

    def new_ray(x, y, ang, world, track):
        return raycast_v2(x, y, jnp.cos(world), jnp.sin(world),
                          track.seg_sx, track.seg_sy, track.seg_vx, track.seg_vy,
                          50.0, track.seg_c)

    a = loop(cur_ray)(x, y, ang, track)
    b = loop(new_ray)(x, y, ang, track)
    print(f"raycast parity: cur={float(a):.6f} new={float(b):.6f} "
          f"absdiff={abs(float(a)-float(b)):.2e}", file=sys.stderr)
    timeit("raycast current", loop(cur_ray), x, y, ang, track)
    timeit("raycast v2 (cn hoisted)", loop(new_ray), x, y, ang, track)

    # --- progress/collision A/B ---
    def pc_loop(fn):
        def run(x, y, ang, track):
            def body(c, _):
                x, y, ang = c
                cx, cy = geo.car_corners(x, y, ang, 2.0, 1.0)
                p, crash = fn(x, y, cx, cy, track)
                return (x + p * 1e-6, y, ang), p.sum() + crash.sum()
            c, outs = jax.lax.scan(body, (x, y, ang), None, length=K)
            return outs.sum()
        return jax.jit(run)

    def cur_pc(x, y, cx, cy, track):
        return geo.progress_and_collision(
            x, y, cx, cy, track.wp_x, track.wp_y, track.nrm_x, track.nrm_y,
            track.n_wp, track.track_width)

    def new_pc(x, y, cx, cy, track):
        return pc_v2(x, y, cx, cy, track.wp_x, track.wp_y, track.nrm_x, track.nrm_y,
                     track.n_wp, track.track_width)

    a = pc_loop(cur_pc)(x, y, ang, track)
    b = pc_loop(new_pc)(x, y, ang, track)
    print(f"pc parity: cur={float(a):.6f} new={float(b):.6f} "
          f"absdiff={abs(float(a)-float(b)):.2e}", file=sys.stderr)
    timeit("progress+collision current", pc_loop(cur_pc), x, y, ang, track)
    timeit("progress+collision v2 (1-pass reduce)", pc_loop(new_pc), x, y, ang, track)


if __name__ == "__main__":
    main()
