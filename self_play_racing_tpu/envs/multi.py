"""Multi-agent racing environment as pure, batched JAX functions.

Reproduces /root/reference/environment/multi_racing_env.py (+ multi_car.py,
multi_track.py) semantics over a ``[num_envs, num_agents]`` state layout:

 - per-agent obs = ``num_sensors`` rays in a +-pi/2 cone cast against walls *and* all
   car rectangles (raycast_with_cars, multi_track.py:5-26) + 4 kinematic features +
   4 opponent-relative features per opponent (relative position/velocity rotated into
   the agent's frame, normalized by max_track_distance / MAX_SPEED;
   multi_racing_env.py:60-105)
 - actions: steering clipped [-1,1]; throttle remapped (a+1)/2 then clipped [0,1]
   (multi_racing_env.py:216-217 — differs from the single env's raw [0,1] clip)
 - pairwise SAT collision -> both cars' velocities x0.92 + (-5) penalty each
   (multi_racing_env.py:221-231)
 - per-agent reward: 200*Δprogress + speed*18 + checkpoints 25 + finish
   100+max(0,300-steps/15) + one-time crash -160 via has_crashed
   (multi_racing_env.py:155-196) — note the ordering differs from the single env:
   progress, speed, checkpoints, finish, crash
 - placement scoring (finished*10000 + progress*100 + !crashed*10 + 1/finished_step)
   with the reference's (score, idx)-tuple descending sort tie-break (higher agent
   index wins exact ties), winner +250 at episode end (multi_racing_env.py:198-211,
   252-259)
 - terminated = any finished | all crashed; truncated at 3000 steps; dones dict's
   ``__all__`` = terminated | truncated (multi_racing_env.py:247-265)
 - staggered side-by-side start grid along the start normal, spacing WIDTH+1.5, with
   randomized ordering (multi_racing_env.py:118-138)
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops import geometry as geo
from ..ops.dynamics import DEFAULT_CAR, CarSpec, car_update
from .track import TrackArrays


@dataclasses.dataclass(frozen=True)
class MultiRacingConfig:
    num_agents: int = 2
    num_sensors: int = 11          # multi_racing_env.py:9
    max_sensor_range: float = 50.0
    sensor_cone: float = float(np.pi / 2)  # multi_racing_env.py:50
    # Clamp sensor reads to max_sensor_range. False preserves the reference's
    # unclamped-hit quirk (track.py:199); clamping was measured to HURT
    # relaxed-sensing fidelity vs exact-mode obs — see
    # envs/single.py:RacingConfig and docs/DESIGN.md "Relaxed sensing error tail".
    clamp_sensor_range: bool = False
    dt: float = 0.05
    max_steps: int = 3000
    car: CarSpec = DEFAULT_CAR

    # reward/response constants (multi_racing_env.py:167-196, 221-231, 257 defaults)
    progress_scale: float = 200.0
    speed_scale: float = 18.0
    checkpoint_bonus: float = 25.0
    crash_penalty: float = 160.0
    finish_bonus: float = 100.0
    time_bonus_base: float = 300.0
    time_bonus_divisor: float = 15.0
    touch_penalty: float = 5.0
    collision_speed_scale: float = 0.92
    winner_bonus: float = 250.0

    @property
    def obs_dim(self) -> int:
        return self.num_sensors + 4 + (self.num_agents - 1) * 4

    @property
    def action_dim(self) -> int:
        return 2

    def sensor_angles(self) -> np.ndarray:
        return np.linspace(-self.sensor_cone, self.sensor_cone, self.num_sensors)


@struct.dataclass
class MultiState:
    """Batched state: car arrays are [N, A]; steps is [N]."""

    x: jnp.ndarray
    y: jnp.ndarray
    angle: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    progress: jnp.ndarray
    crashed: jnp.ndarray
    finished: jnp.ndarray
    steps: jnp.ndarray          # [N] int32
    last_progress: jnp.ndarray
    last_steering: jnp.ndarray
    cp25: jnp.ndarray
    cp50: jnp.ndarray
    cp75: jnp.ndarray
    has_crashed: jnp.ndarray
    finished_step: jnp.ndarray  # [N, A] int32, 0 = not finished (reference None)
    placement: jnp.ndarray      # [N, A] int32, 0 until episode end


def reset_state(cfg: MultiRacingConfig, track: TrackArrays, key=None,
                position_idx=None) -> MultiState:
    """Fresh state with the staggered start grid (multi_racing_env.py:118-148).

    ``position_idx``: optional [N, A] explicit grid slots (parity testing); otherwise
    a per-env random permutation drawn from ``key``.
    """
    dtype = track.wp_x.dtype
    n = track.wp_x.shape[0]
    a = cfg.num_agents

    if position_idx is None:
        if key is None:
            raise ValueError("reset_state needs a key or explicit position_idx")
        keys = jax.random.split(key, n)
        # agent_order = shuffled agent ids; position of agent i = index of i in it
        order = jax.vmap(lambda k: jax.random.permutation(k, a))(keys)   # [N, A]
        position_idx = jnp.argsort(order, axis=-1)
    position_idx = jnp.asarray(position_idx)

    spacing = jnp.asarray(cfg.car.width + 1.5, dtype)
    center = jnp.asarray((a - 1) / 2.0, dtype)
    offset = (position_idx.astype(dtype) - center) * spacing          # [N, A]

    x = track.start_x[:, None] + track.start_nx[:, None] * offset
    y = track.start_y[:, None] + track.start_ny[:, None] * offset
    zeros = jnp.zeros((n, a), dtype)
    false = jnp.zeros((n, a), bool)
    return MultiState(
        x=x, y=y,
        angle=jnp.broadcast_to(track.start_angle[:, None].astype(dtype), (n, a)),
        vx=zeros, vy=zeros, progress=zeros,
        crashed=false, finished=false,
        steps=jnp.zeros((n,), jnp.int32),
        last_progress=zeros, last_steering=zeros,
        cp25=false, cp50=false, cp75=false,
        has_crashed=false,
        finished_step=jnp.zeros((n, a), jnp.int32),
        placement=jnp.zeros((n, a), jnp.int32),
    )


def observe(cfg: MultiRacingConfig, track: TrackArrays, state: MultiState) -> jnp.ndarray:
    """Per-agent observations, float32 [N, A, obs_dim] (multi_racing_env.py:60-105)."""
    dtype = state.x.dtype
    n, a = state.x.shape
    rel = jnp.asarray(cfg.sensor_angles(), dtype)                    # [R]
    world = state.angle[:, :, None] + rel[None, None, :]             # [N, A, R]

    # walls: one rank-3 [N, R, S] raycast per agent seat (static unroll). The
    # rank-4 [N, A, R, S] form drops the raycast's two-payload reduce out of
    # fusion even below the element threshold (measured +136 us/step at A=2,
    # 4096 envs), while per-agent rank-3 calls each fuse like the single-env
    # path (geometry.py's rank-3 shape contract; fuses at any batch size).
    nr = (n, world.shape[-1])
    per_agent = [
        geo.raycast_walls(
            jnp.broadcast_to(state.x[:, ai, None], nr),
            jnp.broadcast_to(state.y[:, ai, None], nr),
            jnp.cos(world[:, ai, :]), jnp.sin(world[:, ai, :]),
            track.seg_sx[:, None, :], track.seg_sy[:, None, :],
            track.seg_vx[:, None, :], track.seg_vy[:, None, :],
            cfg.max_sensor_range,
            seg_c=track.seg_c[:, None, :],
        )
        for ai in range(a)
    ]
    wall = jnp.stack(per_agent, axis=1)                              # [N, A, R]
    # cars: every ray sees every car's rectangle; cars whose center is within 0.5 of
    # the ray origin are skipped (self-exclusion approximation, multi_track.py:12-14)
    ccx, ccy = geo.car_corners(state.x, state.y, state.angle,
                               cfg.car.length / 2, cfg.car.width / 2)  # [N, A, 4]
    cars = geo.raycast_cars(
        jnp.broadcast_to(state.x[:, :, None], world.shape),
        jnp.broadcast_to(state.y[:, :, None], world.shape),
        jnp.cos(world), jnp.sin(world),
        ccx[:, None, None, :, :], ccy[:, None, None, :, :],
        state.x[:, None, None, :], state.y[:, None, None, :],
        cfg.max_sensor_range,
    )
    dist = jnp.minimum(wall, cars)                                   # [N, A, R]
    if cfg.clamp_sensor_range:
        dist = jnp.minimum(dist, jnp.asarray(cfg.max_sensor_range, dist.dtype))
    rays = dist.astype(jnp.float32) / jnp.float32(cfg.max_sensor_range)

    ca = jnp.cos(state.angle)
    sa = jnp.sin(state.angle)
    max_speed = jnp.asarray(cfg.car.max_speed, dtype)
    v_fwd = jnp.clip((state.vx * ca + state.vy * sa) / max_speed, -1.0, 1.0)
    v_lat = jnp.clip((-state.vx * sa + state.vy * ca) / max_speed, -1.0, 1.0)
    ang_vel = jnp.zeros_like(v_fwd)  # quirk #1 again: never written after reset
    feats = jnp.stack([v_fwd, v_lat, ang_vel, state.last_steering], axis=-1)

    # opponent-relative features, in reference agent-index order (skip self) —
    # one batched [N, A, A] all-pairs computation (identical elementwise math to
    # the reference's per-(i,j) loop, multi_racing_env.py:84-103) with the
    # diagonal dropped by a static gather. The unrolled-Python form emitted
    # 4*A*(A-1) separate ops and bloated compile time at A >= 4.
    max_td = track.max_track_distance[:, None, None].astype(dtype)    # [N, 1, 1]
    rel_x = state.x[:, None, :] - state.x[:, :, None]                 # [N, i, j]
    rel_y = state.y[:, None, :] - state.y[:, :, None]
    rel_vx = state.vx[:, None, :] - state.vx[:, :, None]
    rel_vy = state.vy[:, None, :] - state.vy[:, :, None]
    ca_i, sa_i = ca[:, :, None], sa[:, :, None]
    lrx = jnp.clip((rel_x * ca_i + rel_y * sa_i) / max_td, -1.0, 1.0)
    lry = jnp.clip((-rel_x * sa_i + rel_y * ca_i) / max_td, -1.0, 1.0)
    lvx = jnp.clip((rel_vx * ca_i + rel_vy * sa_i) / max_speed, -1.0, 1.0)
    lvy = jnp.clip((-rel_vx * sa_i + rel_vy * ca_i) / max_speed, -1.0, 1.0)
    pair = jnp.stack([lrx, lry, lvx, lvy], axis=-1)                   # [N, A, A, 4]
    opp_idx = np.asarray([[j for j in range(a) if j != i] for i in range(a)],
                         np.int32).reshape(a, max(a - 1, 0))           # [A, A-1]
    opp = jnp.take_along_axis(
        pair, jnp.asarray(opp_idx)[None, :, :, None], axis=2
    ).reshape(n, a, 4 * (a - 1))                                      # [N, A, 4(A-1)]

    # a == 1 gives an empty opponent block, like the reference's empty
    # opp_features list under np.concatenate (multi_racing_env.py:60-105)
    return jnp.concatenate(
        [rays, feats.astype(jnp.float32), opp.astype(jnp.float32)], axis=-1
    )


# Above this many elements in the [envs, agents, 1+corners, waypoints] query
# grid, XLA's variadic-reduce fusion on TPU stops fusing its operands and
# materializes them in HBM — measured 140 -> 2160 us/step going 31M -> 63M
# elements (4096 envs, W=384, A=4 -> 8 on a v5e). Past the threshold the query
# runs on a merged [envs*agents] batch axis (track rows expanded by fused
# broadcast+reshape, identical per-element math — bit-exact), which tiles
# cleanly at any size: 650 us/step at the same A=8 point, ~5x faster. Below it
# the unmerged form is ~1.6x faster (225 vs 363 us/step at A=4), so both
# layouts are kept and chosen by static shape.
_QUERY_MERGE_THRESHOLD = 48_000_000


def _track_query(track: TrackArrays, x, y, ccx, ccy):
    """progress_and_collision over the [N, A] car grid, layout-switched on the
    static grid size (see _QUERY_MERGE_THRESHOLD)."""
    n, a = x.shape
    w = track.wp_x.shape[-1]
    if n * a * (1 + ccx.shape[-1]) * w <= _QUERY_MERGE_THRESHOLD:
        return geo.progress_and_collision(
            x, y, ccx, ccy, track.wp_x[:, None, :], track.wp_y[:, None, :],
            track.nrm_x[:, None, :], track.nrm_y[:, None, :],
            track.n_wp[:, None], track.track_width[:, None],
        )

    def flat(v):
        return v.reshape((n * a,) + v.shape[2:])

    def expand(v):  # per-env track rows broadcast across agents, lazily
        return jnp.broadcast_to(
            v[:, None], (n, a) + v.shape[1:]).reshape((n * a,) + v.shape[1:])

    prog, hit = geo.progress_and_collision(
        flat(x), flat(y), flat(ccx), flat(ccy),
        expand(track.wp_x), expand(track.wp_y),
        expand(track.nrm_x), expand(track.nrm_y),
        expand(track.n_wp), expand(track.track_width),
    )
    return prog.reshape(n, a), hit.reshape(n, a)


def transition(cfg: MultiRacingConfig, track: TrackArrays, state: MultiState, action):
    """One step: (new_state, rewards [N,A], terminated [N], truncated [N], info).

    ``action``: [N, A, 2]. ``terminated`` is the per-agent shared done (reference's
    dones["0"]/["1"]); the episode-level ``__all__`` done is terminated | truncated.
    """
    dtype = state.x.dtype
    n, a = state.x.shape

    steering = jnp.clip(action[..., 0].astype(dtype), -1.0, 1.0)
    throttle = jnp.clip((action[..., 1].astype(dtype) + 1.0) / 2.0, 0.0, 1.0)

    nx, ny, nang, nvx, nvy = car_update(
        state.x, state.y, state.angle, state.vx, state.vy, state.crashed,
        steering, throttle, cfg.dt, cfg.car,
    )
    ccx, ccy = geo.car_corners(nx, ny, nang, cfg.car.length / 2, cfg.car.width / 2)
    raw_progress, hit_wall = _track_query(track, nx, ny, ccx, ccy)
    new_progress = jnp.where(state.crashed, state.progress, raw_progress)
    crashed = state.crashed | (~state.crashed & hit_wall)

    # pairwise SAT collisions (multi_racing_env.py:221-231): one batched [N, A, A]
    # SAT test with the diagonal masked (the unrolled pair loop emitted A(A-1)/2
    # separate SAT kernels + 2A(A-1) scatter ops). The reference scales a car's
    # velocity once per colliding partner, sequentially; multiplying by the same
    # scalar `hits(k)` times is order-independent, so the where-ladder below is
    # bit-identical to the pair loop. Corners are position-based, unaffected by
    # the velocity response within the step.
    scale = jnp.asarray(cfg.collision_speed_scale, dtype)
    if a > 1:
        shape_aa = (n, a, a, 4)
        hit_all = geo.rectangles_intersect(
            jnp.broadcast_to(ccx[:, :, None, :], shape_aa),
            jnp.broadcast_to(ccy[:, :, None, :], shape_aa),
            jnp.broadcast_to(ccx[:, None, :, :], shape_aa),
            jnp.broadcast_to(ccy[:, None, :, :], shape_aa),
        )                                                             # [N, A, A]
        hit_all = hit_all & ~jnp.eye(a, dtype=bool)[None]
        num_hits = jnp.sum(hit_all, axis=-1)                          # [N, A] int
        for m in range(a - 1):
            more = num_hits > m
            nvx = jnp.where(more, nvx * scale, nvx)
            nvy = jnp.where(more, nvy * scale, nvy)
        touch_penalty = -jnp.asarray(cfg.touch_penalty, dtype) \
            * num_hits.astype(dtype)
    else:
        touch_penalty = jnp.zeros((n, a), dtype)

    steps = state.steps + 1
    p, lp = new_progress, state.last_progress

    # reward machine (multi_racing_env.py:155-196) — order: progress, speed,
    # checkpoints, finish, crash
    delta = p - lp
    delta = jnp.where((lp > 0.9) & (p < 0.1), (1.0 - lp) + p, delta)
    delta = jnp.where((lp < 0.1) & (p > 0.9), -((1.0 - p) + lp), delta)

    reward = delta * jnp.asarray(cfg.progress_scale, dtype)

    speed = jnp.sqrt(nvx**2 + nvy**2)
    speed_ratio = jnp.clip(speed / jnp.asarray(cfg.car.max_speed, dtype), 0.0, 1.0)
    reward = reward + jnp.where(~crashed & (delta > 0),
                                speed_ratio * jnp.asarray(cfg.speed_scale, dtype), 0.0)

    hit25 = ~state.cp25 & (p >= 0.25) & (p < 0.35)
    cp25 = state.cp25 | hit25
    hit50 = cp25 & ~state.cp50 & (p >= 0.50) & (p < 0.60)
    cp50 = state.cp50 | hit50
    hit75 = cp50 & ~state.cp75 & (p >= 0.75) & (p < 0.85)
    cp75 = state.cp75 | hit75
    reward = reward + jnp.asarray(cfg.checkpoint_bonus, dtype) * (hit25 + hit50 + hit75).astype(dtype)

    fin_now = cp25 & cp50 & cp75 & (lp > 0.9) & (p < 0.1) & (delta > 0)
    finished = state.finished | fin_now
    finished_step = jnp.where(fin_now, steps[:, None], state.finished_step)
    time_bonus = jnp.maximum(
        0.0, cfg.time_bonus_base - steps.astype(dtype)[:, None] / cfg.time_bonus_divisor
    )
    reward = reward + jnp.where(fin_now, jnp.asarray(cfg.finish_bonus, dtype) + time_bonus, 0.0)

    crash_now = crashed & ~state.has_crashed
    reward = reward - jnp.where(crash_now, jnp.asarray(cfg.crash_penalty, dtype), 0.0)
    has_crashed = state.has_crashed | crash_now

    reward = reward + touch_penalty

    any_finished = jnp.any(finished, axis=-1)
    all_crashed = jnp.all(crashed, axis=-1)
    terminated = any_finished | all_crashed
    truncated = steps >= cfg.max_steps
    done_all = terminated | truncated

    # placement scoring at episode end (multi_racing_env.py:198-211): descending
    # (score, idx) tuple sort -> higher agent index wins exact score ties
    fs = jnp.where(finished_step != 0, finished_step, 10000).astype(dtype)
    score = (finished.astype(dtype) * 10000.0 + new_progress * 100.0
             + (~crashed).astype(dtype) * 10.0 + 1.0 / fs)
    beats = (score[:, :, None] < score[:, None, :]) | (
        (score[:, :, None] == score[:, None, :])
        & (jnp.arange(a)[None, :, None] < jnp.arange(a)[None, None, :])
    )
    place = 1 + jnp.sum(beats, axis=-1).astype(jnp.int32)  # [N, A]
    placement = jnp.where(done_all[:, None], place, 0)
    reward = reward + jnp.where(done_all[:, None] & (place == 1),
                                jnp.asarray(cfg.winner_bonus, dtype), 0.0)

    new_state = MultiState(
        x=nx, y=ny, angle=nang, vx=nvx, vy=nvy,
        progress=new_progress, crashed=crashed, finished=finished,
        steps=steps, last_progress=new_progress, last_steering=steering,
        cp25=cp25, cp50=cp50, cp75=cp75,
        has_crashed=has_crashed, finished_step=finished_step, placement=placement,
    )
    info = {
        "x": nx, "y": ny, "speed": speed,
        "progress": jnp.where(finished, jnp.asarray(1.0, dtype), new_progress),
        "crashed": crashed, "finished": finished,
        "reward": reward, "placement": placement,
    }
    return new_state, reward, terminated, truncated, info


def info_from_state(cfg: MultiRacingConfig, track: TrackArrays, state: MultiState):
    """Info for a state outside any transition (Gymnasium reset-info contract,
    multi_racing_env.py:107-116): ``transition``'s schema with reward zeroed."""
    dtype = state.x.dtype
    speed = jnp.sqrt(state.vx**2 + state.vy**2)
    return {
        "x": state.x, "y": state.y, "speed": speed,
        "progress": jnp.where(state.finished, jnp.asarray(1.0, dtype),
                              state.progress),
        "crashed": state.crashed, "finished": state.finished,
        "reward": jnp.zeros_like(speed), "placement": state.placement,
    }


def reset(cfg: MultiRacingConfig, track: TrackArrays, key=None, position_idx=None):
    state = reset_state(cfg, track, key, position_idx)
    return state, observe(cfg, track, state)


def step(cfg: MultiRacingConfig, track: TrackArrays, state: MultiState, action):
    new_state, reward, terminated, truncated, info = transition(cfg, track, state, action)
    return new_state, observe(cfg, track, new_state), reward, terminated, truncated, info
