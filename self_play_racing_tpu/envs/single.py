"""Single-agent racing environment as pure, batched JAX functions.

Reproduces /root/reference/environment/racing_env.py semantics exactly, but as a
branch-free program over a leading ``[num_envs]`` batch axis:

 - obs  = ``num_sensors`` rays in a +-pi/3 cone + [v_fwd, v_lat, ang_vel, steering],
   all normalized (racing_env.py:44-75). The angular-velocity feature is always 0.0
   — the reference never writes ``Car.angular_velocity`` after reset (SURVEY quirk #1).
 - reward = 200*Δprogress (with wraparound fix) + gated checkpoint bonuses (20 at
   0.25/0.50/0.75) + speed*speed_weight while progressing − 60 on crash + finish bonus
   100 + max(0, 200 − steps/10) (racing_env.py:112-150).
 - terminated = crashed | finished; truncated at 3000 steps (racing_env.py:161-162).

The env is split into ``transition`` (state, reward, done — no sensing) and
``observe`` (raycast + kinematic features) so the autoreset wrapper can merge
stepped/reset states first and raycast only once per step.

Observation dtype is always float32, matching the reference's cast chain: ray hits are
cast to f32 *before* normalization (stored into a float32 buffer at racing_env.py:46,51
then divided by the range), remaining features are computed at state dtype and cast at
the end (racing_env.py:75).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops import geometry as geo
from ..ops.dynamics import DEFAULT_CAR, CarSpec, car_update
from .track import TrackArrays


@dataclasses.dataclass(frozen=True)
class RacingConfig:
    """Static configuration (shapes / reward constants). Hashable -> jit-static."""

    num_sensors: int = 7           # racing_env.py:9 default; entry points use 11
    max_sensor_range: float = 50.0
    sensor_cone: float = float(np.pi / 3)  # racing_env.py:45
    # Clamp sensor reads to max_sensor_range. False preserves the reference's
    # unclamped-hit quirk (track.py:199: a hit beyond max range is returned
    # as-is, so obs rays can exceed 1.0). Measured NOT to pair well with
    # relaxed sensing (sensor_lod > 1): clamping LOD reads shifts the ~7% of
    # rays that legitimately read >range under the quirk and raises mean
    # error vs exact-mode obs 30x (docs/DESIGN.md "Relaxed sensing error
    # tail"). Opt in only if bounded observations matter more than exact-mode
    # fidelity — then set it in BOTH training and eval configs.
    clamp_sensor_range: bool = False
    dt: float = 0.05
    max_steps: int = 3000
    speed_weight: float = 8.0      # effective constant in the reference (quirk #2)
    car: CarSpec = DEFAULT_CAR

    # reward shaping constants (racing_env.py:121-150 defaults)
    progress_scale: float = 200.0
    checkpoint_bonus: float = 20.0
    crash_penalty: float = 60.0
    finish_bonus: float = 100.0
    time_bonus_base: float = 200.0
    time_bonus_divisor: float = 10.0

    @property
    def obs_dim(self) -> int:
        return self.num_sensors + 4

    @property
    def action_dim(self) -> int:
        return 2

    def sensor_angles(self) -> np.ndarray:
        """Relative sensor angles, identical to np.linspace at racing_env.py:45."""
        return np.linspace(-self.sensor_cone, self.sensor_cone, self.num_sensors)


@struct.dataclass
class CarState:
    """Batched car state, one entry per env (car.py:17-24)."""

    x: jnp.ndarray
    y: jnp.ndarray
    angle: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    progress: jnp.ndarray
    crashed: jnp.ndarray   # bool
    finished: jnp.ndarray  # bool


@struct.dataclass
class RacingState:
    """Batched env state (racing_env.py:18-26)."""

    car: CarState
    steps: jnp.ndarray          # int32
    last_progress: jnp.ndarray
    last_steering: jnp.ndarray
    cp25: jnp.ndarray           # bool checkpoint flags (racing_env.py:21-25)
    cp50: jnp.ndarray
    cp75: jnp.ndarray


def reset_state(cfg: RacingConfig, track: TrackArrays) -> RacingState:
    """Fresh state for every env in the batch (racing_env.py:86-97, car.py:17-24)."""
    dtype = track.wp_x.dtype
    n = track.wp_x.shape[0]
    zeros = jnp.zeros((n,), dtype)
    false = jnp.zeros((n,), bool)
    car = CarState(
        x=track.start_x.astype(dtype),
        y=track.start_y.astype(dtype),
        angle=track.start_angle.astype(dtype),
        vx=zeros, vy=zeros, progress=zeros,
        crashed=false, finished=false,
    )
    return RacingState(
        car=car,
        steps=jnp.zeros((n,), jnp.int32),
        last_progress=zeros, last_steering=zeros,
        cp25=false, cp50=false, cp75=false,
    )


def observe(cfg: RacingConfig, track: TrackArrays, state: RacingState) -> jnp.ndarray:
    """Observation vector per env, float32 [N, num_sensors+4] (racing_env.py:44-75)."""
    car = state.car
    dtype = car.x.dtype
    rel = jnp.asarray(cfg.sensor_angles(), dtype)                    # [R]
    world = car.angle[:, None] + rel[None, :]                        # [N, R]
    dist = geo.raycast_walls(
        jnp.broadcast_to(car.x[:, None], world.shape),
        jnp.broadcast_to(car.y[:, None], world.shape),
        jnp.cos(world), jnp.sin(world),
        track.seg_sx[:, None, :], track.seg_sy[:, None, :],
        track.seg_vx[:, None, :], track.seg_vy[:, None, :],
        cfg.max_sensor_range,
        seg_c=track.seg_c[:, None, :],
    )                                                                # [N, R]
    if cfg.clamp_sensor_range:
        dist = jnp.minimum(dist, jnp.asarray(cfg.max_sensor_range, dist.dtype))
    rays = dist.astype(jnp.float32) / jnp.float32(cfg.max_sensor_range)

    ca = jnp.cos(car.angle)
    sa = jnp.sin(car.angle)
    max_speed = jnp.asarray(cfg.car.max_speed, dtype)
    v_fwd = jnp.clip((car.vx * ca + car.vy * sa) / max_speed, -1.0, 1.0)
    v_lat = jnp.clip((-car.vx * sa + car.vy * ca) / max_speed, -1.0, 1.0)
    ang_vel = jnp.zeros_like(v_fwd)  # quirk #1: feature is always 0.0
    feats = jnp.stack([v_fwd, v_lat, ang_vel, state.last_steering], axis=-1)
    return jnp.concatenate([rays, feats.astype(jnp.float32)], axis=-1)


def transition(cfg: RacingConfig, track: TrackArrays, state: RacingState, action,
               speed_weight=None):
    """One env step without sensing: (new_state, reward, terminated, truncated, info).

    ``action``: [N, 2] raw policy output; steering clipped to [-1,1], throttle to
    [0,1] (racing_env.py:106-107). ``speed_weight`` may be a traced scalar to support
    annealing; defaults to the config constant.
    """
    dtype = state.car.x.dtype
    car = state.car
    sw = jnp.asarray(cfg.speed_weight if speed_weight is None else speed_weight, dtype)

    steering = jnp.clip(action[..., 0].astype(dtype), -1.0, 1.0)
    throttle = jnp.clip(action[..., 1].astype(dtype), 0.0, 1.0)

    nx, ny, nang, nvx, nvy = car_update(
        car.x, car.y, car.angle, car.vx, car.vy, car.crashed,
        steering, throttle, cfg.dt, cfg.car,
    )
    # progress + wall collision, frozen once crashed (car.py:51-52, 79-80);
    # both track queries share one fused pass over the waypoint arrays
    cx, cy = geo.car_corners(nx, ny, nang, cfg.car.length / 2, cfg.car.width / 2)
    raw_progress, hit_wall = geo.progress_and_collision(
        nx, ny, cx, cy, track.wp_x, track.wp_y, track.nrm_x, track.nrm_y,
        track.n_wp, track.track_width,
    )
    new_progress = jnp.where(car.crashed, car.progress, raw_progress)
    crashed = car.crashed | (~car.crashed & hit_wall)

    steps = state.steps + 1
    p, lp = new_progress, state.last_progress

    # Δprogress with start/finish-line wraparound (racing_env.py:112-116)
    delta = p - lp
    delta = jnp.where((lp > 0.9) & (p < 0.1), (1.0 - lp) + p, delta)
    delta = jnp.where((lp < 0.1) & (p > 0.9), -((1.0 - p) + lp), delta)

    reward = delta * jnp.asarray(cfg.progress_scale, dtype)

    # gated checkpoints, +20 each (racing_env.py:123-135); windows are disjoint so the
    # reference's sequential ifs reduce to these chained updates
    hit25 = ~state.cp25 & (p >= 0.25) & (p < 0.35)
    cp25 = state.cp25 | hit25
    hit50 = cp25 & ~state.cp50 & (p >= 0.50) & (p < 0.60)
    cp50 = state.cp50 | hit50
    hit75 = cp50 & ~state.cp75 & (p >= 0.75) & (p < 0.85)
    cp75 = state.cp75 | hit75
    bonus20 = jnp.asarray(cfg.checkpoint_bonus, dtype)
    reward = reward + bonus20 * (hit25 + hit50 + hit75).astype(dtype)

    # speed shaping while progressing (racing_env.py:137-140)
    speed = jnp.sqrt(nvx**2 + nvy**2)
    speed_ratio = jnp.clip(speed / jnp.asarray(cfg.car.max_speed, dtype), 0.0, 1.0)
    reward = reward + jnp.where(~crashed & (delta > 0), speed_ratio * sw, 0.0)

    # crash penalty (racing_env.py:142-143; terminal, so fires once per episode)
    reward = reward - jnp.where(crashed, jnp.asarray(cfg.crash_penalty, dtype), 0.0)

    # lap completion (racing_env.py:145-150)
    fin_now = cp25 & cp50 & cp75 & (lp > 0.9) & (p < 0.1) & (delta > 0)
    finished = car.finished | fin_now
    time_bonus = jnp.maximum(
        0.0, cfg.time_bonus_base - steps.astype(dtype) / cfg.time_bonus_divisor
    )
    # two separate adds, matching the reference's += ordering exactly
    reward = reward + jnp.where(fin_now, jnp.asarray(cfg.finish_bonus, dtype), 0.0)
    reward = reward + jnp.where(fin_now, time_bonus, 0.0)

    terminated = crashed | finished
    truncated = steps >= cfg.max_steps

    new_state = RacingState(
        car=CarState(x=nx, y=ny, angle=nang, vx=nvx, vy=nvy,
                     progress=new_progress, crashed=crashed, finished=finished),
        steps=steps,
        last_progress=new_progress,
        last_steering=steering,
        cp25=cp25, cp50=cp50, cp75=cp75,
    )
    info = {
        "x": nx, "y": ny,
        "speed": speed,
        "progress": jnp.where(finished, jnp.asarray(1.0, dtype), new_progress),
        "crashed": crashed,
        "finished": finished,
        "reward": reward,
        "progress_delta": delta,
    }
    return new_state, reward, terminated, truncated, info


def info_from_state(cfg: RacingConfig, track: TrackArrays, state: RacingState):
    """Info for a state outside any transition — the Gymnasium reset-info contract
    (racing_env.py:86-102 returns ``_get_info()`` of the fresh state). Same schema
    as ``transition``'s info with the per-transition leaves (reward,
    progress_delta) zeroed, so ``vector.step`` can substitute it on autoreset rows."""
    dtype = state.car.x.dtype
    speed = jnp.sqrt(state.car.vx**2 + state.car.vy**2)
    zero = jnp.zeros_like(speed)
    return {
        "x": state.car.x, "y": state.car.y,
        "speed": speed,
        "progress": jnp.where(state.car.finished, jnp.asarray(1.0, dtype),
                              state.car.progress),
        "crashed": state.car.crashed,
        "finished": state.car.finished,
        "reward": zero,
        "progress_delta": zero,
    }


def reset(cfg: RacingConfig, track: TrackArrays):
    """(state, obs) for a fresh batch."""
    state = reset_state(cfg, track)
    return state, observe(cfg, track, state)


def step(cfg: RacingConfig, track: TrackArrays, state: RacingState, action,
         speed_weight=None):
    """Full env step: (new_state, obs, reward, terminated, truncated, info)."""
    new_state, reward, terminated, truncated, info = transition(
        cfg, track, state, action, speed_weight
    )
    return new_state, observe(cfg, track, new_state), reward, terminated, truncated, info
