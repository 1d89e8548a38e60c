"""Vectorized kinematic car dynamics.

Reproduces /root/reference/environment/car.py:45-80 exactly, branch-free:
 - heading integration from steering, wrapped into [0, 2*pi)
 - throttle acceleration in the body frame, forward drag + lateral friction*grip
 - speed clamp at MAX_SPEED (rescale only when exceeded)
 - Euler position update
 - sticky ``crashed`` flag: a crashed car is fully frozen (car.py:51-52)

Floating-point note: multiplication orders match the reference left-to-right
(e.g. ``(v_lat * LATERAL_FRICTION) * GRIP``) so f64 trajectories are bit-comparable.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CarSpec:
    """Car physics constants (car.py:4-11)."""

    max_speed: float = 30.0
    acceleration: float = 10.0
    steering_speed: float = 3.0
    drag: float = 0.985
    lateral_friction: float = 0.85
    grip: float = 0.9
    length: float = 4.0
    width: float = 2.0


DEFAULT_CAR = CarSpec()


def car_update(x, y, angle, vx, vy, crashed, steering, throttle, dt=0.05, spec=DEFAULT_CAR):
    """One dynamics step for a batch of cars. All inputs shape ``B``.

    Returns (x, y, angle, vx, vy) with crashed cars frozen at their old values.
    Progress/collision updates against the track are the environment's job (the
    reference couples them inside Car.update, car.py:79-80; here they are separate
    kernels so the env can fuse them with sensing).
    """
    ang = jnp.mod(angle + (steering * spec.steering_speed) * dt, 2.0 * jnp.pi)
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)

    # body-frame velocities (car.py:59-60)
    v_fwd = vx * ca + vy * sa
    v_lat = vx * (-sa) + vy * ca
    v_fwd = (v_fwd + (throttle * spec.acceleration) * dt) * spec.drag
    v_lat = (v_lat * spec.lateral_friction) * spec.grip

    # back to world frame (car.py:66-67)
    nvx = v_fwd * ca - v_lat * sa
    nvy = v_fwd * sa + v_lat * ca

    # clamp speed — rescale only when strictly above max (car.py:70-74)
    speed = jnp.sqrt(nvx**2 + nvy**2)
    over = speed > spec.max_speed
    scale = jnp.where(over, spec.max_speed / jnp.where(over, speed, 1.0), 1.0)
    nvx = jnp.where(over, nvx * scale, nvx)
    nvy = jnp.where(over, nvy * scale, nvy)

    nx = x + nvx * dt
    ny = y + nvy * dt

    keep = crashed
    return (
        jnp.where(keep, x, nx),
        jnp.where(keep, y, ny),
        jnp.where(keep, angle, ang),
        jnp.where(keep, vx, nvx),
        jnp.where(keep, vy, nvy),
    )
