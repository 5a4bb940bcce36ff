"""Vehicle dynamics: the World-on-Rails kinematic bicycle model.

This is the reference's own forward model of the ego vehicle — ThinkTwice uses
it to forward-integrate its GPS buffer every tick (EgoModel,
leaderboard/team_code/thinktwice_agent.py:92-130, constants tuned by the
World-on-Rails authors against CARLA). Here it *is* the vehicle dynamics for
the in-graph world, with an optional speed-proportional drag so full-throttle
speed saturates (CARLA's engine model does; pass drag=0 for exact EgoModel
arithmetic).

All functions are pure jnp and broadcast over leading batch axes, so the same
code integrates the ego, 128 traffic vehicles, and 64 vmapped worlds.
"""

from __future__ import annotations

import jax.numpy as jnp

from thinktwice_tpu.config import SimConfig
from thinktwice_tpu.geometry import wrap_angle


def bicycle_step(
    cfg: SimConfig,
    pos,
    yaw,
    speed,
    steer,
    throttle,
    brake,
    dt: float | None = None,
    drag: float = 0.0,
):
    """One bicycle-model integration step.

    Args: pos (..., 2), yaw (...,), speed (...,) >= 0, controls in
    steer [-1, 1], throttle [0, 1], brake {0, 1} (or [0, 1] treated as
    threshold > 0.5 like the reference's uint8 cast).
    Returns (pos', yaw', speed').
    """
    if dt is None:
        dt = cfg.dt
    braking = brake > 0.5
    accel = jnp.where(braking, cfg.brake_accel, cfg.throt_accel * throttle)
    accel = accel - drag * speed

    wheel = cfg.steer_gain * steer
    beta = jnp.arctan(cfg.rear_wb / (cfg.front_wb + cfg.rear_wb) * jnp.tan(wheel))

    heading = yaw + beta
    new_pos = pos + speed[..., None] * jnp.stack(
        [jnp.cos(heading), jnp.sin(heading)], axis=-1
    ) * dt
    new_yaw = wrap_angle(yaw + speed / cfg.rear_wb * jnp.sin(beta) * dt)
    new_speed = jnp.maximum(speed + accel * dt, 0.0)
    return new_pos, new_yaw, new_speed


def point_mass_step(pos, yaw, speed, yaw_rate, accel, dt: float):
    """Simple unicycle integrator for walkers / scripted scenario actors."""
    new_yaw = wrap_angle(yaw + yaw_rate * dt)
    new_pos = pos + speed[..., None] * jnp.stack(
        [jnp.cos(new_yaw), jnp.sin(new_yaw)], axis=-1
    ) * dt
    new_speed = jnp.maximum(speed + accel * dt, 0.0)
    return new_pos, new_yaw, new_speed
