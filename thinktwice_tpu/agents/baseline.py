"""Baseline harness agents: the reference's non-learned ego drivers.

TPU equivalents of the stock leaderboard agents (SURVEY H10):
- `npc_control` — leaderboard/leaderboard/autoagents/npc_agent.py:21-79, an
  ego driven by the stock planning API (BasicAgent: fixed target speed,
  brakes for leaders and red lights; agents/navigation/basic_agent.py).
  Here that is pure-pursuit on the dense route + the traffic module's
  front-gap and own-approach red-light governance — the same primitives the
  background NPCs drive with, applied to the ego.
- `dummy_control` — leaderboard/leaderboard/autoagents/dummy_agent.py:68-80,
  a constant control (harness plumbing smoke test).

`human_agent` (pygame teleop) and `ros_agent` (ROS bridge) remain out of
scope: both are interactive I/O shells around the same AutonomousAgent
interface, with no behavior to reproduce in a headless framework.
"""

from __future__ import annotations

import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.geometry import wrap_angle
from thinktwice_tpu.maps.town import TownMap, traffic_light_states
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.sim.traffic import _front_gap, _red_light_dist

NPC_TARGET_SPEED = 20.0 / 3.6  # BasicAgent default 20 km/h (npc_agent.py)


def dummy_control(cfg: Config, town: TownMap, state: WorldState):
    """Constant straight-line crawl (dummy_agent.py run_step returns a fixed
    VehicleControl). Exercises the harness without any driving logic."""
    del cfg, town, state
    return jnp.asarray([0.0, 0.3, 0.0], jnp.float32)


def npc_control(cfg: Config, town: TownMap, state: WorldState):
    """-> (3,) control. Stock-planner ego: route pure pursuit at a fixed
    target speed, stopping for leaders (front gap) and its own approach red
    light — no stop signs, curvature shaping, hazard forecast, or creep
    (BasicAgent has none of those either)."""
    ego = state.ego
    route = state.route
    cum = state.route_cumlen
    idx = state.criteria.route_idx
    n = route.shape[0]

    # lateral: plain pure pursuit (local_planner.py waypoint following)
    L = jnp.clip(2.5 + 0.7 * ego.speed, 3.0, 8.0)
    tidx = jnp.clip(jnp.searchsorted(cum, cum[idx] + L), 0, n - 1)
    target = route[tidx, :2]
    to_t = target - ego.pos
    err = wrap_angle(jnp.arctan2(to_t[1], to_t[0]) - ego.yaw)
    steer = jnp.clip(2.0 * err, -1.0, 1.0)

    # leader gap (same band logic the background traffic uses)
    all_pos = jnp.concatenate([state.traffic.pos, state.walkers.pos], axis=0)
    all_yaw = jnp.concatenate([state.traffic.yaw, state.walkers.yaw], axis=0)
    all_ext = jnp.concatenate(
        [state.traffic.extent, state.walkers.extent], axis=0
    )
    all_act = jnp.concatenate(
        [state.traffic.active, state.walkers.active], axis=0
    )
    gap = _front_gap(
        ego.pos[None], ego.yaw[None], ego.speed[None],
        all_pos, all_yaw, all_ext, all_act,
        jnp.zeros((1, all_pos.shape[0]), bool),
        self_ext_x=ego.extent[0][None],
    )[0]
    v_gap = jnp.clip((gap - 2.5) / 1.2, 0.0, NPC_TARGET_SPEED)

    # own-approach red light (TrafficLightHandler semantics)
    tl_states = traffic_light_states(town, state.time_s)
    d_red = _red_light_dist(town, tl_states, ego.pos[None], ego.yaw[None])[0]
    v_red = jnp.where(
        d_red < 12.0, jnp.clip((d_red - 2.0) / 2.0, 0.0, NPC_TARGET_SPEED),
        NPC_TARGET_SPEED,
    )

    v_des = jnp.minimum(jnp.minimum(v_gap, v_red), NPC_TARGET_SPEED)
    throttle = jnp.clip(0.9 * (v_des - ego.speed), 0.0, 0.75)
    brake = (ego.speed > v_des + 0.7) | ((v_des < 0.2) & (ego.speed > 0.05))
    throttle = jnp.where(brake, 0.0, throttle)
    return jnp.stack([steer, throttle, brake.astype(jnp.float32)])
