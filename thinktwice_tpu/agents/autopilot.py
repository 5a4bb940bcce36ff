"""Rule-based route-following autopilot for the ego vehicle.

The in-graph analog of the reference's hand-written expert
(leaderboard/team_code/auto_pilot.py — PID route following with hazard and
red-light stops). Used to validate the closed-loop harness and as a traffic
baseline: it should complete routes with a high Driving Score without any
learned weights.
"""

from __future__ import annotations

import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.geometry import wrap_angle
from thinktwice_tpu.maps.town import TownMap, traffic_light_states
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.sim.traffic import _front_gap, _red_light_dist

CRUISE = 5.0
LOOKAHEAD = 5.0


def autopilot_control(cfg: Config, town: TownMap, state: WorldState):
    """-> (3,) control (steer, throttle, brake)."""
    ego = state.ego
    idx = state.criteria.route_idx
    # target point ~LOOKAHEAD meters ahead along the route
    tgt_idx = jnp.clip(idx + int(LOOKAHEAD), 0, state.route.shape[0] - 1)
    target = state.route[tgt_idx, :2]
    to_t = target - ego.pos
    bearing = jnp.arctan2(to_t[1], to_t[0])
    err = wrap_angle(bearing - ego.yaw)
    steer = jnp.clip(2.5 * err, -1.0, 1.0)

    # hazards: nearest actor in the forward corridor + red stop lines
    all_pos = jnp.concatenate([state.traffic.pos, state.walkers.pos], axis=0)
    all_ext = jnp.concatenate([state.traffic.extent, state.walkers.extent], axis=0)
    all_act = jnp.concatenate([state.traffic.active, state.walkers.active], axis=0)
    gap = _front_gap(
        ego.pos[None], ego.yaw[None], ego.speed[None],
        all_pos, all_ext, all_act,
        jnp.zeros((1, all_pos.shape[0]), bool),
    )[0]
    tl_states = traffic_light_states(town, state.time_s)
    d_red = _red_light_dist(town, tl_states, ego.pos[None], ego.yaw[None])[0]

    stop_dist = jnp.minimum(gap, jnp.where(d_red < 20.0, d_red, 1e4))
    # brake hard if obstruction closer than a speed-dependent envelope
    envelope = 4.0 + ego.speed * 1.0
    must_brake = stop_dist < envelope
    v_des = jnp.where(stop_dist < envelope * 2.0, CRUISE * 0.4, CRUISE)

    throttle = jnp.where(ego.speed < v_des, 0.75, 0.0)
    throttle = jnp.where(must_brake, 0.0, throttle)
    brake = must_brake | (ego.speed > v_des + 1.5)
    return jnp.stack([steer, throttle, brake.astype(jnp.float32)])
