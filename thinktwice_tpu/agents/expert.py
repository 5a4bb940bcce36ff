"""Closed-loop Roach expert: drive + collect supervision, fully in-graph.

Re-creates the data-collection agent
(leaderboard/team_code/roach_ap_agent_data_collection.py:94-899) as pure
functions over WorldState:

- observation: privileged birdview + state vector
  [throttle, steer, brake, gear, vel_x, vel_y]
  (roach/utils/rl_birdview_wrapper.py state flattening),
- policy cadence: every 2nd tick (10 Hz) with the action held in between
  (roach_ap_agent:462-465),
- rule-based emergency brake from a geometric hazard forecast
  (_is_vehicle_hazard :536-569, _is_walker_hazard :519-534) which also sets
  the `only_ap_brake` supervision flag,
- dataset frame every 10th tick (2 Hz, :501-502): measurements + Roach
  supervision (action, alpha/beta, value, features, cnn feature grids).

`collect_rollout` scans macro-steps so the heavy observation renders exactly
once per saved frame cadence; stacked outputs come back as one pytree —
vmapped over worlds (train/collect.py, parallel/worlds.py) this replaces the
reference's one-CARLA-server-per-GPU collection fleet.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents.roach import (
    RoachPolicy,
    acc_to_control,
    beta_mode,
)
from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap
from thinktwice_tpu.sensors.birdview import birdview_from_state
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.sim.step import step_world


def state_vector(state: WorldState) -> jax.Array:
    """[throttle, steer, brake, gear, vel_x, vel_y] in ego frame. The bicycle
    model has no lateral slip, so vel = (speed, 0)."""
    ctrl = state.ego.control  # (steer, throttle, brake)
    return jnp.stack(
        [
            ctrl[1],
            ctrl[0],
            ctrl[2],
            jnp.asarray(1.0),
            state.ego.speed,
            jnp.asarray(0.0),
        ]
    )


def hazard_brake(
    cfg: Config, state: WorldState, stopped_cone: bool = False
) -> jax.Array:
    """Emergency-brake rule with ego+actor motion forecast
    (roach_ap_agent _is_vehicle_hazard:536-569, _is_walker_hazard:519-534):
    both the ego and every actor are extrapolated along their current
    velocity over a ~2 s horizon, and the forecast BOXES are tested for
    overlap (separating-axis, geometry.obb_overlap). Box-exact forecasting
    replaces round-2's point-corridor margins, which both missed corner
    clips (a crossing car reaching the ego's front corner keeps center
    separation ~4-5 m) and phantom-braked behind queues. The forecast only
    sweeps MOVING vehicles; stopped leaders are handled by the reference's
    distance-cone rule below, applied to all vehicles exactly as
    _is_vehicle_hazard does. Returns () bool."""
    from thinktwice_tpu.geometry import obb_overlap

    ego = state.ego
    fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])
    spd = jnp.maximum(ego.speed, 2.0)                # floor: creeping forecast
    ego_v = fwd * spd

    ts = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0])
    ego_t = ego.pos[None, :] + ts[:, None] * ego_v[None, :]   # (T, 2)
    # inflate: 0.3 m safety cushion + half the inter-sample sweep so the
    # discrete timesteps cover the continuous path
    sweep_pad = 0.25 * spd
    ego_ext = ego.extent + jnp.asarray([0.3 + sweep_pad, 0.3])

    def forecast_hit(pos, yaw, speed, ext, active):
        vel = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1) * speed[:, None]
        act_t = pos[None, :, :] + ts[:, None, None] * vel[None, :, :]  # (T,A,2)
        pad = jnp.stack([0.2 + 0.25 * speed, jnp.full_like(speed, 0.2)], -1)
        ov = obb_overlap(
            ego_t[:, None, :], ego.yaw, ego_ext,
            act_t, yaw[None, :], ext[None, :, :] + pad[None, :, :],
        )
        return jnp.any(ov & active[None, :])

    veh = forecast_hit(
        state.traffic.pos, state.traffic.yaw, state.traffic.speed,
        state.traffic.extent,
        state.traffic.active & (state.traffic.speed > 0.3),
    )
    wlk = forecast_hit(
        state.walkers.pos, state.walkers.yaw, state.walkers.speed,
        state.walkers.extent, state.walkers.active,
    )

    # Reference cone rule (_is_vehicle_hazard:536-569), verbatim geometry:
    # brake for ANY vehicle — moving or stopped — whose center is within
    # s1 = max(10, 3·ego_speed) metres, inside a ±30° bearing cone, and
    # either roughly co-heading (Δyaw ≤ 60°) or dead ahead (bearing < 15°).
    # This is what keeps the reference collector from rear-ending stopped
    # queues; the motion forecast above deliberately ignores stopped
    # vehicles (a stopped leader is the gap law's job) so without this the
    # learned expert plows into standing traffic at full throttle
    # (runs/expert_rl5_town05_long.json: 23 vehicle collisions, RC 93).
    # Opt-in (`stopped_cone`): the policy-driven expert needs it, but the
    # rule-based autopilot zeroes v_des on hazard and already follows queues
    # with its own gap law — the cone would freeze it 10 m behind traffic.
    if not stopped_cone:
        return veh | wlk
    s1 = jnp.maximum(10.0, 3.0 * ego.speed)
    rel = state.traffic.pos - ego.pos[None, :]                # (V, 2)
    dist = jnp.linalg.norm(rel, axis=-1)
    rel_hat = rel / (dist[:, None] + 1e-4)
    cos_bearing = rel_hat @ fwd                               # cos(angle_to_car)
    cos_heading = jnp.cos(state.traffic.yaw - ego.yaw)        # cos(Δyaw)
    cone = (
        state.traffic.active
        & (dist <= s1)
        & (cos_bearing >= jnp.cos(jnp.deg2rad(30.0)))
        & (
            (cos_heading >= jnp.cos(jnp.deg2rad(60.0)))
            | (cos_bearing > jnp.cos(jnp.deg2rad(15.0)))
        )
    )
    return veh | wlk | jnp.any(cone)


def expert_control(
    cfg: Config, params, town: TownMap, state: WorldState
) -> tuple[jax.Array, dict[str, Any]]:
    """One policy evaluation -> (control (3,), supervision dict)."""
    obs = birdview_from_state(cfg.birdview, town, state)
    sv = state_vector(state)
    out = RoachPolicy(
        features_dim=cfg.roach.features_dim,
        states_neurons=cfg.roach.states_neurons,
        policy_head_arch=cfg.roach.policy_head,
        value_head_arch=cfg.roach.value_head,
        action_dim=cfg.roach.action_dim,
    ).apply(params, obs[None], sv[None])

    action = beta_mode(out["alpha"], out["beta"])[0]          # (2,)
    control = acc_to_control(action[None])[0]                 # (3,)

    brake_now = hazard_brake(cfg, state, stopped_cone=True)

    # Red-light / stop-sign rule brake — a DOCUMENTED DEVIATION from the
    # reference collector, which applies only the collision brake
    # (roach_ap_agent:477-482) and leaves traffic lights to the Roach
    # policy. The reference's policy had 11.8M env steps to learn lights
    # (ppo_policy.py ckpt_11833344); ours has a BC warm start plus a few
    # hundred PPO iterations, and its residual red-light rate (0.08-0.10/km,
    # runs/expert_rl{5b,6}_town05_long.json) multiplies away the driving
    # score (0.7^n). The privileged collector's job is clean supervision —
    # the same reasoning that justifies the reference's own collision
    # override — so reds/stops get the same only_ap_brake treatment, using
    # the exact stop-line geometry the criteria charge (autopilot's caps).
    from thinktwice_tpu.agents.autopilot import junction_yield, red_sign_caps

    v_red, d_red, v_sign, d_sign = red_sign_caps(cfg, town, state)
    spd = state.ego.speed
    brake_red = ((d_red < 30.0) & (spd > v_red + 0.5)) | (d_red < 4.5)
    # proximity-gated like brake_red: without the d_sign gate, the no-sign
    # case (v_sign = CRUISE) force-braked the expert anywhere above
    # CRUISE + 0.5 m/s — a hidden global speed cap (ADVICE r4)
    brake_sign = ((d_sign < 12.0) & (spd > v_sign + 0.5)) | (v_sign < 0.2)
    # junction-entry yield (same deadlock geometry as the autopilot's — the
    # expert wedged Town05 Long route 18 at 31% the same way): hold before
    # the crossing stream; once the crosser stops, the cone above paces it
    # and the 20 s NPC recycle clears the mouth.
    v_yield, d_conf, w_arc = junction_yield(cfg, town, state)
    brake_yield = ((d_conf < w_arc - 1.0) & (spd > v_yield + 0.5)) | (d_conf < 4.0)
    brake_now = brake_now | brake_red | brake_sign | brake_yield
    only_ap_brake = brake_now & (control[2] < 0.5)
    control = jnp.where(
        brake_now,
        jnp.stack([control[0], jnp.asarray(0.0), jnp.asarray(1.0)]),
        control,
    )

    supervision = {
        "action": action,
        "alpha": out["alpha"][0],
        "beta": out["beta"][0],
        "value": out["value"][0, 0],
        "features": out["features"][0],
        # distillation grids at 21/10/4/2 resolution = conv layers 3..6
        # (thinktwice_decoder.py feature losses; XtMaCNN cnn_feature list)
        "cnn_features": tuple(f[0] for f in out["cnn_features"][2:]),
        "only_ap_brake": only_ap_brake,
        "birdview": obs,
        "state_vec": sv,
    }
    return control, supervision


def make_expert_policy(cfg: Config, params):
    """policy_fn for sim.step.rollout (control only, every tick)."""

    def policy_fn(cfg_, town, state):
        control, _ = expert_control(cfg, params, town, state)
        return control

    return policy_fn


@dataclasses.dataclass(frozen=True)
class Frame:
    """One saved dataset frame (≈ measurements JSON + supervision npy)."""

    pos: jax.Array
    yaw: jax.Array
    speed: jax.Array
    control: jax.Array
    target_point: jax.Array     # next sparse route target in ego frame
    route_completion: jax.Array
    command: jax.Array          # () i32 RoadOption - 1 (train.collect)
    supervision: dict[str, Any]


jax.tree_util.register_dataclass(
    Frame,
    data_fields=["pos", "yaw", "speed", "control", "target_point",
                 "route_completion", "command", "supervision"],
    meta_fields=[],
)


def _target_point(state: WorldState, lookahead_m: float = 50.0) -> jax.Array:
    """Ego-frame coordinates of the route point ~lookahead_m ahead (the
    target_point input of the student model; planner.py windowed target)."""
    idx = state.criteria.route_idx
    cum = state.route_cumlen
    target_s = cum[idx] + lookahead_m
    tidx = jnp.searchsorted(cum, target_s)
    tidx = jnp.clip(tidx, 0, state.route.shape[0] - 1)
    rel = state.route[tidx, :2] - state.ego.pos
    c, s = jnp.cos(-state.ego.yaw), jnp.sin(-state.ego.yaw)
    return jnp.stack([rel[0] * c - rel[1] * s, rel[0] * s + rel[1] * c])


def collect_rollout(
    cfg: Config,
    params,
    town: TownMap,
    state: WorldState,
    n_frames: int,
    ticks_per_frame: int = 10,
    policy_every: int = 2,
):
    """Drive the expert and record a frame every `ticks_per_frame` ticks
    (2 Hz at the 20 Hz sim rate, roach_ap_agent:501). Returns
    (final_state, Frames stacked on axis 0)."""

    def macro(carry, _):
        st, held = carry

        def tick(inner, k):
            st_i, held_i = inner
            recompute = (k % policy_every) == 0

            def fresh():
                c, _ = expert_control(cfg, params, town, st_i)
                return c

            ctrl = jax.lax.cond(recompute, fresh, lambda: held_i)
            st_o, _ = step_world(cfg, town, st_i, ctrl)
            return (st_o, ctrl), None

        # record supervision at the *start* of the macro step, then advance
        from thinktwice_tpu.train.collect import route_command

        ctrl_now, sup = expert_control(cfg, params, town, st)
        frame = Frame(
            pos=st.ego.pos,
            yaw=st.ego.yaw,
            speed=st.ego.speed,
            control=ctrl_now,
            target_point=_target_point(st),
            route_completion=st.criteria.route_completion,
            command=route_command(town, st.route, st.criteria.route_idx),
            supervision=sup,
        )
        (st, held), _ = jax.lax.scan(
            tick, (st, ctrl_now), jnp.arange(ticks_per_frame)
        )
        return (st, held), frame

    (final, _), frames = jax.lax.scan(
        macro, (state, jnp.zeros(3)), None, length=n_frames
    )
    return final, frames
