"""ThinkTwice closed-loop agent: model outputs -> vehicle control, in-graph.

Re-implements the two control paths + rule fusion of the reference:
- `process_action` (encoder_decoder_framework.py:268-304): Beta mode of the
  final refine layer's (alpha, beta) -> (acc, steer) -> throttle/brake,
- `control_pid` (:309-390, TCP-lineage): waypoint-vector desired speed +
  aim-point steering PID with target-point outlier rules,
- the fusion rules of ThinkTwiceAgent.run_step
  (leaderboard/team_code/thinktwice_agent.py:456-529): brake if either path
  brakes, throttle clamped near the speed limit, transfuser-style creep after
  a stuck window.

Everything is a pure function over (model outputs, AgentState carry), so the
whole agent rides inside the `lax.scan` world rollout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from thinktwice_tpu.agents.pid import PIDState, pid_init, pid_step
from thinktwice_tpu.agents.roach import beta_mode

# TCP/ThinkTwice control constants (configs/thinktwice.py:42-57)
TURN_KP, TURN_KI, TURN_KD, TURN_N = 0.75, 0.75, 0.3, 40
SPEED_KP, SPEED_KI, SPEED_KD, SPEED_N = 5.0, 0.5, 1.0, 40
BRAKE_SPEED = 0.4
BRAKE_RATIO = 1.1
CLIP_DELTA = 0.25
AIM_DIST = 4.0
ANGLE_THRESH = 0.3
DIST_THRESH = 10.0

# fusion rules (thinktwice_agent.py:473-529)
MAX_THROTTLE = 0.75
MIN_ACT_SPEED_STRAIGHT = 3.5   # m/s + 0.05 headroom when straight
MIN_ACT_SPEED_TURN = 1.5
CREEP_STUCK_TICKS = 20
CREEP_DURATION = 30
CREEP_THROTTLE = 0.4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AgentState:
    turn_pid: PIDState
    speed_pid: PIDState
    stuck_ticks: jax.Array   # () i32
    creep_ticks: jax.Array   # () i32


def agent_init() -> AgentState:
    return AgentState(
        turn_pid=pid_init(TURN_N),
        speed_pid=pid_init(SPEED_N),
        stuck_ticks=jnp.zeros((), jnp.int32),
        creep_ticks=jnp.zeros((), jnp.int32),
    )


def process_action(alpha, beta):
    """Final-layer Beta mode -> (steer, throttle, brake)
    (encoder_decoder_framework.py:268-304)."""
    act = beta_mode(alpha[None], beta[None])[0]   # (2,) in [-1, 1]
    acc, steer = act[0], act[1]
    throttle = jnp.clip(acc, 0.0, 1.0)
    brake = jnp.clip(-acc, 0.0, 1.0)
    return jnp.clip(steer, -1.0, 1.0), throttle, brake


def control_pid(agent: AgentState, waypoints, speed, target):
    """waypoints (T, 2) ego frame (x fwd, y right); target (2,). Returns
    (steer, throttle, brake_bool, desired_speed, new AgentState).

    The reference flips the waypoint axes before use (:320-322, its network
    frame is (right, fwd)); ours are already (fwd, right) so the math below
    uses [fwd, right] directly with angle = atan2(right, fwd)/90deg.
    """
    T = waypoints.shape[0]
    # desired speed: mean inter-waypoint distance * 2 (:333-337)
    seg = waypoints[1:] - waypoints[:-1]
    desired_speed = jnp.mean(jnp.linalg.norm(seg, axis=-1)) * 2.0

    # aim point: waypoint whose midpoint norm is closest to AIM_DIST (:338-343)
    mids = 0.5 * (waypoints[1:] + waypoints[:-1])
    norms = jnp.linalg.norm(mids, axis=-1)
    best = jnp.argmin(jnp.abs(AIM_DIST - norms))
    aim = waypoints[best]

    aim_last = waypoints[-1] - waypoints[-2]

    def angle_of(v):
        # degrees(pi/2 - atan2(y_fwd, x_right)) / 90 in the reference frame
        # == atan2(right, fwd) in ours, normalized to [-2, 2]
        return jnp.arctan2(v[1], v[0]) / (jnp.pi / 2)

    angle = angle_of(aim)
    angle_last = angle_of(aim_last)
    angle_target = angle_of(target)

    use_target = (jnp.abs(angle_target) < jnp.abs(angle)) | (
        (jnp.abs(angle_target - angle_last) > ANGLE_THRESH)
        & (target[0] < DIST_THRESH)
    )
    angle_final = jnp.where(use_target, angle_target, angle)
    angle_final = jnp.where(speed < 0.01, 0.0, angle_final)

    steer, turn_pid = pid_step(agent.turn_pid, angle_final, TURN_KP, TURN_KI, TURN_KD)
    steer = jnp.clip(steer, -1.0, 1.0)

    brake = (desired_speed < BRAKE_SPEED) | (
        speed / jnp.maximum(desired_speed, 1e-5) > BRAKE_RATIO
    )
    delta = jnp.clip(desired_speed - speed, 0.0, CLIP_DELTA)
    throttle, speed_pid = pid_step(agent.speed_pid, delta, SPEED_KP, SPEED_KI, SPEED_KD)
    throttle = jnp.where(brake, 0.0, jnp.clip(throttle, 0.0, 1.0))

    new_agent = dataclasses.replace(agent, turn_pid=turn_pid, speed_pid=speed_pid)
    return steer, throttle, brake, desired_speed, new_agent


def fuse_controls(
    agent: AgentState,
    steer_net, throttle_net, brake_net,
    steer_pid, throttle_pid, brake_pid,
    speed,
    is_turning,
):
    """Rule fusion (thinktwice_agent.py:456-529) -> (control (3,), AgentState)."""
    steer = 0.5 * (steer_net + steer_pid)
    throttle = 0.5 * (throttle_net + throttle_pid)
    brake = (brake_net > 0.2) | brake_pid

    # speed-limit clamp: cut throttle just above the acting speed limit
    limit = jnp.where(is_turning, MIN_ACT_SPEED_TURN, MIN_ACT_SPEED_STRAIGHT)
    throttle = jnp.where(speed > limit + 0.05, 0.0, throttle)
    throttle = jnp.clip(throttle, 0.0, MAX_THROTTLE)

    # stuck -> creep (transfuser-style)
    stuck = speed < 0.1
    stuck_ticks = jnp.where(stuck, agent.stuck_ticks + 1, 0)
    start_creep = stuck_ticks > CREEP_STUCK_TICKS
    creep_ticks = jnp.where(
        start_creep,
        CREEP_DURATION,
        jnp.maximum(agent.creep_ticks - 1, 0),
    )
    creeping = creep_ticks > 0
    throttle = jnp.where(creeping, jnp.maximum(throttle, CREEP_THROTTLE), throttle)
    brake = jnp.where(creeping, False, brake)
    stuck_ticks = jnp.where(creeping, 0, stuck_ticks)

    control = jnp.stack([steer, throttle, brake.astype(jnp.float32)])
    new_agent = dataclasses.replace(
        agent, stuck_ticks=stuck_ticks, creep_ticks=creep_ticks
    )
    return control, new_agent
