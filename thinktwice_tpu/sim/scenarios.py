"""Adversarial scenarios as data-driven pure state machines.

The reference builds py_trees behavior trees per scenario
(scenario_runner/srunner/scenarios/, triggered by ScenarioTriggerer when the
ego nears a trigger transform — atomic_behaviors.py:2368-2464). Here each
scenario is a row in `ScenarioState`: an integer `kind`, a trigger position,
a small state machine (armed -> running -> done), and a handle to the actor it
drives. `step_scenarios` advances all slots in one vectorized pass and returns
actor overrides + an ego steering-noise term.

Kinds implemented (ids registered in KIND_*):
- DYNAMIC_CROSSING (object_crash_vehicle.py DynamicObjectCrossing): a walker
  darts across the road in front of the ego when it comes within trigger
  distance.
- CONTROL_LOSS (control_loss.py ControlLoss): steering noise injected on the
  ego for a fixed duration, simulating debris.
- LEAD_VEHICLE_BRAKE (follow_leading_vehicle.py FollowLeadingVehicle): an NPC
  ahead of the ego brakes to a stop for a few seconds, then resumes (resume is
  handled by the normal traffic policy once the override ends).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.sim.state import ScenarioState, TrafficState, WalkerState

KIND_EMPTY = 0
KIND_DYNAMIC_CROSSING = 1
KIND_CONTROL_LOSS = 2
KIND_LEAD_VEHICLE_BRAKE = 3

ARMED, RUNNING, DONE = 0, 1, 2

CROSSING_SPEED = 2.0      # m/s walker dash speed
CROSSING_DURATION = 6.0   # s
CONTROL_LOSS_DURATION = 3.0
CONTROL_LOSS_NOISE = 0.15  # steer noise amplitude
LEAD_BRAKE_DURATION = 5.0


def step_scenarios(
    cfg: Config,
    scen: ScenarioState,
    ego_pos,
    walkers: WalkerState,
    traffic: TrafficState,
    rng,
    dt: float,
):
    """Advance every scenario slot one tick.

    Returns (new_scen, new_walkers, traffic_speed_override, steer_noise).
    traffic_speed_override: (V,) f32 desired-speed cap (1e4 = no override).
    """
    S = scen.kind.shape[0]
    d_trig = jnp.linalg.norm(scen.trigger_pos - ego_pos[None], axis=-1)
    trigger_dist = jnp.where(scen.param[:, 0] > 0, scen.param[:, 0], 15.0)

    fire = (scen.state == ARMED) & (scen.kind != KIND_EMPTY) & (d_trig < trigger_dist)

    duration = jnp.where(
        scen.kind == KIND_DYNAMIC_CROSSING,
        CROSSING_DURATION,
        jnp.where(
            scen.kind == KIND_CONTROL_LOSS,
            CONTROL_LOSS_DURATION,
            LEAD_BRAKE_DURATION,
        ),
    )
    new_timer = jnp.where(
        scen.state == RUNNING, scen.timer + dt, jnp.where(fire, 0.0, scen.timer)
    )
    finish = (scen.state == RUNNING) & (new_timer > duration)
    new_state = jnp.where(
        fire, RUNNING, jnp.where(finish, DONE, scen.state)
    ).astype(jnp.int32)

    # --- walker activation for DYNAMIC_CROSSING ---------------------------
    # param = [trigger_dist, walk_yaw, _, _]; walker starts at trigger_pos
    # offset to the roadside and dashes along walk_yaw.
    W = walkers.pos.shape[0]
    slot_onehot = jax.nn.one_hot(scen.actor_idx, W, dtype=bool)  # (S, W)
    is_crossing = scen.kind == KIND_DYNAMIC_CROSSING

    activate = (fire & is_crossing)[:, None] & slot_onehot        # (S, W)
    deactivate = (finish & is_crossing)[:, None] & slot_onehot
    act_any = jnp.any(activate, axis=0)                           # (W,)
    deact_any = jnp.any(deactivate, axis=0)

    # start pose per walker slot from whichever scenario activates it
    start_pos = jnp.einsum("sw,sc->wc", activate.astype(jnp.float32), scen.trigger_pos)
    start_yaw = jnp.einsum("sw,s->w", activate.astype(jnp.float32), scen.param[:, 1])

    new_wlk = WalkerState(
        pos=jnp.where(act_any[:, None], start_pos, walkers.pos),
        yaw=jnp.where(act_any, start_yaw, walkers.yaw),
        speed=jnp.where(
            act_any, CROSSING_SPEED, jnp.where(deact_any, 0.0, walkers.speed)
        ),
        extent=walkers.extent,
        active=(walkers.active | act_any) & ~deact_any,
    )

    # --- lead-vehicle brake override --------------------------------------
    V = traffic.pos.shape[0]
    veh_onehot = jax.nn.one_hot(scen.actor_idx, V, dtype=jnp.float32)  # (S, V)
    braking = ((new_state == RUNNING) & (scen.kind == KIND_LEAD_VEHICLE_BRAKE)).astype(
        jnp.float32
    )
    brake_mask = jnp.einsum("sv,s->v", veh_onehot, braking) > 0.5
    speed_override = jnp.where(brake_mask, 0.0, 1e4)

    # --- ego steering noise for CONTROL_LOSS -------------------------------
    noise_active = jnp.any(
        (new_state == RUNNING) & (scen.kind == KIND_CONTROL_LOSS)
    )
    steer_noise = jnp.where(
        noise_active,
        CONTROL_LOSS_NOISE * jax.random.normal(rng, ()),
        0.0,
    )

    new_scen = ScenarioState(
        kind=scen.kind,
        trigger_pos=scen.trigger_pos,
        state=new_state,
        timer=new_timer,
        actor_idx=scen.actor_idx,
        param=scen.param,
    )
    return new_scen, new_wlk, speed_override, steer_noise
