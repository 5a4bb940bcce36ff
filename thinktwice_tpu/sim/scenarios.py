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
KIND_CROSSING_VEHICLE = 4   # Signal/NoSignalJunctionCrossingRoute: an NPC
                            # barrels through the junction across the ego path
KIND_ONCOMING_VEHICLE = 5   # ManeuverOppositeDirection: an NPC drives at the
                            # ego in its own lane
KIND_VEHICLE_TURNING = 6    # Scenario4 VehicleTurningRoute
                            # (object_crash_vehicle.py): a cyclist crosses the
                            # lane the ego is turning into
KIND_BLOCKED_OVERTAKE = 7   # Scenario5 OtherLeadingVehicle
                            # (other_leading_vehicle.py): the lead decelerates
                            # while an adjacent-lane vehicle blocks the
                            # overtake (blocker slot index in param[3])
KIND_TL_MANIPULATOR = 8     # srunner TrafficLightManipulator
                            # (atomic_behaviors.py:2100-2270): while running,
                            # lights near the trigger whose heading matches
                            # param[1] are forced to the state in param[3]
                            # (0 green / 2 red) — the staging primitive the
                            # signalized-junction scenarios use to create a
                            # crossing conflict. Applied as an override in
                            # step_world via scenario_tl_override; no actor
                            # slot is consumed.

ARMED, RUNNING, DONE = 0, 1, 2

CROSSING_SPEED = 2.0      # m/s walker dash speed
CROSSING_DURATION = 6.0   # s
CONTROL_LOSS_DURATION = 3.0
CONTROL_LOSS_NOISE = 0.15  # steer noise amplitude
LEAD_BRAKE_DURATION = 12.0    # cruise + standstill phase (ego must stop)
LEAD_BRAKE_DELAY = 3.0        # seconds of cruising before the sudden stop
LEAD_CRUISE_SPEED = 6.0
CROSS_VEHICLE_SPEED = 8.0
CROSS_VEHICLE_DURATION = 6.0
ONCOMING_SPEED = 6.0
ONCOMING_DURATION = 5.0
CYCLIST_SPEED = 4.0           # VehicleTurningRoute crossing speed
CYCLIST_DURATION = 8.0
CYCLIST_EXTENT = (0.9, 0.4)   # bicycle-sized box
LEAD_SLOW_SPEED = 4.0         # OtherLeadingVehicle decelerated lead speed
BLOCKER_SPEED = 5.5
OVERTAKE_DURATION = 14.0
WALKER_SIDE_OFFSET = 6.0      # roadside spawn distance from the lane center
TL_FORCE_DURATION = 20.0      # s a manipulated light phase is held
TL_FORCE_RADIUS = 25.0        # m around the trigger a light can be grabbed


def step_scenarios(
    cfg: Config,
    scen: ScenarioState,
    ego_pos,
    walkers: WalkerState,
    traffic: TrafficState,
    rng,
    dt: float,
    ego_speed=None,
):
    """Advance every scenario slot one tick.

    Returns (new_scen, new_walkers, new_traffic, traffic_speed_override,
    steer_noise). traffic_speed_override: (V,) f32 desired-speed cap
    (1e4 = no override); vehicle scenarios additionally take direct pose
    control of their actor via the returned TrafficState.
    """
    S = scen.kind.shape[0]
    d_trig = jnp.linalg.norm(scen.trigger_pos - ego_pos[None], axis=-1)
    trigger_dist = jnp.where(scen.param[:, 0] > 0, scen.param[:, 0], 15.0)

    fire = (scen.state == ARMED) & (scen.kind != KIND_EMPTY) & (d_trig < trigger_dist)

    durations = jnp.asarray(
        [
            1e9,                   # EMPTY (never)
            CROSSING_DURATION,     # DYNAMIC_CROSSING
            CONTROL_LOSS_DURATION,
            LEAD_BRAKE_DURATION,
            CROSS_VEHICLE_DURATION,
            ONCOMING_DURATION,
            CYCLIST_DURATION,
            OVERTAKE_DURATION,
            TL_FORCE_DURATION,
        ]
    )
    duration = durations[jnp.clip(scen.kind, 0, 8)]
    new_timer = jnp.where(
        scen.state == RUNNING, scen.timer + dt, jnp.where(fire, 0.0, scen.timer)
    )
    finish = (scen.state == RUNNING) & (new_timer > duration)
    new_state = jnp.where(
        fire, RUNNING, jnp.where(finish, DONE, scen.state)
    ).astype(jnp.int32)

    # --- walker activation for DYNAMIC_CROSSING ---------------------------
    # param = [trigger_dist, walk_yaw, side_offset, _]. Reference spawn
    # geometry (object_crash_vehicle.py DynamicObjectCrossing
    # _calculate_base_transform + TTC sync): the walker starts at the
    # ROADSIDE — trigger point displaced side_offset meters against the walk
    # direction — and dashes across at a speed timed so it reaches the lane
    # center as the ego arrives (dash = side_offset / (d_trig / ego_speed)).
    W = walkers.pos.shape[0]
    slot_onehot = jax.nn.one_hot(scen.actor_idx, W, dtype=bool)  # (S, W)
    is_crossing = scen.kind == KIND_DYNAMIC_CROSSING

    activate = (fire & is_crossing)[:, None] & slot_onehot        # (S, W)
    deactivate = (finish & is_crossing)[:, None] & slot_onehot
    act_any = jnp.any(activate, axis=0)                           # (W,)
    deact_any = jnp.any(deactivate, axis=0)

    side = jnp.where(scen.param[:, 2] > 0, scen.param[:, 2], WALKER_SIDE_OFFSET)
    walk_dir = jnp.stack(
        [jnp.cos(scen.param[:, 1]), jnp.sin(scen.param[:, 1])], axis=-1
    )                                                             # (S, 2)
    roadside = scen.trigger_pos - side[:, None] * walk_dir        # (S, 2)
    espd = jnp.maximum(ego_speed if ego_speed is not None else 5.0, 1.0)
    ttc = d_trig / espd                                           # (S,)
    dash = jnp.clip(side / jnp.maximum(ttc, 0.5), 1.0, 4.0)

    # start pose per walker slot from whichever scenario activates it
    start_pos = jnp.einsum("sw,sc->wc", activate.astype(jnp.float32), roadside)
    start_yaw = jnp.einsum("sw,s->w", activate.astype(jnp.float32), scen.param[:, 1])
    start_speed = jnp.einsum("sw,s->w", activate.astype(jnp.float32), dash)

    new_wlk = WalkerState(
        pos=jnp.where(act_any[:, None], start_pos, walkers.pos),
        yaw=jnp.where(act_any, start_yaw, walkers.yaw),
        speed=jnp.where(
            act_any, start_speed, jnp.where(deact_any, 0.0, walkers.speed)
        ),
        extent=walkers.extent,
        active=(walkers.active | act_any) & ~deact_any,
    )

    # --- lead-vehicle brake override --------------------------------------
    V = traffic.pos.shape[0]
    veh_onehot = jax.nn.one_hot(scen.actor_idx, V, dtype=jnp.float32)  # (S, V)
    # speed_override caps BACKGROUND actors' desired speed; scenario actors
    # are scripted directly below, so no kind needs it anymore (kind 3 used
    # to brake a background actor in its slot, but build_route_scenarios
    # reserves the TOP slots — which background traffic never fills — so
    # that path was a silent no-op in eval; the lead is now spawned)
    speed_override = jnp.full((V,), 1e4)

    # --- adversarial vehicle spawns (junction crossing / oncoming) --------
    # param = [trigger_dist, drive_yaw, _, _]; the actor slot activates at
    # trigger_pos driving straight at a fixed speed for the duration, then
    # deactivates (≡ the py_trees actor-source/sink pattern,
    # atomic_behaviors.py ActorSource/ActorSink)
    is_lead_brake = scen.kind == KIND_LEAD_VEHICLE_BRAKE
    is_vehicle_scen = (
        (scen.kind == KIND_CROSSING_VEHICLE)
        | (scen.kind == KIND_ONCOMING_VEHICLE)
        | (scen.kind == KIND_VEHICLE_TURNING)
        | (scen.kind == KIND_BLOCKED_OVERTAKE)
        | is_lead_brake
    )
    v_activate = (fire & is_vehicle_scen)[:, None] & (veh_onehot > 0.5)  # (S, V)
    v_deactivate = (finish & is_vehicle_scen)[:, None] & (veh_onehot > 0.5)

    heading = jnp.stack(
        [jnp.cos(scen.param[:, 1]), jnp.sin(scen.param[:, 1])], axis=-1
    )                                                             # (S, 2)
    left = jnp.stack(
        [-jnp.sin(scen.param[:, 1]), jnp.cos(scen.param[:, 1])], axis=-1
    )
    # per-kind primary-actor spawn pose and speed
    is_turning = scen.kind == KIND_VEHICLE_TURNING
    is_overtake = scen.kind == KIND_BLOCKED_OVERTAKE
    primary_pos = jnp.where(
        is_turning[:, None],
        # cyclist starts at the roadside of the lane the ego turns into
        scen.trigger_pos - WALKER_SIDE_OFFSET * heading,
        jnp.where(
            (is_overtake | is_lead_brake)[:, None],
            # decelerating lead spawns ahead of the trigger along the route
            scen.trigger_pos + 18.0 * heading,
            scen.trigger_pos,
        ),
    )
    # FollowLeadingVehicle (follow_leading_vehicle.py): the spawned lead
    # cruises ahead of the ego, brakes to a standstill after
    # LEAD_BRAKE_DELAY, holds until the scenario ends (the reference lead
    # then drives off; here the slot deactivates, same effect on the ego)
    lead_speed = jnp.where(new_timer < LEAD_BRAKE_DELAY, LEAD_CRUISE_SPEED, 0.0)
    scen_speed = jnp.where(
        is_turning,
        CYCLIST_SPEED,
        jnp.where(
            is_overtake,
            LEAD_SLOW_SPEED,
            jnp.where(
                is_lead_brake,
                lead_speed,
                jnp.where(
                    scen.kind == KIND_CROSSING_VEHICLE,
                    CROSS_VEHICLE_SPEED,
                    ONCOMING_SPEED,
                ),
            ),
        ),
    )

    # OtherLeadingVehicle's second actor: an adjacent-lane blocker
    # (other_leading_vehicle.py: the overtaking lane is occupied). Slot index
    # rides in param[3]; it spawns one lane to the left of the lead, slightly
    # behind, and holds a speed between the slow lead and traffic flow.
    blk_onehot = jax.nn.one_hot(
        scen.param[:, 3].astype(jnp.int32), V, dtype=jnp.float32
    )
    b_activate = (fire & is_overtake)[:, None] & (blk_onehot > 0.5)
    b_deactivate = (finish & is_overtake)[:, None] & (blk_onehot > 0.5)
    b_running = ((new_state == RUNNING) & is_overtake)[:, None] & (
        blk_onehot > 0.5
    )
    blocker_pos = scen.trigger_pos + 8.0 * heading + 3.5 * left

    act2 = jnp.concatenate([v_activate, b_activate], axis=0)      # (2S, V)
    deact2 = jnp.concatenate([v_deactivate, b_deactivate], axis=0)
    run2 = jnp.concatenate(
        [
            ((new_state == RUNNING) & is_vehicle_scen)[:, None]
            & (veh_onehot > 0.5),
            b_running,
        ],
        axis=0,
    )
    pos2 = jnp.concatenate([primary_pos, blocker_pos], axis=0)    # (2S, 2)
    yaw2 = jnp.concatenate([scen.param[:, 1]] * 2, axis=0)
    spd2 = jnp.concatenate(
        [scen_speed, jnp.full_like(scen_speed, BLOCKER_SPEED)], axis=0
    )

    v_act_any = jnp.any(act2, axis=0)
    v_deact_any = jnp.any(deact2, axis=0)
    v_run_any = jnp.any(run2, axis=0)
    spawn_pos = jnp.einsum("sv,sc->vc", act2.astype(jnp.float32), pos2)
    spawn_yaw = jnp.einsum("sv,s->v", act2.astype(jnp.float32), yaw2)
    run_speed = jnp.einsum("sv,s->v", run2.astype(jnp.float32), spd2)

    # cyclists get bicycle-sized boxes while everyone else keeps car extents
    cyc_slot = jnp.any(
        ((fire | (new_state == RUNNING)) & is_turning)[:, None]
        & (veh_onehot > 0.5),
        axis=0,
    )
    new_extent = jnp.where(
        (v_act_any & cyc_slot)[:, None],
        jnp.asarray(CYCLIST_EXTENT)[None],
        traffic.extent,
    )

    new_traffic = TrafficState(
        pos=jnp.where(v_act_any[:, None], spawn_pos, traffic.pos),
        yaw=jnp.where(v_act_any, spawn_yaw, traffic.yaw),
        speed=jnp.where(
            v_act_any, run_speed, jnp.where(v_deact_any, 0.0, traffic.speed)
        ),
        extent=new_extent,
        wp_idx=traffic.wp_idx,
        active=(traffic.active | v_act_any) & ~v_deact_any,
        stop_s=jnp.where(v_act_any, 0.0, traffic.stop_s),
    )
    # while running, the scenario vehicle holds its heading/speed (the step
    # function routes `scripted_mask` vehicles past the traffic policy)
    scripted_mask = v_run_any
    scripted_speed = run_speed

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
    return (
        new_scen,
        new_wlk,
        new_traffic,
        speed_override,
        steer_noise,
        scripted_mask,
        scripted_speed,
    )


def scenario_tl_override(scen: ScenarioState, tl_pos, tl_yaw, tl_valid):
    """(NL,) int32 forced light states: -1 = no override.

    KIND_TL_MANIPULATOR slots in RUNNING grab every valid light within
    TL_FORCE_RADIUS of their trigger whose heading is within 60° of
    param[1], and pin it to param[3] (TL_GREEN=0 / TL_RED=2) — the srunner
    TrafficLightManipulator's freeze-a-phase primitive
    (atomic_behaviors.py:2100-2270), vectorized over slots x lights.
    step_world applies it to traffic_light_states' output, so NPCs, the
    criteria stop-line geometry and the rendered light fixtures all see
    the manipulated phase consistently."""
    from thinktwice_tpu.geometry import wrap_angle

    running = (scen.state == RUNNING) & (scen.kind == KIND_TL_MANIPULATOR)
    d = jnp.linalg.norm(
        tl_pos[None, :, :] - scen.trigger_pos[:, None, :], axis=-1
    )                                                        # (S, NL)
    align = (
        jnp.abs(wrap_angle(tl_yaw[None, :] - scen.param[:, 1, None]))
        < jnp.pi / 3
    )
    hit = running[:, None] & (d < TL_FORCE_RADIUS) & align & tl_valid[None, :]
    forced = jnp.clip(scen.param[:, 3], 0.0, 2.0).astype(jnp.int32)  # (S,)
    any_hit = jnp.any(hit, axis=0)                           # (NL,)
    slot = jnp.argmax(hit, axis=0)                           # first forcing slot
    return jnp.where(any_hit, forced[slot], -1)
