"""The world step: one 20 Hz tick as a pure function, and scan-based rollouts.

Mirrors ScenarioManager._tick_scenario
(leaderboard/leaderboard/scenarios/scenario_manager.py:141-187), whose order
is: timestamps update -> agent acts -> apply_control -> behavior tree tick ->
criteria -> world.tick. Here the agent acts *outside* (the caller passes the
control), and everything else fuses into one jit region:

    apply ego control -> traffic policy -> integrate all actors ->
    scenario state machines -> light phases -> criteria -> history ring.

`rollout` wraps it in `lax.scan` with a policy callback so sense->plan->act->
step never leaves the device; `jax.vmap(step_world, ...)` batches worlds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.maps.town import TownMap, traffic_light_states
from thinktwice_tpu.sim import scenarios as scen_lib
from thinktwice_tpu.sim.criteria import update_criteria
from thinktwice_tpu.sim.dynamics import bicycle_step, point_mass_step
from thinktwice_tpu.sim.state import (
    EgoState,
    Events,
    HistoryState,
    TrafficState,
    WalkerState,
    WorldState,
)
from thinktwice_tpu.sim import traffic as traffic_mod
from thinktwice_tpu.sim.traffic import traffic_policy


def _push_history(hist: HistoryState, traffic, walkers, tl_states) -> HistoryState:
    ptr = hist.ptr
    veh_pose = jnp.concatenate(
        [traffic.pos, traffic.yaw[:, None], traffic.extent], axis=-1
    )
    wlk_pose = jnp.concatenate(
        [walkers.pos, walkers.yaw[:, None], walkers.extent], axis=-1
    )
    return HistoryState(
        veh_pose=hist.veh_pose.at[ptr].set(veh_pose),
        veh_active=hist.veh_active.at[ptr].set(traffic.active),
        wlk_pose=hist.wlk_pose.at[ptr].set(wlk_pose),
        wlk_active=hist.wlk_active.at[ptr].set(walkers.active),
        tl_state=hist.tl_state.at[ptr].set(tl_states.astype(jnp.int8)),
        ptr=(ptr + 1) % hist.veh_pose.shape[0],
        count=jnp.minimum(hist.count + 1, hist.veh_pose.shape[0]),
    )


def step_world(
    cfg: Config, town: TownMap, state: WorldState, control
) -> tuple[WorldState, Events]:
    """Advance one tick. `control` = (3,) f32 (steer, throttle, brake).

    When the route is done (`criteria.done`), the world freezes (identity
    update) so vmapped batches can run to a fixed horizon; per-world masking
    replaces the reference's per-route process teardown.
    """
    sim = cfg.sim
    rng, rng_scen, rng_recycle = jax.random.split(state.rng, 3)

    t = state.time_s
    tl_states = traffic_light_states(town, t)

    # --- scenarios (inject walkers/vehicles, overrides, ego steer noise) --
    (
        scen,
        walkers,
        scen_traffic,
        npc_speed_cap,
        steer_noise,
        scripted_mask,
        scripted_speed,
    ) = scen_lib.step_scenarios(
        cfg, state.scenario, state.ego.pos, state.walkers, state.traffic,
        rng_scen, sim.dt, ego_speed=state.ego.speed,
    )
    # TrafficLightManipulator slots pin nearby aligned lights to a forced
    # phase. Consumers of THIS tick's tl_states all see the override: NPC
    # policy, the red-light criterion, ego_red_ahead, and the history ring
    # the birdview renders from. Privileged agents that recompute phases
    # from the clock (autopilot red_sign_caps) and the camera fixtures do
    # NOT — a documented limitation of the staging primitive
    tl_over = scen_lib.scenario_tl_override(
        scen, town.tl_pos, town.tl_yaw, town.tl_valid
    )
    tl_states = jnp.where(tl_over >= 0, tl_over, tl_states)

    # --- ego integration ---------------------------------------------------
    steer = jnp.clip(control[0] + steer_noise, -1.0, 1.0)
    throttle = jnp.clip(control[1], 0.0, 1.0)
    brake = control[2]
    prev_pos = state.ego.pos
    e_pos, e_yaw, e_speed = bicycle_step(
        sim,
        state.ego.pos,
        state.ego.yaw,
        state.ego.speed,
        steer,
        throttle,
        brake,
        drag=sim.drag,
    )
    ego = EgoState(
        pos=e_pos,
        yaw=e_yaw,
        speed=e_speed,
        extent=state.ego.extent,
        control=jnp.stack([steer, throttle, brake]),
    )

    # --- traffic -----------------------------------------------------------
    tr = scen_traffic
    route_win = jax.lax.dynamic_slice_in_dim(
        state.route, state.criteria.route_idx, 16
    )
    yaw_rate, accel, new_wp, loop_jump = traffic_policy(
        sim,
        town,
        tl_states,
        tr.pos,
        tr.yaw,
        tr.speed,
        tr.extent,
        tr.wp_idx,
        tr.active,
        state.ego.pos,
        state.ego.yaw,
        state.ego.extent,
        state.ego.speed,
        walkers.pos,
        walkers.extent,
        walkers.active,
        ego_route=route_win[:, :2],
        ego_slow_s=state.criteria.slow_s,
        # a lawful red-light wait must not trigger the courtesy yield:
        # cross traffic with the green keeps flowing (ADVICE r4)
        ego_held_red=traffic_mod.ego_red_ahead(town, tl_states, route_win),
    )
    # scenario speed caps (lead-vehicle brake): clamp desired accel so speed
    # decays toward the cap
    over_cap = tr.speed > npc_speed_cap
    accel = jnp.where(over_cap, -sim.npc_decel, accel)
    # scripted scenario vehicles hold heading and speed (junction crossing /
    # oncoming adversaries ignore lanes while running)
    yaw_rate = jnp.where(scripted_mask, 0.0, yaw_rate)
    accel = jnp.where(
        scripted_mask, (scripted_speed - tr.speed) / sim.dt * 0.5, accel
    )

    t_pos, t_yaw, t_speed = point_mass_step(
        tr.pos, tr.yaw, tr.speed, yaw_rate, accel, sim.dt
    )
    # loop-jump teleport (≡ CARLA TrafficManager respawn at lane ends): move
    # the NPC to its successor waypoint when that is a route-loop link — but
    # only if the landing spot is clear of the ego and other vehicles; until
    # then the NPC holds at the route end and retries
    jump_to = town.lane_pts[new_wp]
    clear_ego = jnp.linalg.norm(jump_to - state.ego.pos[None], axis=-1) > 25.0
    d_pairs = jnp.linalg.norm(jump_to[:, None] - t_pos[None, :], axis=-1)
    not_self = ~jnp.eye(d_pairs.shape[0], dtype=bool)
    clear_veh = jnp.all(
        (d_pairs > 8.0) | ~tr.active[None, :] | ~not_self, axis=1
    )
    do_jump = loop_jump & ~scripted_mask & tr.active
    teleport = do_jump & clear_ego & clear_veh
    hold = do_jump & ~teleport
    t_pos = jnp.where(teleport[:, None], jump_to, t_pos)
    t_pos = jnp.where(hold[:, None], tr.pos, t_pos)
    t_yaw = jnp.where(teleport, town.lane_yaw[new_wp], t_yaw)
    t_speed = jnp.where(teleport | hold, 0.0, t_speed)
    # a held jump must also keep the OLD waypoint: storing the far link made
    # loop_jump false on every later tick (new_wp == wp), so the NPC was
    # stranded mid-road chasing a cross-country target — ghost traffic that
    # wandered into the ego (route-19 collision: an NPC creeping at the ego
    # with its lane target 400 m away). With the near pointer kept, the
    # advance->loop_jump->teleport retry fires each tick until a landing is
    # clear.
    new_wp = jnp.where(hold, tr.wp_idx, new_wp)

    # --- deadlock recycle (TrafficManager global-flow stand-in) ------------
    # An NPC stationary longer than any red phase is wedged (two crossing
    # queues, or a queue whose head collided); CARLA's TM never leaves cars
    # like that forever. Respawn it on a random spawn point that is clear of
    # the ego and other vehicles. Scenario-controlled actors are exempt:
    # their stop is the scenario.
    V = tr.pos.shape[0]
    running = scen.state == 1
    prot = jnp.any(
        running[:, None] & (jax.nn.one_hot(scen.actor_idx, V) > 0.5), axis=0
    )
    prot = prot | jnp.any(
        (running & (scen.kind == 7))[:, None]
        & (jax.nn.one_hot(scen.param[:, 3].astype(jnp.int32), V) > 0.5),
        axis=0,
    ) | scripted_mask
    # decaying timer, not a hard reset: a wedged queue that inches forward a
    # few cm every few seconds must still recycle, while genuinely flowing
    # traffic (red phase then green) clears its timer within seconds
    stationary = tr.active & (t_speed < 0.5) & ~prot
    # decay only at real flow speed (> 1.5 m/s): a wedged queue creeping in
    # stop-and-go bursts at < 1.5 m/s used to clear its timer every burst
    # and never recycle (route-18 junction spillback sat for 700+ s)
    flowing = t_speed > 1.5
    stop_s = jnp.where(
        stationary,
        tr.stop_s + sim.dt,
        jnp.where(flowing, jnp.maximum(tr.stop_s - 5.0 * sim.dt, 0.0),
                  tr.stop_s),
    )
    SP = town.spawn.shape[0]
    cand = jax.random.randint(rng_recycle, (V,), 0, SP)
    cand_pos = town.spawn[cand, :2]
    ok_valid = town.spawn_valid[cand]
    ok_ego = jnp.linalg.norm(cand_pos - state.ego.pos[None], axis=-1) > 30.0
    d_cv = jnp.linalg.norm(cand_pos[:, None] - t_pos[None, :], axis=-1)
    not_self2 = ~jnp.eye(V, dtype=bool)
    ok_veh = jnp.all((d_cv > 10.0) | ~tr.active[None, :] | ~not_self2, axis=1)
    recycle = (stop_s > sim.npc_recycle_s) & ok_valid & ok_ego & ok_veh
    t_pos = jnp.where(recycle[:, None], cand_pos, t_pos)
    t_yaw = jnp.where(recycle, town.spawn[cand, 2], t_yaw)
    t_speed = jnp.where(recycle, 0.0, t_speed)
    new_wp = jnp.where(recycle, town.spawn_wp[cand], new_wp)
    stop_s = jnp.where(recycle, 0.0, stop_s)

    active_f = tr.active
    traffic = TrafficState(
        pos=jnp.where(active_f[:, None], t_pos, tr.pos),
        yaw=jnp.where(active_f, t_yaw, tr.yaw),
        speed=jnp.where(active_f, t_speed, tr.speed),
        extent=tr.extent,
        wp_idx=jnp.where(active_f, new_wp, tr.wp_idx),
        active=tr.active,
        stop_s=jnp.where(active_f, stop_s, tr.stop_s),
    )

    # --- walkers ------------------------------------------------------------
    w_pos, w_yaw, w_speed = point_mass_step(
        walkers.pos, walkers.yaw, walkers.speed, jnp.zeros_like(walkers.yaw),
        jnp.zeros_like(walkers.speed), sim.dt
    )
    wact = walkers.active
    walkers = WalkerState(
        pos=jnp.where(wact[:, None], w_pos, walkers.pos),
        yaw=walkers.yaw,
        speed=walkers.speed,
        extent=walkers.extent,
        active=walkers.active,
    )

    # --- criteria -----------------------------------------------------------
    crit, events = update_criteria(
        cfg,
        town,
        state.criteria,
        prev_pos,
        ego.pos,
        ego.yaw,
        ego.speed,
        ego.extent,
        traffic.pos,
        traffic.yaw,
        traffic.extent,
        traffic.active,
        walkers.pos,
        walkers.yaw,
        walkers.extent,
        walkers.active,
        tl_states,
        state.route,
        state.route_cumlen,
        state.route_len_m,
        t + sim.dt,
    )

    history = _push_history(state.history, traffic, walkers, tl_states)

    new_state = WorldState(
        tick=state.tick + 1,
        ego=ego,
        traffic=traffic,
        walkers=walkers,
        route=state.route,
        route_cumlen=state.route_cumlen,
        route_len_m=state.route_len_m,
        criteria=crit,
        history=history,
        scenario=scen,
        rng=rng,
        weather=state.weather,
    )

    # freeze when done (per-world termination mask)
    frozen = jax.tree.map(
        lambda new, old: jnp.where(state.criteria.done, old, new), new_state, state
    )
    # but keep `done`/tick updated so downstream logic sees terminal status
    frozen = dataclasses_replace_tick(frozen, new_state)
    no_events = jax.tree.map(lambda e: jnp.zeros_like(e), events)
    events = jax.tree.map(
        lambda e, z: jnp.where(state.criteria.done, z, e), events, no_events
    )
    return frozen, events


def dataclasses_replace_tick(frozen: WorldState, new: WorldState) -> WorldState:
    import dataclasses

    return dataclasses.replace(frozen, tick=new.tick)


def rollout(cfg: Config, town: TownMap, state: WorldState, policy_fn, n_steps: int):
    """Scan a closed-loop rollout: policy_fn(cfg, town, state) -> (3,) control.

    Returns (final_state, stacked Events). The policy runs in-graph — this is
    the "sense->plan->act->step never leaves TPU" loop from BASELINE.json.
    """

    def body(carry, _):
        st = carry
        ctrl = policy_fn(cfg, town, st)
        st2, ev = step_world(cfg, town, st, ctrl)
        return st2, ev

    final, events = jax.lax.scan(body, state, None, length=n_steps)
    return final, events
