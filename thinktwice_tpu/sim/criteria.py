"""Per-step infraction detectors: the leaderboard criteria as pure functions.

Replaces the py_trees criteria nodes in
scenario_runner/srunner/scenariomanager/scenarioatomics/atomic_criteria.py:
- CollisionTest (:285-438)            -> analytic OBB tests + raster curb test
- RouteCompletionTest (:1593-1694)    -> windowed polyline projection
- InRouteTest (:1461)                 -> distance-to-route deviation cap
- OutsideRouteLanesTest (:1042-1236)  -> off-road meters accumulation
- RunningRedLightTest (:1696-1882)    -> stop-line segment crossing while red
- RunningStopTest (:1884-2056)        -> stop-zone state machine
- ActorSpeedAboveThresholdTest (:440-513) -> blocked timer
plus the route timeout node (route_scenario.py:52-54,263-275).

All detectors update a `CriteriaState` accumulator and emit boolean event
pulses; the statistics layer (harness.statistics) turns accumulated counts
into the Driving Score exactly as statistics_manager.py does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.geometry import (
    box_corners,
    obb_overlap,
    segments_intersect,
    wrap_angle,
)
from thinktwice_tpu.maps.town import TownMap, TL_RED
from thinktwice_tpu.sim.state import CriteriaState, Events

ROUTE_WINDOW = 64  # waypoints scanned ahead of the current match (~64 m)


def _sample_raster(raster, town: TownMap, xy):
    """Nearest-neighbor sample of a (H, W) raster at world points (..., 2)."""
    px = town.world_to_pixel(xy)
    xi = jnp.clip(px[..., 0].astype(jnp.int32), 0, raster.shape[1] - 1)
    yi = jnp.clip(px[..., 1].astype(jnp.int32), 0, raster.shape[0] - 1)
    return raster[yi, xi]


def update_criteria(
    cfg: Config,
    town: TownMap,
    crit: CriteriaState,
    prev_pos,
    ego_pos,
    ego_yaw,
    ego_speed,
    ego_ext,
    veh_pos,
    veh_yaw,
    veh_ext,
    veh_active,
    wlk_pos,
    wlk_yaw,
    wlk_ext,
    wlk_active,
    tl_states,
    route,
    route_cumlen,
    route_len_m,
    time_s,
):
    sim = cfg.sim

    # ---- collisions -------------------------------------------------------
    hit_veh_each = obb_overlap(
        ego_pos[None], ego_yaw[None], ego_ext[None], veh_pos, veh_yaw, veh_ext
    ) & veh_active
    hit_wlk_each = obb_overlap(
        ego_pos[None], ego_yaw[None], ego_ext[None], wlk_pos, wlk_yaw, wlk_ext
    ) & wlk_active
    hit_veh = jnp.any(hit_veh_each)
    hit_wlk = jnp.any(hit_wlk_each)
    # static layout collision: substantial box intrusion over the curb. The H5
    # rasters overlap at junction aprons/crosswalks (~1.2% of Town05's road
    # pixels are also marked sidewalk), so the curb is sidewalk AND NOT road —
    # bare sidewalk sampling false-fired on legitimate on-road driving there.
    # CARLA's CollisionTest (atomic_criteria.py:285-438) fires on physics
    # collision EVENTS with static actors (poles, fences, walls); curbs are
    # drivable 10 cm ramps that emit none — a corner grazing the curb line is
    # charged as off-road percentage (OutsideRouteLanesTest), not a collision.
    # Model that with a penetration threshold: test a box shrunk by CURB_PEN
    # (corners + long-edge midpoints), so only a wheel's-width intrusion
    # counts. Measured on Town05 Long: 5/6 of the old per-corner-pixel hits
    # had <= 0.10 m penetration; real curb mounting was 0.73 m.
    CURB_PEN = 0.3
    inner_ext = jnp.maximum(ego_ext[:2] - CURB_PEN, 0.1)
    corners = box_corners(ego_pos, ego_yaw, inner_ext)        # (4, 2)
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    right = jnp.stack([-fwd[1], fwd[0]])
    mids = ego_pos[None] + jnp.stack([
        right * inner_ext[1], -right * inner_ext[1],
        fwd * inner_ext[0], -fwd * inner_ext[0],
    ])                                                        # (4, 2)
    probes = jnp.concatenate([corners, mids], axis=0)         # (8, 2)
    on_sw = _sample_raster(town.sidewalk, town, probes) > 0
    on_rd = _sample_raster(town.road, town, probes) > 0
    hit_static = jnp.any(on_sw & ~on_rd)

    overlapping = jnp.stack([hit_veh, hit_wlk, hit_static])
    rising = overlapping & ~crit.collision_latch              # rising edge
    # refractory: CollisionTest ignores a repeat with the same actor id until
    # MAX_ID_TIME (5 s) passes since the counted event (atomic_criteria.py:
    # 301,347-348,375-376); approximated per category.
    candidate = rising & (crit.collision_cd <= 0.0)
    # location gate: a new hit within MIN_AREA_OF_COLLISION (3 m) of the last
    # registered collision location is ignored; the location is forgotten
    # once the ego moves MAX_AREA_OF_COLLISION (5 m) away (:299-300,332-345,
    # 394-399). An NPC grinding across a stationary ego is ONE event.
    d_last = jnp.linalg.norm(ego_pos - crit.coll_pos)
    loc_valid = crit.coll_pos_valid & (d_last <= 5.0)
    loc_blocked = loc_valid & (d_last <= 3.0)
    new_event = candidate & ~loc_blocked
    counted = jnp.any(new_event)
    new_coll_pos = jnp.where(counted, ego_pos, crit.coll_pos)
    new_coll_valid = counted | loc_valid
    new_cd = jnp.where(
        new_event, 5.0, jnp.maximum(crit.collision_cd - sim.dt, 0.0)
    )
    ev_veh, ev_wlk, ev_static = new_event[0], new_event[1], new_event[2]

    # ---- red light: crossed a red stop line this step ---------------------
    crossed = segments_intersect(
        prev_pos[None],
        ego_pos[None],
        town.tl_stopline[:, 0],
        town.tl_stopline[:, 1],
    )
    heading_ok = jnp.abs(wrap_angle(town.tl_yaw - ego_yaw)) < jnp.pi / 3
    ran_red_each = (
        crossed & (tl_states == TL_RED) & heading_ok & town.tl_valid & ~crit.tl_latch
    )
    ev_red = jnp.any(ran_red_each)
    new_tl_latch = crit.tl_latch | ran_red_each

    # ---- stop signs -------------------------------------------------------
    d_stop = jnp.linalg.norm(town.stop_pos - ego_pos[None], axis=-1)
    aligned = jnp.abs(wrap_angle(town.stop_yaw - ego_yaw)) < jnp.pi / 3
    in_zone = (d_stop < 4.0) & aligned & town.stop_valid
    stopped_now = ego_speed < sim.blocked_speed
    new_has_stopped = crit.stop_has_stopped | (crit.stop_in_zone & stopped_now)
    exited = crit.stop_in_zone & ~in_zone
    ran_stop_each = exited & ~new_has_stopped
    ev_stop = jnp.any(ran_stop_each)
    new_in_zone = in_zone
    new_has_stopped = jnp.where(exited, False, new_has_stopped)

    # ---- route progress (RouteCompletionTest's windowed projection) -------
    idx0 = crit.route_idx
    offs = jnp.arange(ROUTE_WINDOW)
    win_idx = jnp.clip(idx0 + offs, 0, route.shape[0] - 1)
    win_pts = route[win_idx, :2]
    d = jnp.linalg.norm(win_pts - ego_pos[None], axis=-1)
    best = jnp.argmin(d)
    new_route_idx = jnp.maximum(idx0, win_idx[best]).astype(jnp.int32)
    min_route_dist = d[best]
    completion = route_cumlen[new_route_idx] / jnp.maximum(route_len_m, 1e-3)

    finished = (completion > 0.99) & (
        jnp.linalg.norm(route[-1, :2] - ego_pos) < 10.0
    )
    ev_complete = finished & ~crit.finished

    deviation = min_route_dist > sim.offroute_allowance

    # ---- outside route lanes ---------------------------------------------
    # OutsideRouteLanesTest counts both off-road driving and wrong-direction
    # lane driving (atomic_criteria.py:1042-1236: sidewalk OR opposite lane).
    step_dist = jnp.linalg.norm(ego_pos - prev_pos)
    on_road = _sample_raster(town.road, town, ego_pos[None])[0] > 0
    d_lane = jnp.linalg.norm(town.lane_pts - ego_pos[None], axis=-1)
    d_lane = jnp.where(town.lane_valid, d_lane, 1e9)
    # Opposing-direction lane points interleave with same-direction ones at
    # sub-meter distance (shared-road chains), so the *nearest* point's yaw
    # flags ~30% of perfect route tracking as wrong-way. The reference's
    # OutsideRouteLanesTest asks "is there a lane here I could legally be
    # driving?" (get_waypoint returns the containing lane) — equivalent here:
    # best-aligned lane point within the lane-width radius; nearest as
    # fallback when nothing is within radius.
    ang_lane = jnp.abs(wrap_angle(town.lane_yaw - ego_yaw))
    near = d_lane < 3.0
    best_near_ang = jnp.min(jnp.where(near, ang_lane, jnp.inf))
    eff_ang = jnp.where(
        jnp.any(near), best_near_ang, ang_lane[jnp.argmin(d_lane)]
    )
    wrong_way = (eff_ang > 2.0 * jnp.pi / 3.0) & (ego_speed > 0.5)
    new_dist_driven = crit.dist_driven + step_dist
    new_dist_offlane = crit.dist_offlane + jnp.where(
        ~on_road | wrong_way, step_dist, 0.0
    )

    # ---- blocked / timeout ------------------------------------------------
    new_blocked_s = jnp.where(
        ego_speed < sim.blocked_speed, crit.blocked_s + sim.dt, 0.0
    )
    blocked = new_blocked_s > sim.blocked_time
    # courtesy-yield latch (see CriteriaState.slow_s): creeping must not
    # release the yielded stream, so the reset threshold is 2 m/s, not 0.1
    new_slow_s = jnp.where(ego_speed < 2.0, crit.slow_s + sim.dt, 0.0)
    timeout = time_s > (sim.timeout_per_meter * route_len_m + sim.timeout_base)

    new_finished = crit.finished | finished
    done = crit.done | blocked | timeout | deviation | new_finished

    new_crit = CriteriaState(
        n_collision_vehicle=crit.n_collision_vehicle + ev_veh.astype(jnp.int32),
        n_collision_walker=crit.n_collision_walker + ev_wlk.astype(jnp.int32),
        n_collision_static=crit.n_collision_static + ev_static.astype(jnp.int32),
        n_red_light=crit.n_red_light + ev_red.astype(jnp.int32),
        n_stop_sign=crit.n_stop_sign + ev_stop.astype(jnp.int32),
        collision_latch=overlapping,
        collision_cd=new_cd,
        coll_pos=new_coll_pos,
        coll_pos_valid=new_coll_valid,
        tl_latch=new_tl_latch,
        stop_in_zone=new_in_zone,
        stop_has_stopped=new_has_stopped,
        route_idx=new_route_idx,
        route_completion=jnp.maximum(crit.route_completion, completion),
        route_deviation=crit.route_deviation | deviation,
        dist_driven=new_dist_driven,
        dist_offlane=new_dist_offlane,
        blocked_s=new_blocked_s,
        blocked=crit.blocked | blocked,
        slow_s=new_slow_s,
        timeout=crit.timeout | timeout,
        finished=new_finished,
        done=done,
        ticks=crit.ticks + 1,
    )
    events = Events(
        collision_vehicle=ev_veh,
        collision_walker=ev_wlk,
        collision_static=ev_static,
        red_light=ev_red,
        stop_sign=ev_stop,
        route_complete=ev_complete,
    )
    return new_crit, events
