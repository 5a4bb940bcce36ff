"""Rule-based route-following autopilot for the ego vehicle.

The in-graph analog of the reference's hand-written expert
(leaderboard/team_code/auto_pilot.py — PID route following with hazard and
red-light stops). It has full privileged state, so it doubles as (a) the
harness-validation baseline and (b) a teacher for behavior-cloning the Roach
policy on long multi-junction routes.

Control law:
- lateral: pure pursuit on an arc-length lookahead point (speed-adaptive)
  plus a cross-track correction term, so junction turns track the planned
  lane instead of cutting the chord over the curb;
- longitudinal: v_des = min(cruise, curve slowdown, red-light stop profile,
  stop-sign stop profile, leader gap profile), served by a simple
  throttle/brake law;
- anti-deadlock creep: blocked > 25 s with a clear-ish path ahead -> creep
  forward (transfuser-style creep, thinktwice_agent.py:500-510).
"""

from __future__ import annotations

import jax.numpy as jnp

from thinktwice_tpu.config import Config
from thinktwice_tpu.geometry import segments_intersect, wrap_angle
from thinktwice_tpu.maps.town import TL_RED, TL_YELLOW, TownMap, traffic_light_states
from thinktwice_tpu.sim.state import WorldState
from thinktwice_tpu.sim.traffic import _front_gap

CRUISE = 7.0
COMFORT_DECEL = 3.0      # m/s^2 used for stop-distance speed profiles


def _stop_profile(dist, margin):
    """Speed that comfortably stops `margin` m before a point `dist` m ahead."""
    d = jnp.maximum(dist - margin, 0.0)
    return jnp.sqrt(2.0 * COMFORT_DECEL * d)


def red_sign_caps(cfg: Config, town: TownMap, state: WorldState):
    """(v_red, d_red, v_sign): the red-light / stop-sign speed caps shared by
    the autopilot's longitudinal law and the expert collector's rule brake.

    Red lights: the governing light is the one whose stop line MY ROUTE
    crosses ahead — the same geometry RunningRedLightTest charges (stop-line
    segment crossing). A nearest-aligned-light test keyed on the ego's
    instantaneous heading is brittle while turning: an ego stopped AT its
    line mid-turn-entry drifts past the alignment cone, "loses" the light
    (d_red jumps to 1e4 with the phase still red), and pulls away across the
    red (observed on Town05 Long route 19).

    Stop signs: stop once in the zone (criteria.stop_has_stopped), then
    proceed; distance is LONGITUDINAL — the lane-positioned ego passes the
    sign with 1.5-3 m of lateral offset, so Euclidean distance never reaches
    the 1.5 m stop margin (profile bottomed out at ~1 m/s and the ego
    drifted through RunningStopTest's 4 m zone without a stop)."""
    ego = state.ego
    route = state.route
    cum = state.route_cumlen
    idx = state.criteria.route_idx
    n = route.shape[0]

    tl_states = traffic_light_states(town, state.time_s)
    W_RED = 48
    widx = jnp.clip(idx + jnp.arange(W_RED), 0, n - 1)
    wpts = route[widx, :2]
    seg_yaw = route[widx[:-1], 2]
    crossing = segments_intersect(
        wpts[:-1, None], wpts[1:, None],
        town.tl_stopline[None, :, 0], town.tl_stopline[None, :, 1],
    )                                                        # (W-1, NL)
    hd_ok = jnp.abs(
        wrap_angle(town.tl_yaw[None, :] - seg_yaw[:, None])
    ) < jnp.pi / 3
    stopping = (tl_states == TL_RED) | (tl_states == TL_YELLOW)
    cand = crossing & hd_ok & stopping[None, :] & town.tl_valid[None, :]
    seg_d = cum[widx[:-1]] - cum[idx]
    d_red = jnp.min(jnp.where(jnp.any(cand, axis=1), seg_d, 1e4))
    v_red = jnp.where(d_red < 30.0, _stop_profile(d_red, 3.0), CRUISE)

    d_stop = jnp.linalg.norm(town.stop_pos - ego.pos[None], axis=-1)
    fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])
    ahead = (town.stop_pos - ego.pos[None]) @ fwd
    # lateral bound: a sign governs MY lane only. Without it, an aligned
    # sign of a parallel approach sitting ~4+ m off-axis can enter pending
    # with |ahead| < 1.5 — binding v_sign to 0 — while its criteria zone
    # (Euclidean < 4, criteria.py RunningStopTest) is unreachable from the
    # ego's lane, so stop_has_stopped never latches and the ego parks
    # forever (observed: Longest6 Town03 r15, 200+ s stall at a minor
    # junction). 3.5 keeps the ego's own sign (lane-positioned driving
    # line passes it 1.5-3 m off-axis) and excludes the unreachable one.
    lat = jnp.abs((town.stop_pos - ego.pos[None])
                  @ jnp.stack([-fwd[1], fwd[0]]))
    aligned = jnp.abs(wrap_angle(town.stop_yaw - ego.yaw)) < jnp.pi / 3
    pending = (
        town.stop_valid & aligned & (ahead > -1.0) & (d_stop < 12.0)
        & (lat < 3.5) & ~state.criteria.stop_has_stopped
    )
    d_sign = jnp.min(jnp.where(pending, jnp.maximum(ahead, 0.0), 1e4))
    v_sign = jnp.where(d_sign < 12.0, _stop_profile(d_sign, 1.5), CRUISE)
    return v_red, d_red, v_sign, d_sign


def junction_yield(cfg: Config, town: TownMap, state: WorldState):
    """(v_yield, d_conf): stop BEFORE a crossing stream, not inside it.

    The corridor gap law only paces actors in the ego's own heading band, so
    at unsignalized junctions the ego rolled into the crossing lane, stopped
    there on the hazard brake, and wedged the junction — every arriving
    crosser conflicts on the ego's box (sim/traffic.py lane_conflict),
    freezes, recycles after 20 s, and the next one re-wedges. Measured:
    Longest6 Town03 route 15 pinned at 1.8% completion for 1500 s with the
    wedge partner cycling v40 -> v148 -> v45; the scene dump
    (scripts/diag_wedge_scene.py) shows the opposing left-turn geometry.
    Mirrors the NPCs' crossing-conflict law on the ego's ROUTE: scan the
    next W_YLD route meters; where a MOVING crossing vehicle's ~2.5 s swept
    box covers a route point, brake to stop 3 m short. Stopped crossers are
    excluded (a crosser waiting for US must not produce a mutual yield; the
    corridor gap law still paces them). Used by the autopilot's speed law
    and — flagged in only_ap_brake — the expert collector's rule brake."""
    ego = state.ego
    route = state.route
    cum = state.route_cumlen
    idx = state.criteria.route_idx
    n = route.shape[0]

    W_YLD = 22
    yidx = jnp.clip(idx + jnp.arange(W_YLD), 0, n - 1)
    ypts = route[yidx, :2]                                    # (W, 2)
    ryaws = route[yidx, 2]
    tr = state.traffic
    relp = ypts[:, None, :] - tr.pos[None, :, :]              # (W, V, 2)
    cv, sv = jnp.cos(tr.yaw), jnp.sin(tr.yaw)
    px = relp[..., 0] * cv[None, :] + relp[..., 1] * sv[None, :]
    py = -relp[..., 0] * sv[None, :] + relp[..., 1] * cv[None, :]
    # 4.5 s sweep: the entry decision must cover the ego's whole junction
    # transit (~18 m at commit speed), not just the next 2-3 s — with a
    # 2.5 s sweep the ego entered during a momentary stream gap and a new
    # turner arrived mid-commit, reforming the wedge (t=20->30 formation
    # race in /tmp diag traces, Town03 r15). While the ego waits OUTSIDE
    # the stream the turners flow at full speed, so long waits only happen
    # when the stream is truly saturated.
    sweep = jnp.clip(tr.speed * 4.5, 0.0, 18.0)
    infl = ego.extent[1] + 0.4
    hit = (
        (px > -(tr.extent[:, 0] + infl)[None, :])
        & (px < (tr.extent[:, 0] + infl)[None, :] + sweep[None, :])
        & (jnp.abs(py) < (tr.extent[:, 1] + infl)[None, :])
    )
    crossing_v = jnp.abs(
        wrap_angle(tr.yaw[None, :] - ryaws[:, None])
    ) > jnp.pi / 4
    conflict = (
        hit & crossing_v & tr.active[None, :] & (tr.speed > 0.3)[None, :]
    )
    d_conf = jnp.min(jnp.where(jnp.any(conflict, axis=1),
                               cum[yidx] - cum[idx], 1e4))
    # activation horizon from the window's ACTUAL arc length, not the point
    # count: W_YLD points only span W_YLD-1 meters at dense(spacing=1.0);
    # any other spacing would silently misscale the yield horizon (ADVICE r4)
    w_arc = cum[yidx[-1]] - cum[idx]
    v_yield = jnp.where(
        d_conf < w_arc - 1.0, _stop_profile(d_conf, 3.0), CRUISE
    )
    return v_yield, d_conf, w_arc


def autopilot_control(cfg: Config, town: TownMap, state: WorldState,
                      debug: bool = False):
    """-> (3,) control (steer, throttle, brake).

    With debug=True returns (control, dict of the v_des components) so stall
    telemetry can attribute every stop to gap/red/sign/curve/hazard."""
    ego = state.ego
    route = state.route
    cum = state.route_cumlen
    idx = state.criteria.route_idx
    n = route.shape[0]

    # ---- lateral: arc-length pure pursuit, turn-shrunk lookahead ----------
    # Pure pursuit cuts corners by ~L^2*kappa/2 (0.9 m at L=4 on an 8 m-radius
    # junction turn — measured as repeated inner-curb clips on Town05 Long).
    # Shrinking the lookahead by the upcoming heading change (L - 3*turn8)
    # plus a stronger cross-track term halves the worst tracking error
    # (1.31 m -> 0.59 m over the 10 eval routes, CPU tuning harness) without
    # the turn-entry overshoot a Stanley law showed on the same geometry.
    j8 = jnp.clip(jnp.searchsorted(cum, cum[idx] + 8.0), 0, n - 1)
    turn8 = jnp.abs(wrap_angle(route[j8, 2] - route[idx, 2]))
    L = jnp.maximum(
        jnp.clip(2.5 + 0.7 * ego.speed, 3.0, 8.0) - 3.0 * turn8, 2.0
    )
    tidx = jnp.clip(jnp.searchsorted(cum, cum[idx] + L), 0, n - 1)
    target = route[tidx, :2]
    to_t = target - ego.pos
    bearing = jnp.arctan2(to_t[1], to_t[0])
    err = wrap_angle(bearing - ego.yaw)
    ryaw = route[idx, 2]
    nvec = jnp.stack([-jnp.sin(ryaw), jnp.cos(ryaw)])
    xtrack = jnp.dot(ego.pos - route[idx, :2], nvec)   # +: ego left of route
    steer = jnp.clip(2.5 * err - 0.4 * xtrack, -1.0, 1.0)

    # ---- curvature slowdown ----------------------------------------------
    def turn_ahead(meters):
        j = jnp.clip(jnp.searchsorted(cum, cum[idx] + meters), 0, n - 1)
        return jnp.abs(wrap_angle(route[j, 2] - route[idx, 2]))

    t10, t20 = turn_ahead(10.0), turn_ahead(20.0)
    v_curve = jnp.where(t10 > 0.5, 2.2, jnp.where(t10 > 0.25, 3.5, CRUISE))
    v_curve = jnp.minimum(
        v_curve, jnp.where(t20 > 0.5, 4.0, CRUISE)
    )

    # ---- leader / crossing-actor gap -------------------------------------
    all_pos = jnp.concatenate([state.traffic.pos, state.walkers.pos], axis=0)
    all_yaw = jnp.concatenate([state.traffic.yaw, state.walkers.yaw], axis=0)
    all_ext = jnp.concatenate([state.traffic.extent, state.walkers.extent], axis=0)
    all_act = jnp.concatenate([state.traffic.active, state.walkers.active], axis=0)
    gap = _front_gap(
        ego.pos[None], ego.yaw[None], ego.speed[None],
        all_pos, all_yaw, all_ext, all_act,
        jnp.zeros((1, all_pos.shape[0]), bool),
        self_ext_x=ego.extent[0][None],
    )[0]
    v_gap = jnp.clip((gap - 2.5) / 1.2, 0.0, CRUISE)

    # ---- unsignalized-junction yield (shared helper; see junction_yield) --
    v_yield, d_conf, _ = junction_yield(cfg, town, state)

    # ---- red lights + stop signs (shared with the expert's rule brake) ----
    v_red, d_red, v_sign, _ = red_sign_caps(cfg, town, state)

    v_des = jnp.minimum(
        jnp.minimum(v_curve, v_gap),
        jnp.minimum(jnp.minimum(v_red, v_sign), v_yield),
    )

    # ---- motion-forecast hazard (crossing traffic / walkers) --------------
    # the corridor gap only sees actors already in the lane band; a vehicle
    # crossing the junction enters it too late to brake for. Reuse the
    # expert's ego+actor forecast rule (roach_ap_agent hazard forecast).
    from thinktwice_tpu.agents.expert import hazard_brake

    hazard = hazard_brake(cfg, state)
    v_des = jnp.where(hazard, 0.0, v_des)

    # ---- anti-deadlock creep ---------------------------------------------
    # blocked a long time, nothing physically within 3 m, no red line closer
    # than 6 m: creep forward (the world's recycle rule will clear whatever
    # queue caused it; without creep the ego never re-probes the gap).
    # (d_conf gate: creeping INTO an active crossing stream re-wedges the
    # junction the yield above just kept clear)
    creep = (
        (state.criteria.blocked_s > 15.0) & (gap > 3.0) & (d_red > 6.0)
        & (d_conf > 6.0)
    )
    v_des = jnp.where(creep, jnp.maximum(v_des, 1.5), v_des)

    # ---- throttle / brake -------------------------------------------------
    throttle = jnp.clip(0.9 * (v_des - ego.speed), 0.0, 0.85)
    brake = (ego.speed > v_des + 0.7) | ((v_des < 0.2) & (ego.speed > 0.05))
    brake = brake | (gap < 2.5)
    throttle = jnp.where(brake, 0.0, throttle)
    control = jnp.stack([steer, throttle, brake.astype(jnp.float32)])
    if debug:
        return control, dict(
            v_curve=v_curve, v_gap=v_gap, v_red=v_red, v_sign=v_sign,
            v_yield=v_yield, d_conf=d_conf,
            hazard=hazard, creep=creep, gap=gap, d_red=d_red,
        )
    return control
