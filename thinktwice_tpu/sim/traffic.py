"""Background-traffic autopilot: a vectorized stand-in for CARLA's
TrafficManager (which the reference drives via `request_new_batch_actors`
with autopilot=True, carla_data_provider.py + route_scenario.py:473-508).

Behavioral contract it reproduces:
- follow the lane network at a cruise speed,
- keep a speed-dependent gap to the leading actor (IDM-style),
- stop at red/yellow lights before the stop line,
- yield to walkers on the road ahead.

All V vehicles update in one fused computation: O(V^2) pairwise gap logic is a
few thousand FLOPs — noise for the VPU — so there is no spatial index, no
sorting, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from thinktwice_tpu.config import SimConfig
from thinktwice_tpu.geometry import segments_intersect, wrap_angle
from thinktwice_tpu.maps.town import TownMap, TL_RED, TL_YELLOW

# bumper gap (m) at which a follower's desired speed reaches 0. Yield /
# conflict clamps must sit BELOW this so a clamped gap commands a hard
# stop, not a creep. (A tighter 1.5/1.3 CARLA-TM-style packing was measured
# on Longest6 Town01 route 1 and did NOT raise route throughput — the
# binding constraint is junction drain rate, not queue length — so the
# original tuned values stand.)
NPC_ZERO_GAP = 2.0
NPC_YIELD_GAP = 1.8


def _lookahead_target(town: TownMap, wp_idx, pos, lookahead_m: float):
    """Chase a point ~lookahead_m ahead along the lane by chaining successor
    pointers. Lane waypoints are ~2 m apart, so ceil(lookahead/2)+1 hops cover
    it; hop count is static → unrolled gathers, XLA-friendly."""
    hops = int(lookahead_m // 2) + 1
    idx = wp_idx
    for _ in range(hops):
        idx = town.lane_next[idx]
    return town.lane_pts[idx]


def _advance_wp(town: TownMap, wp_idx, pos, yaw):
    """Advance the target waypoint pointer.

    Two triggers: proximity (within 2.5 m) OR passed abeam along the lane
    heading. Proximity alone froze the pointer whenever a yield or recycle
    left the vehicle displaced from its chain: pure pursuit then orbited the
    stale fixed lookahead point at minimum turn radius — through anything
    parked there, including a stopped ego (observed Town05 junction collision
    mode: NPC circling at 1-2.5 m/s into the ego's front corner, its wp
    frozen for 5+ s). An orbit-breaker additionally re-locks the pointer onto
    whichever of the next 8 chain hops is closest (1 m hysteresis), so a
    vehicle that drifted past several waypoints mid-yield re-acquires the
    chain instead of circling back for a point it already passed.
    """
    target = town.lane_pts[wp_idx]
    d0 = jnp.linalg.norm(target - pos, axis=-1)
    ly = town.lane_yaw[wp_idx]
    lane_dir = jnp.stack([jnp.cos(ly), jnp.sin(ly)], axis=-1)
    beyond = jnp.einsum("vc,vc->v", pos - target, lane_dir) > 0.0
    wp = jnp.where((d0 < 2.5) | beyond, town.lane_next[wp_idx], wp_idx)
    best = wp
    best_d = jnp.linalg.norm(town.lane_pts[wp] - pos, axis=-1)
    # only re-lock when the chain is NEARBY: a remote target is a route-loop
    # link whose teleport the step handles — walking the probe past it would
    # land the jump several hops beyond the loop point
    near_chain = best_d < 12.0
    cur = wp
    for _ in range(8):
        cur = town.lane_next[cur]
        dd = jnp.linalg.norm(town.lane_pts[cur] - pos, axis=-1)
        better = (dd + 1.0 < best_d) & near_chain
        best = jnp.where(better, cur, best)
        best_d = jnp.where(better, dd, best_d)
    # LOST recovery: a vehicle displaced > 12 m from BOTH its old and new
    # targets has no path back — the orbit-breaker is gated to nearby hops,
    # and pure pursuit toward the stale far point turns it into ghost
    # traffic wandering the map (observed: NPCs circling near the ego with
    # lane targets 100+ m away, 13 minutes after losing their chain).
    # Re-acquire the nearest heading-compatible valid lane point (strided
    # scan: re-lock accuracy of ~4 m is enough — the normal advance and the
    # orbit-breaker refine from there). The old-target distance gate keeps
    # legitimate route-loop links (vehicle still AT the tail it just
    # passed) intact for the step's guarded teleport.
    d_old = jnp.linalg.norm(town.lane_pts[wp_idx] - pos, axis=-1)
    lost = (best_d > 12.0) & (d_old > 12.0)
    stride = 8
    cand_pts = town.lane_pts[::stride]
    cand_yaw = town.lane_yaw[::stride]
    cand_ok = town.lane_valid[::stride]
    dist = jnp.linalg.norm(cand_pts[None, :, :] - pos[:, None, :], axis=-1)
    hd_ok = jnp.abs(wrap_angle(cand_yaw[None, :] - yaw[:, None])) < 1.3
    dist = jnp.where(cand_ok[None, :] & hd_ok, dist, 1e9)
    k = jnp.argmin(dist, axis=-1)
    found = jnp.take_along_axis(dist, k[:, None], axis=-1)[:, 0] < 100.0
    near_idx = (k * stride).astype(best.dtype)
    return jnp.where(lost & found, near_idx, best)


def _front_gap(pos, yaw, speed, all_pos, all_yaw, all_ext, all_active, self_mask,
               self_ext_x=None, return_idx=False):
    """Distance to the nearest actor that actually obstructs the vehicle.

    pos/yaw/speed: (V, ...) of the deciding vehicles; all_*: (A, ...) of every
    collidable actor (traffic + ego + walkers). Returns (V,) gap in meters
    (large when free).

    Two relevance bands, both heading-aware:
    - a tight path band (lateral < 1.7 m + actor half-width): anything
      physically in my lane — crossing traffic, walkers, a head-on car;
    - a wider same-direction band (lateral < 2.2 m + half-width, heading
      within 60°): the leader I am following through a curve.
    Oncoming traffic in the adjacent lane (lateral ~3 m, heading ~180°) falls
    in neither band. Round-1 used one 3.3 m isotropic band, so every two-way
    street made opposing NPCs brake for each other — the whole fleet froze
    within two minutes (town-wide gridlock, 90/120 stopped), which is what
    blocked every Town05 Long route.
    """
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)          # (V, 2)
    right = jnp.stack([-jnp.sin(yaw), jnp.cos(yaw)], axis=-1)
    rel = all_pos[None, :, :] - pos[:, None, :]                      # (V, A, 2)
    along = jnp.einsum("vac,vc->va", rel, fwd)
    lateral = jnp.abs(jnp.einsum("vac,vc->va", rel, right))
    rel_hdg = wrap_angle(all_yaw[None, :] - yaw[:, None])
    same_dir = jnp.abs(rel_hdg) < jnp.pi / 3
    # a crossing actor presents its LENGTH to my path, not its width — use the
    # projected half-extent so a diagonal box's corners still register
    crossing = jnp.abs(jnp.sin(rel_hdg))
    eff_w = (
        all_ext[None, :, 1] * (1.0 - crossing) + all_ext[None, :, 0] * crossing
    )
    in_path = lateral < 1.7 + eff_w
    in_lane = same_dir & (lateral < 2.2 + all_ext[None, :, 1])
    in_corridor = (
        (along > 0.1)
        & (along < 40.0)
        & (in_path | in_lane)
        & all_active[None, :]
        & ~self_mask
    )
    # bumper-to-bumper clearance: subtract the other's rear extent AND my own
    # front extent (without the latter, followers stop with their center 2 m
    # from the leader's rear — 0.45 m inside its box — and creep-collide)
    gap = along - all_ext[None, :, 0]
    if self_ext_x is not None:
        gap = gap - self_ext_x[:, None]
    gap = jnp.where(in_corridor, gap, 1e4)
    if return_idx:
        # index (into the pooled actor axis) of the governing blocker —
        # diagnostics only: lets gridlock traces follow the waiting chain
        # from the ego to its root (scripts/diag_longest6.py)
        return jnp.min(gap, axis=-1), jnp.argmin(gap, axis=-1)
    return jnp.min(gap, axis=-1)


def _cross_conflict_yield(pos, yaw, speed, all_pos, all_yaw, all_speed,
                          all_active, self_mask, priority_over_me,
                          is_static_priority=False):
    """Junction arbitration: True for vehicles that must yield.

    CARLA's TrafficManager negotiates crossing priority inside junctions; the
    lane soup has no junction boxes, so arbitrate by forecast: extrapolate
    every actor along its heading at its current speed; if my forecast comes
    within a safety disc of a higher-priority actor's forecast ahead of me,
    I stop. Priority is strict (ego always wins; between NPCs the lower slot
    index wins) so yield cycles — the deadlock mode of symmetric rules —
    cannot form.
    """
    ts = jnp.asarray([0.6, 1.2, 1.8, 2.4])
    my_fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)        # (V, 2)
    my_v = my_fwd * jnp.maximum(speed, 1.5)[:, None]                 # probe even from stop
    my_t = pos[:, None, :] + ts[None, :, None] * my_v[:, None, :]    # (V, T, 2)
    o_fwd = jnp.stack([jnp.cos(all_yaw), jnp.sin(all_yaw)], axis=-1)
    o_v = o_fwd * all_speed[:, None]
    o_t = all_pos[:, None, :] + ts[None, :, None] * o_v[:, None, :]  # (A, T, 2)
    d = jnp.linalg.norm(my_t[:, None, :, :] - o_t[None, :, :, :], axis=-1)  # (V, A, T)
    # conflict must be ahead-ish of me (not someone crossing behind)
    rel_now = all_pos[None, :, :] - pos[:, None, :]
    ahead = jnp.einsum("vac,vc->va", rel_now, my_fwd) > -2.0
    moving = all_speed > 0.5       # a stopped NPC is a gap problem, not a
                                   # crossing one (gap logic handles it) — but
                                   # a STOPPED EGO nosed into the junction must
                                   # still be yielded to (its forecast is its
                                   # position; crossing NPCs were clipping its
                                   # corners), hence is_static_priority
    # tighter disc for the static-ego case: the box half-diagonal is ~2.7 m,
    # and 3.0 m would also snag NPCs passing in the adjacent lane beside a
    # stopped ego queue
    disc = jnp.where(is_static_priority & ~(all_speed > 0.5), 2.4, 3.0)
    conflict = (
        jnp.any(d < disc[None, :, None], axis=-1)
        & ahead
        & (moving | is_static_priority)[None, :]
        & all_active[None, :]
        & ~self_mask
        & priority_over_me
    )
    return jnp.any(conflict, axis=-1)


def _approach_line_dist(town: TownMap, pos, yaw):
    """(V,) distance to MY approach stop line ahead + its index (any phase).

    Only the NEAREST aligned stop line ahead governs (TrafficLightHandler
    semantics: an agent is bound by its own approach light). Checking "any
    red within range" instead froze whole roads: junction-crossing clusters
    can split into several signal groups, so some line ahead is red at every
    instant and every vehicle waited on a red that was never its own.
    """
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)           # (V, 2)
    rel = town.tl_pos[None, :, :] - pos[:, None, :]                  # (V, NL, 2)
    along = jnp.einsum("vlc,vc->vl", rel, fwd)
    lateral = jnp.abs(
        rel[..., 0] * (-jnp.sin(yaw))[:, None] + rel[..., 1] * jnp.cos(yaw)[:, None]
    )
    # lateral bound covers the stop line's SPAN, not a fixed 3 m from its
    # center: lane-positioned vehicles approach offset from the line center
    # (rightmost lane), and a center-only test let them miss their own light
    # — which RunningRedLightTest (criteria.py, segment crossing within 60°)
    # still charges. Heading cone matches the criterion's pi/3 for the same
    # reason: the agent must be at least as conservative as the scorer.
    half_len = 0.5 * jnp.linalg.norm(
        town.tl_stopline[:, 1] - town.tl_stopline[:, 0], axis=-1
    )
    lat_bound = jnp.maximum(half_len + 1.0, 3.0)
    heading_ok = jnp.abs(wrap_angle(town.tl_yaw[None, :] - yaw[:, None])) < jnp.pi / 3
    cand = (
        (along > -2.0)
        & (lateral < lat_bound[None, :])
        & heading_ok
        & town.tl_valid[None, :]
    )
    along_c = jnp.where(cand, along, 1e4)
    k = jnp.argmin(along_c, axis=-1)                                 # (V,)
    d_near = jnp.min(along_c, axis=-1)
    return d_near, k


def _red_light_dist(town: TownMap, tl_states, pos, yaw):
    """Distance to MY approach stop line if it is red/yellow, else large."""
    d_near, k = _approach_line_dist(town, pos, yaw)
    near_state = tl_states[k]
    stopping = (near_state == TL_RED) | (near_state == TL_YELLOW)
    return jnp.where(stopping & (d_near < 1e3), d_near, 1e4)


def ego_red_ahead(town: TownMap, tl_states, route_win):
    """True when a red/yellow stop line crosses the ego's next ~15 m of
    route (route_win: (W, 3) x/y/yaw window) — the ego is lawfully held, so
    traffic_policy's courtesy yield must stay off (see courteous below).
    Same stop-line-crossing geometry the red-light criterion charges
    (criteria.py RunningRedLightTest) and the autopilot's d_red uses."""
    pts = route_win[:, :2]
    seg_yaw = route_win[:-1, 2]
    crossing = segments_intersect(
        pts[:-1, None], pts[1:, None],
        town.tl_stopline[None, :, 0], town.tl_stopline[None, :, 1],
    )                                                        # (W-1, NL)
    hd_ok = jnp.abs(
        wrap_angle(town.tl_yaw[None, :] - seg_yaw[:, None])
    ) < jnp.pi / 3
    stopping = (tl_states == TL_RED) | (tl_states == TL_YELLOW)
    return jnp.any(crossing & hd_ok & stopping[None, :] & town.tl_valid[None, :])


def traffic_policy(
    cfg: SimConfig,
    town: TownMap,
    tl_states,
    veh_pos,
    veh_yaw,
    veh_speed,
    veh_ext,
    veh_wp,
    veh_active,
    ego_pos,
    ego_yaw,
    ego_ext,
    ego_speed,
    wlk_pos,
    wlk_ext,
    wlk_active,
    ego_route=None,
    ego_slow_s=0.0,
    ego_held_red=False,
    debug: bool = False,
):
    """Compute (yaw_rate, accel, new_wp_idx) for all traffic vehicles.

    With debug=True additionally returns a dict of per-vehicle stop-cause
    masks (red/gap/yield/hold) so fleet-throughput diagnostics can attribute
    congestion (scripts/diag_longest6.py)."""
    V = veh_pos.shape[0]

    # --- steering: pure pursuit on the lane lookahead point ---
    target = _lookahead_target(town, veh_wp, veh_pos, cfg.npc_lookahead)
    to_t = target - veh_pos
    bearing = jnp.arctan2(to_t[..., 1], to_t[..., 0])
    err = wrap_angle(bearing - veh_yaw)
    yaw_rate = jnp.clip(err / 0.5, -cfg.npc_max_yaw_rate, cfg.npc_max_yaw_rate)

    # --- longitudinal: IDM-lite over pooled actors ---
    all_pos = jnp.concatenate([veh_pos, ego_pos[None], wlk_pos], axis=0)
    all_yaw = jnp.concatenate([veh_yaw, ego_yaw[None], jnp.zeros(wlk_pos.shape[0])], axis=0)
    all_ext = jnp.concatenate([veh_ext, ego_ext[None], wlk_ext], axis=0)
    all_active = jnp.concatenate(
        [veh_active, jnp.ones((1,), bool), wlk_active], axis=0
    )
    A = all_pos.shape[0]
    self_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (V, A), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (V, A), 0)
    )
    gap = _front_gap(veh_pos, veh_yaw, veh_speed, all_pos, all_yaw, all_ext,
                     all_active, self_mask, self_ext_x=veh_ext[:, 0])

    d_red = _red_light_dist(town, tl_states, veh_pos, veh_yaw)
    gap_front = gap                                   # pre-red, for debug
    gap = jnp.minimum(gap, jnp.where(d_red < cfg.tl_stop_distance, d_red - 2.0, 1e4))

    # --- junction crossing arbitration ------------------------------------
    # priority: ego (slot V in the pooled arrays) > lower NPC slot index
    all_speed = jnp.concatenate(
        [veh_speed, ego_speed[None], jnp.zeros(wlk_pos.shape[0])], axis=0
    )
    my_idx = jax.lax.broadcasted_iota(jnp.int32, (V, A), 0)
    ot_idx = jax.lax.broadcasted_iota(jnp.int32, (V, A), 1)
    priority = (ot_idx == V) | (ot_idx < my_idx)   # ego slot, or lower slot
    must_yield = _cross_conflict_yield(
        veh_pos, veh_yaw, veh_speed, all_pos, all_yaw, all_speed,
        all_active, self_mask, priority,
        is_static_priority=(ot_idx == V)[0],       # ego column, any row
    )
    # lane-following forecast vs the ego's BOX: a turning NPC's straight-line
    # forecast misses a stopped ego that its lane curls into (observed
    # junction corner-clips at v<3 m/s: dyaw ~120-140°, contact on the ego's
    # front corners). Chase the lane chain ~16 m ahead and test each lane
    # point against three discs along the ego's long axis.
    path_idx = veh_wp
    path_pts, path_yaws = [], []
    for _ in range(8):
        path_idx = town.lane_next[path_idx]
        path_pts.append(town.lane_pts[path_idx])
        path_yaws.append(town.lane_yaw[path_idx])
    path = jnp.stack(path_pts, axis=1)                           # (V, 8, 2)
    path_yaw = jnp.stack(path_yaws, axis=1)                      # (V, 8)
    # lane path points in the EGO frame, tested against the ego box inflated
    # by the NPC's half-width: box-exact side contact (the round-2 3-disc
    # test kept 2.1 m from the ego's axis and still let crossing NPCs clip
    # the front corners — contact happens at center separation ~4-5 m)
    rel_path = path - ego_pos[None, None, :]
    ce, se = jnp.cos(-ego_yaw), jnp.sin(-ego_yaw)
    px = rel_path[..., 0] * ce - rel_path[..., 1] * se           # (V, 8)
    py = rel_path[..., 0] * se + rel_path[..., 1] * ce
    infl_x = ego_ext[0] + veh_ext[:, 1:2] + 0.5                  # (V, 1)
    infl_y = ego_ext[1] + veh_ext[:, 1:2] + 0.5
    in_box = (jnp.abs(px) < infl_x) & (jnp.abs(py) < infl_y)     # (V, 8)
    # horizon limited by ~3 s of travel (2 m per lane hop); always probe the
    # first 2 hops so a stopped-then-resuming NPC does not lurch into contact
    reach_hops = jnp.maximum(veh_speed * 3.0 / 2.0, 2.0)
    hop_i = jnp.arange(1, 9, dtype=jnp.float32)
    within = hop_i[None, :] <= reach_hops[:, None]
    # same-direction lane points are the FOLLOWER case — _front_gap already
    # paces those smoothly; hard-stopping them here would freeze every queue
    # behind the ego. Only cross/oncoming lane geometry counts as a conflict.
    crossing_pt = jnp.abs(wrap_angle(path_yaw - ego_yaw)) > jnp.pi / 4
    lane_conflict = jnp.any(in_box & within & crossing_pt, axis=1)
    # hard stop, not creep: clamping the gap ABOVE the zero point leaves a
    # residual v_des ≈ 0.7 m/s, which walks the NPC 3-4 m into the conflict
    # over a 6 s crossing — the observed slow-speed collision farm.
    # NPC_YIELD_GAP < NPC_ZERO_GAP zeroes v_des outright.
    gap = jnp.where(must_yield | lane_conflict,
                    jnp.minimum(gap, NPC_YIELD_GAP), gap)

    # --- junction-box holdback (TrafficManager "don't block the box") ------
    # Do not cross my stop line while a STOPPED vehicle occupies my lane
    # path beyond the junction: a queue that spills back into the box parks
    # across every other approach (observed: Town05 Long route 18 — the ego
    # walled for 700+ s by a creeping cross-queue stopped inside the
    # junction). Hold 2 m before the line until the exit clears.
    d_line, _ = _approach_line_dist(town, veh_pos, veh_yaw)
    far_path = path[:, 3:, :]                                # hops 4..8
    vdist = jnp.linalg.norm(
        far_path[:, :, None, :] - all_pos[None, None, :, :], axis=-1
    )                                                        # (V, 5, A)
    stopped_there = (
        (vdist < 2.5)
        & (all_speed[None, None, :] < 0.5)
        & all_active[None, None, :]
        & ~self_mask[:, None, :]
    )
    exit_blocked = jnp.any(stopped_there, axis=(1, 2))
    hold = (d_line > 1.0) & (d_line < 10.0) & exit_blocked
    gap = jnp.where(hold, jnp.minimum(gap, d_line - 2.0), gap)

    # --- courtesy yield to a long-blocked ego (liveness) -------------------
    # CARLA's TM never yields to a waiting ego, but CARLA's flow is made of
    # per-vehicle random branch choices — bursty streams with real gaps. Our
    # NPC flow follows fixed bank-route loops, so a junction fed by a loop
    # produces a SATURATED turn stream: the diagnosed Longest6 Town03 r15
    # gridlock had the ego waiting 1500 s at an unsignalized junction while
    # opposing left-turners arrived every 3-5 s, each freezing on the ego's
    # box, recycling after 20 s, and being replaced (scripts/diag_longest6.py
    # --chunk 20 formation trace). Real drivers alternate at unsignalized
    # junctions; this implements that liveness rule: once the ego has been
    # slow (< 2 m/s) for > 25 s (criteria.slow_s — NOT blocked_s: a creeping
    # ego must not release the stream mid-crossing; and longer than one
    # 15 s light slot, so a lawful red-light wait does not freeze the
    # cross traffic), any NPC whose next ~16 m of lane path passes within
    # a combined-half-width band of the ego's next ~16 m of route holds
    # WELL SHORT of the conflict point instead of entering it. Two failed
    # cuts shaped the margins: freezing the NPC wherever it was (gap :=
    # NPC_YIELD_GAP) parked it inside the ego's own corridor, and a 3 m
    # hold-back still blocked the ego at junctions where the opposing turn
    # lane passes within ~1-2 m of the ego's waiting spot (Town03 r15) —
    # so held NPCs stop ~10 m short; only an NPC whose BODY already sits
    # inside the ego-route band (~in_band below) is exempt and drives on to
    # clear. Self-releasing: once the ego passes 2 m/s, slow_s resets and
    # the held stream resumes. While the ego is held by a RED LIGHT the
    # rule is suppressed entirely (ego_held_red): a lawful red wait says
    # nothing about junction saturation, and holding green cross-traffic
    # every light cycle would both deadlock flows and make benchmarks
    # easier than reference conditions (ADVICE r4).
    if ego_route is not None and cfg.courtesy_yield:
        dseg = jnp.linalg.norm(
            path[:, :, None, :] - ego_route[None, None, :, :], axis=-1
        )                                                    # (V, 8, K)
        # band = combined half-widths + 3.0: the nominal lane path and the
        # ego route can sit ~3.6 m apart while the BODIES still wedge
        # (edge-marching lane positioning offsets the driving line from
        # lane_pts, and both corridor gap laws are wider than the body
        # band — measured on the Town03 r15 wedge partner: path-to-route
        # min 3.6 m, yet mutual standoff at 5.4 m center distance)
        conf_hop = jnp.any(
            dseg < (veh_ext[:, 1:2, None] + ego_ext[1] + 3.0), axis=2
        )                                                    # (V, 8)
        has_conf = jnp.any(conf_hop, axis=1)
        # lane hops are ~2 m apart; argmax finds the first conflicting hop
        d_conf = (jnp.argmax(conf_hop, axis=1).astype(jnp.float32) + 1.0) * 2.0
        near_ego = jnp.linalg.norm(veh_pos - ego_pos[None], axis=-1) < 40.0
        # exempt vehicles whose BODY is already inside the band — they must
        # drive on and clear, not freeze in the ego's corridor. A d_conf
        # floor cannot express this (path hops start 2 m ahead, so d_conf
        # >= 2 even for a vehicle standing mid-band), and exempting small
        # d_conf instead let late-registering arrivals sail in and wedge.
        d_self = jnp.min(
            jnp.linalg.norm(
                veh_pos[:, None, :] - ego_route[None, :, :], axis=-1
            ), axis=1)
        in_band = d_self < (veh_ext[:, 1] + ego_ext[1] + 3.0)
        courteous = (
            (ego_slow_s > 25.0) & has_conf & near_ego & ~in_band
            & jnp.logical_not(ego_held_red)
        )
        gap = jnp.where(courteous, jnp.minimum(gap, d_conf - 8.0), gap)

    # per-vehicle cruise diversity ≈ TrafficManager's per-vehicle speed
    # percentage differences (behavior profiles): deterministic golden-ratio
    # spread of 0.8x..1.2x over the slots
    slot = jax.lax.broadcasted_iota(jnp.float32, (V, 1), 0)[:, 0]
    cruise = cfg.npc_cruise_speed * (0.8 + 0.4 * jnp.mod(slot * 0.618034, 1.0))

    desired_gap = cfg.npc_gap + veh_speed * cfg.npc_time_headway
    v_des = jnp.where(
        gap < desired_gap,
        cruise * jnp.clip((gap - NPC_ZERO_GAP)
                          / jnp.maximum(desired_gap, 1e-3), 0.0, 1.0),
        cruise,
    )
    # slow through turns: the straight-line corridor cannot see a conflict
    # that the lane curls into until the turn is nearly done, so cap speed by
    # the upcoming lane heading change (~8 m ahead) — CARLA TM vehicles slow
    # in junctions the same way. Without this, NPCs exited corners at 7 m/s
    # into a stopped ego 5 m away (observed collision mode).
    wp_ahead = veh_wp
    for _ in range(4):
        wp_ahead = town.lane_next[wp_ahead]
    turn = jnp.abs(wrap_angle(town.lane_yaw[wp_ahead] - veh_yaw))
    v_turn = jnp.where(turn > 0.6, 2.5, jnp.where(turn > 0.3, 4.0, 1e4))
    v_des = jnp.minimum(v_des, v_turn)
    accel = jnp.clip((v_des - veh_speed) / 0.5, -cfg.npc_decel, cfg.npc_accel)

    new_wp = _advance_wp(town, veh_wp, veh_pos, veh_yaw)
    # route-bank loop links: the lane network chains each route back to its
    # start, so a successor far from the vehicle is a loop jump, not lane
    # continuity — chasing it would drive the NPC cross-country through
    # buildings (ghost traffic). The step teleports these instead.
    loop_jump = (new_wp != veh_wp) & (
        jnp.linalg.norm(town.lane_pts[new_wp] - veh_pos, axis=-1) > 6.0
    )
    if debug:
        return yaw_rate, accel, new_wp, loop_jump, dict(
            gap_front=gap_front, d_red=d_red,
            yielding=must_yield | lane_conflict, hold=hold,
            v_turn=v_turn, v_des=v_des,
            courteous=(courteous
                       if ego_route is not None and cfg.courtesy_yield
                       else jnp.zeros((V,), bool)),
            court_d_conf=(jnp.where(has_conf, d_conf, 1e4)
                          if ego_route is not None and cfg.courtesy_yield
                          else jnp.full((V,), 1e4)),
        )
    return yaw_rate, accel, new_wp, loop_jump
