"""Regression tests for the traffic-policy rules that fixed the Town05 Long
gridlock/collision modes (round-2 session 3):

- bumper-to-bumper front gap (both extents subtracted),
- oncoming adjacent-lane traffic does NOT trigger the corridor,
- crossing actors register via their projected length,
- junction yield: lower-priority NPC stops for a crossing higher-priority one,
- NPC turn slowdown from upcoming lane heading change,
- deadlock recycle: a wedged NPC respawns after npc_recycle_s,
- curb criterion is sidewalk AND NOT road (junction aprons overlap both).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.sim.traffic import _cross_conflict_yield, _front_gap


def _gap_single(pos, yaw, others, self_ext=2.45):
    """others: list of (pos2, yaw2, ext2)."""
    all_pos = jnp.asarray([o[0] for o in others], jnp.float32)
    all_yaw = jnp.asarray([o[1] for o in others], jnp.float32)
    all_ext = jnp.asarray([o[2] for o in others], jnp.float32)
    return float(
        _front_gap(
            jnp.asarray([pos], jnp.float32),
            jnp.asarray([yaw], jnp.float32),
            jnp.asarray([5.0]),
            all_pos, all_yaw, all_ext,
            jnp.ones(len(others), bool),
            jnp.zeros((1, len(others)), bool),
            self_ext_x=jnp.asarray([self_ext], jnp.float32),
        )[0]
    )


def test_front_gap_is_bumper_to_bumper():
    # leader 20 m ahead, same heading: clearance = 20 - 2.45 - 2.45
    g = _gap_single((0.0, 0.0), 0.0, [((20.0, 0.0), 0.0, (2.45, 1.06))])
    assert abs(g - (20.0 - 2.45 - 2.45)) < 1e-5


def test_oncoming_adjacent_lane_ignored():
    # oncoming car in the adjacent lane (3.2 m lateral, heading pi): free
    g = _gap_single((0.0, 0.0), 0.0, [((20.0, 3.2), np.pi, (2.45, 1.06))])
    assert g > 100.0


def test_oncoming_in_my_lane_detected():
    g = _gap_single((0.0, 0.0), 0.0, [((20.0, 0.5), np.pi, (2.45, 1.06))])
    assert g < 20.0


def test_crossing_actor_projects_length():
    # perpendicular car at lateral 3.0 m: its 2.45 m half-length reaches the
    # path (old width-only band at 1.7+1.06=2.76 missed it)
    g = _gap_single((0.0, 0.0), 0.0, [((15.0, 3.0), np.pi / 2, (2.45, 1.06))])
    assert g < 20.0


def test_junction_yield_priority():
    # two NPCs converging on the origin at right angles; slot 1 must yield to
    # slot 0, slot 0 must not yield to slot 1
    pos = jnp.asarray([[-10.0, 0.0], [0.0, -10.0]], jnp.float32)
    yaw = jnp.asarray([0.0, np.pi / 2], jnp.float32)
    spd = jnp.asarray([5.0, 5.0], jnp.float32)
    self_mask = jnp.eye(2, dtype=bool)
    my_idx = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
    ot_idx = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
    priority = ot_idx < my_idx
    y = _cross_conflict_yield(pos, yaw, spd, pos, yaw, spd,
                              jnp.ones(2, bool), self_mask, priority)
    assert not bool(y[0]) and bool(y[1])


def test_turn_slowdown_and_recycle(small_cfg, town):
    """Integration: NPCs on the grid town obey the turn cap, and a wedged NPC
    recycles to a spawn point after npc_recycle_s."""
    import dataclasses

    from thinktwice_tpu.sim.reset import reset_world
    from thinktwice_tpu.sim.step import step_world

    cfg = small_cfg
    rng = jax.random.key(3)
    route = np.stack(
        [np.linspace(5, 180, 256), np.full(256, 98.25), np.zeros(256)], axis=1
    ).astype(np.float32)
    state = reset_world(cfg, town, jnp.asarray(route), rng, n_vehicles=8)
    # wedge vehicle 0 against vehicle 1 head-on, far from the ego
    tr = state.traffic
    pos = tr.pos.at[0].set(jnp.asarray([150.0, 198.25]))
    pos = pos.at[1].set(jnp.asarray([154.0, 198.25]))
    yaw = tr.yaw.at[0].set(0.0).at[1].set(jnp.pi)
    tr = dataclasses.replace(
        tr, pos=pos, yaw=yaw,
        speed=tr.speed.at[0].set(0.0).at[1].set(0.0),
        active=tr.active.at[0].set(True).at[1].set(True),
    )
    state = dataclasses.replace(state, traffic=tr)

    n_steps = int(cfg.sim.npc_recycle_s / cfg.sim.dt) + 400

    @jax.jit
    def run(state):
        def body(st, _):
            st2, _ = step_world(cfg, town, st, jnp.zeros(3))
            return st2, (st2.traffic.pos[0], st2.traffic.pos[1])
        return jax.lax.scan(body, state, None, length=n_steps)

    final, (p0, p1) = run(state)
    # at least one of the wedged pair moved far away (recycled)
    moved0 = float(jnp.linalg.norm(p0[-1] - jnp.asarray([150.0, 198.25])))
    moved1 = float(jnp.linalg.norm(p1[-1] - jnp.asarray([154.0, 198.25])))
    assert max(moved0, moved1) > 20.0, (moved0, moved1)


def test_curb_requires_sidewalk_and_not_road(small_cfg, town):
    """A corner over a pixel marked both road and sidewalk (junction apron)
    must NOT score a layout collision."""
    import dataclasses

    from thinktwice_tpu.sim.reset import reset_world
    from thinktwice_tpu.sim.step import step_world

    cfg = small_cfg
    route = np.stack(
        [np.linspace(5, 180, 256), np.full(256, 98.25), np.zeros(256)], axis=1
    ).astype(np.float32)
    # overlap a road stretch with sidewalk in the raster
    px = town.world_to_pixel(jnp.asarray([20.0, 98.25]))
    xi, yi = int(px[0]), int(px[1])
    sw = town.sidewalk.at[yi - 12 : yi + 12, xi - 12 : xi + 12].set(1)
    town2 = dataclasses.replace(town, sidewalk=sw)
    state = reset_world(cfg, town2, jnp.asarray(route), jax.random.key(0))

    @jax.jit
    def run(state):
        def body(st, _):
            st2, _ = step_world(cfg, town2, st, jnp.asarray([0.0, 0.6, 0.0]))
            return st2, None
        return jax.lax.scan(body, state, None, length=200)[0]

    final = run(state)
    assert int(final.criteria.n_collision_static) == 0
    # sanity: pure sidewalk (off road) still fires — steer the ego onto the
    # curb band beside the lane
    state2 = reset_world(cfg, town2, jnp.asarray(route), jax.random.key(1))

    @jax.jit
    def run2(state):
        def body(st, _):
            st2, _ = step_world(cfg, town2, st, jnp.asarray([0.9, 0.8, 0.0]))
            return st2, None
        return jax.lax.scan(body, state, None, length=400)[0]

    final2 = run2(state2)
    assert int(final2.criteria.n_collision_static) >= 1


def test_courtesy_yield_holds_short_of_conflict(small_cfg, town):
    """Liveness rule (sim/traffic.py courtesy yield): once the ego has been
    slow > 25 s, an NPC whose lane path crosses the ego's upcoming route
    holds back; below the latch it drives; a vehicle already inside the
    conflict band is exempt (it must clear, not freeze in the corridor)."""
    from thinktwice_tpu.sim.traffic import traffic_policy

    cfg = small_cfg.sim
    lane_pts = np.asarray(town.lane_pts)
    lane_yaw = np.asarray(town.lane_yaw)
    lane_next = np.asarray(town.lane_next)
    lane_valid = np.asarray(town.lane_valid)

    # pick a lane waypoint whose next 8 hops are straight (constant yaw)
    k = None
    for i in range(len(lane_pts)):
        if not lane_valid[i]:
            continue
        hops, j, ok = [], i, True
        for _ in range(8):
            j = int(lane_next[j])
            hops.append(j)
            if abs((lane_yaw[j] - lane_yaw[i] + np.pi) % (2 * np.pi) - np.pi) > 0.05:
                ok = False
                break
        if ok and np.linalg.norm(lane_pts[hops[-1]] - lane_pts[i]) > 12.0:
            k = i
            break
    assert k is not None
    p0 = lane_pts[k]
    h = lane_yaw[k]
    fwd = np.array([np.cos(h), np.sin(h)])
    left = np.array([-fwd[1], fwd[0]])

    # ego route crosses the NPC's path perpendicular, ~11 m ahead of it
    cross = p0 + 11.0 * fwd
    ego_route = jnp.asarray(
        cross[None, :] + np.linspace(-8, 7, 16)[:, None] * left[None, :],
        jnp.float32,
    )
    ego_pos = jnp.asarray(cross - 8.0 * left, jnp.float32)  # waiting nearby

    V = 4
    veh_pos = jnp.tile(jnp.asarray(p0, jnp.float32)[None], (V, 1))
    veh_pos = veh_pos.at[1:].add(1e3)  # park the other slots far away
    veh_yaw = jnp.full((V,), h, jnp.float32)
    veh_speed = jnp.full((V,), 5.0, jnp.float32)
    veh_ext = jnp.tile(jnp.asarray([2.45, 1.06], jnp.float32)[None], (V, 1))
    veh_wp = jnp.full((V,), k, jnp.int32)
    veh_active = jnp.asarray([True, False, False, False])
    no_walkers = jnp.zeros((0, 2), jnp.float32)

    def run(slow_s, npc_pos=None):
        vp = veh_pos if npc_pos is None else veh_pos.at[0].set(npc_pos)
        _, accel, _, _, dbg = traffic_policy(
            cfg, town, jnp.zeros_like(town.tl_valid, jnp.int32),
            vp, veh_yaw, veh_speed, veh_ext, veh_wp, veh_active,
            jnp.asarray(ego_pos), jnp.asarray(h + np.pi / 2, jnp.float32),
            jnp.asarray([2.45, 1.06], jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            no_walkers, jnp.zeros((0, 2), jnp.float32),
            jnp.zeros((0,), bool),
            ego_route=ego_route,
            ego_slow_s=jnp.asarray(slow_s, jnp.float32),
            debug=True,
        )
        return accel, dbg

    accel_held, dbg_held = run(30.0)
    assert bool(dbg_held["courteous"][0])
    assert float(accel_held[0]) < -1.0  # braking for the held conflict

    accel_free, dbg_free = run(10.0)
    assert not bool(dbg_free["courteous"][0])
    assert float(accel_free[0]) > float(accel_held[0])

    # body already inside the band (standing on the ego route): exempt
    _, dbg_in = run(30.0, npc_pos=jnp.asarray(cross, jnp.float32))
    assert not bool(dbg_in["courteous"][0])
