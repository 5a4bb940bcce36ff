"""Vehicle-based adversarial scenario tests (crossing / oncoming)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinktwice_tpu.sim import scenarios as scen_lib
from thinktwice_tpu.sim.reset import make_scenarios, reset_world
from thinktwice_tpu.sim.step import step_world


JIT_STEP = jax.jit(step_world, static_argnums=0)


def straight_route(x0=10.0, y=-1.75, length=150.0, n=256):
    xs = np.linspace(x0, x0 + length, n)
    return jnp.asarray(
        np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], 1), jnp.float32
    )


def run_with_scenario(small_cfg, town, kind, trigger, yaw, ticks=400,
                      throttle=0.7, p3=0.0):
    scen = make_scenarios(
        small_cfg,
        kinds=np.asarray([kind]),
        trigger_pos=np.asarray([trigger]),
        actor_idx=np.asarray([0]),
        params=np.asarray([[15.0, yaw, 0.0, p3]]),
    )
    st = reset_world(
        small_cfg, town, straight_route(), jax.random.key(0), scenario=scen
    )
    veh_active_seen = False
    max_speed = 0.0
    for _ in range(ticks):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, throttle, 0.0]))
        if bool(st.traffic.active[0]):
            veh_active_seen = True
            max_speed = max(max_speed, float(st.traffic.speed[0]))
    return st, veh_active_seen, max_speed


def test_crossing_vehicle_spawns_and_despawns(small_cfg, town):
    st, seen, vmax = run_with_scenario(
        small_cfg, town, scen_lib.KIND_CROSSING_VEHICLE,
        trigger=[40.0, -8.0], yaw=np.pi / 2,
    )
    assert seen
    assert vmax > 4.0  # barreled through
    assert not bool(st.traffic.active[0])  # despawned after duration
    assert int(st.scenario.state[0]) == scen_lib.DONE


def test_oncoming_vehicle_heads_at_ego(small_cfg, town):
    st, seen, vmax = run_with_scenario(
        small_cfg, town, scen_lib.KIND_ONCOMING_VEHICLE,
        trigger=[60.0, -1.75], yaw=np.pi,  # spawns ahead, drives -x at ego
        ticks=500,
    )
    assert seen
    assert int(st.scenario.state[0]) != scen_lib.ARMED
    # the vehicle drove toward the ego (-x) from its spawn
    assert float(st.traffic.pos[0, 0]) < 60.0


def test_vehicle_turning_cyclist(small_cfg, town):
    """Scenario4 VehicleTurningRoute: a cyclist-sized actor starts at the
    roadside and crosses the lane (object_crash_vehicle.py)."""
    st, seen, vmax = run_with_scenario(
        small_cfg, town, scen_lib.KIND_VEHICLE_TURNING,
        trigger=[40.0, -1.75], yaw=np.pi / 2, ticks=500,
    )
    assert seen
    assert int(st.scenario.state[0]) == scen_lib.DONE
    # cyclist extent applied while active (captured before despawn via vmax
    # path); check the extent array took the bicycle size at slot 0
    assert abs(vmax - scen_lib.CYCLIST_SPEED) < 1.0


def test_blocked_overtake_two_actors(small_cfg, town):
    """Scenario5 OtherLeadingVehicle: slow lead at slot 0 + adjacent blocker
    at slot 1 both activate; the lead holds LEAD_SLOW_SPEED
    (other_leading_vehicle.py)."""
    st, seen, vmax = run_with_scenario(
        small_cfg, town, scen_lib.KIND_BLOCKED_OVERTAKE,
        trigger=[40.0, -1.75], yaw=0.0, ticks=200, p3=1.0,
    )
    assert seen
    assert bool(st.traffic.active[1]) or int(st.scenario.state[0]) == scen_lib.DONE
    assert abs(vmax - scen_lib.LEAD_SLOW_SPEED) < 1.0


def test_blocked_overtake_blocker_adjacent(small_cfg, town):
    scen = make_scenarios(
        small_cfg,
        kinds=np.asarray([scen_lib.KIND_BLOCKED_OVERTAKE]),
        trigger_pos=np.asarray([[40.0, -1.75]]),
        actor_idx=np.asarray([0]),
        params=np.asarray([[15.0, 0.0, 0.0, 1.0]]),
    )
    st = reset_world(
        small_cfg, town, straight_route(), jax.random.key(0), scenario=scen
    )
    lead_pos = blocker_pos = None
    for _ in range(250):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.7, 0.0]))
        if bool(st.traffic.active[0]) and bool(st.traffic.active[1]):
            lead_pos = np.asarray(st.traffic.pos[0])
            blocker_pos = np.asarray(st.traffic.pos[1])
            break
    assert lead_pos is not None, "both actors never active together"
    # blocker sits one lane to the left (route heading 0 -> +y is left here)
    assert abs(abs(blocker_pos[1] - lead_pos[1]) - 3.5) < 1.0
    # lead ahead of the blocker along the route
    assert lead_pos[0] > blocker_pos[0]


def test_walker_roadside_ttc_spawn(small_cfg, town):
    """DynamicObjectCrossing spawns the walker at the roadside, not at the
    trigger point, and it dashes across (VERDICT r1 #7 spawn geometry)."""
    trigger = np.asarray([45.0, -1.75])
    scen = make_scenarios(
        small_cfg,
        kinds=np.asarray([scen_lib.KIND_DYNAMIC_CROSSING]),
        trigger_pos=np.asarray([trigger]),
        actor_idx=np.asarray([0]),
        params=np.asarray([[15.0, np.pi / 2, 6.0, 0.0]]),
    )
    st = reset_world(
        small_cfg, town, straight_route(), jax.random.key(0), scenario=scen
    )
    first = None
    for _ in range(300):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.7, 0.0]))
        if bool(st.walkers.active[0]) and first is None:
            first = np.asarray(st.walkers.pos[0])
    assert first is not None
    # spawned ~6 m against the walk direction (walk +y -> start 6 m at -y)
    np.testing.assert_allclose(first[1], trigger[1] - 6.0, atol=0.5)
    np.testing.assert_allclose(first[0], trigger[0], atol=0.5)


def test_lead_vehicle_spawns_brakes_and_clears(small_cfg, town):
    # FollowLeadingVehicle (kind 3): the scenario must SPAWN its own lead
    # (it gets a reserved top slot that background traffic never fills —
    # the pre-fix speed-override was a silent no-op in eval), cruise ahead
    # of the ego, brake to a standstill, then clear
    scen = make_scenarios(
        small_cfg,
        kinds=np.asarray([scen_lib.KIND_LEAD_VEHICLE_BRAKE]),
        trigger_pos=np.asarray([[45.0, -1.75]]),
        actor_idx=np.asarray([0]),
        params=np.asarray([[15.0, 0.0, 0.0, 0.0]]),
    )
    st = reset_world(
        small_cfg, town, straight_route(), jax.random.key(0), scenario=scen
    )
    cruised = stopped_while_active = False
    for _ in range(600):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.6, 0.0]))
        if bool(st.traffic.active[0]):
            spd = float(st.traffic.speed[0])
            cruised = cruised or spd > 3.0
            stopped_while_active = stopped_while_active or (
                cruised and spd < 0.1
            )
    assert cruised, "lead never spawned/cruised"
    assert stopped_while_active, "lead never braked to a standstill"
    # after the full duration the slot deactivates (lead 'drives off')
    assert not bool(st.traffic.active[0])


def test_scenario_collision_scored(small_cfg, town):
    # oncoming car on the ego's exact line + full-throttle ego = collision
    st, _, _ = run_with_scenario(
        small_cfg, town, scen_lib.KIND_ONCOMING_VEHICLE,
        trigger=[45.0, -1.75], yaw=np.pi, ticks=300, throttle=1.0,
    )
    assert int(st.criteria.n_collision_vehicle) >= 1


# --- golden traces (VERDICT r2 #10) ----------------------------------------
# One frozen rollout fingerprint per scenario kind on a fixed seed: the tick
# the scenario actor first activates, its pose at that tick, the ego's final
# position, and the collision counts after 500 ticks of a constant-throttle
# (0.5) blind ego. Any behavior drift in scenario staging, trigger timing,
# spawn geometry, world dynamics, or criteria changes these numbers and must
# be re-frozen DELIBERATELY (regenerate with the parameters below).
GOLDEN = {
    # kind: (first_active_tick, actor_x, actor_y, ego_x, ego_y, n_veh, n_wlk)
    1: (249, 45.0, -7.69, 84.9, -1.8, 0, 1),
    2: (-1, 0.0, 0.0, 84.9, -2.3, 0, 0),
    3: (249, 63.3, -1.75, 84.9, -1.8, 1, 0),
    4: (249, 45.0, -1.35, 84.9, -1.8, 0, 0),
    5: (249, 44.7, -1.75, 84.9, -1.8, 1, 0),
    6: (249, 45.0, -7.55, 84.9, -1.8, 0, 0),
    7: (249, 63.2, -1.75, 84.9, -1.8, 0, 0),
}


def _golden_trace(small_cfg, town, kind):
    p3 = 14.0 if kind == 7 else 0.0
    yaw = {3: 0.0, 5: np.pi, 7: 0.0}.get(kind, np.pi / 2)
    scen = make_scenarios(
        small_cfg, kinds=np.asarray([kind]),
        trigger_pos=np.asarray([[45.0, -1.75]]), actor_idx=np.asarray([0]),
        params=np.asarray([[15.0, yaw, 0.0, p3]]),
    )
    st = reset_world(
        small_cfg, town, straight_route(), jax.random.key(0), scenario=scen
    )
    first_active, first_pos = -1, (0.0, 0.0)
    for t in range(500):
        st, _ = JIT_STEP(small_cfg, town, st, jnp.asarray([0.0, 0.5, 0.0]))
        if first_active < 0 and bool(st.traffic.active[0]):
            first_active = t
            first_pos = (round(float(st.traffic.pos[0, 0]), 2),
                         round(float(st.traffic.pos[0, 1]), 2))
        if first_active < 0 and bool(st.walkers.active[0]):
            first_active = t
            first_pos = (round(float(st.walkers.pos[0, 0]), 2),
                         round(float(st.walkers.pos[0, 1]), 2))
    return (first_active, first_pos[0], first_pos[1],
            round(float(st.ego.pos[0]), 1), round(float(st.ego.pos[1]), 1),
            int(st.criteria.n_collision_vehicle),
            int(st.criteria.n_collision_walker))


@pytest.mark.parametrize("kind", sorted(GOLDEN))
def test_golden_trace(small_cfg, town, kind):
    assert _golden_trace(small_cfg, town, kind) == GOLDEN[kind]
