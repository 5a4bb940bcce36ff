"""Expert hazard-brake rules (roach_ap_agent _is_vehicle_hazard:536-569).

The reference collector brakes for ANY vehicle — moving or stopped — inside
a ±30° bearing cone within max(10, 3·ego_speed) m, when it is roughly
co-heading (Δyaw ≤ 60°) or dead ahead (bearing < 15°). These tests pin the
TPU port of that exact geometry, plus the opt-in behavior (the rule-based
autopilot must NOT get the cone: its own gap law follows queues closer than
10 m by design).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thinktwice_tpu.agents.expert import hazard_brake
from thinktwice_tpu.sim.reset import reset_world

from tests.test_world import straight_route


def _place_vehicle(st, pos, yaw, speed=0.0):
    """Overwrite traffic slot 0 with a hand-placed actor; deactivate rest."""
    tr = st.traffic
    n = tr.pos.shape[0]
    active = jnp.zeros((n,), bool).at[0].set(True)
    tr = dataclasses.replace(
        tr,
        pos=tr.pos.at[0].set(jnp.asarray(pos, jnp.float32)),
        yaw=tr.yaw.at[0].set(jnp.float32(yaw)),
        speed=tr.speed.at[0].set(jnp.float32(speed)),
        active=active,
    )
    # no walkers in the way
    wk = dataclasses.replace(
        st.walkers, active=jnp.zeros_like(st.walkers.active))
    return dataclasses.replace(st, traffic=tr, walkers=wk)


def _base_state(small_cfg, town):
    st = reset_world(small_cfg, town, straight_route(), jax.random.key(0),
                     n_vehicles=0)
    # ego at x0=10, y=-1.75 heading +x (yaw 0), at rest
    return st


def test_cone_brakes_for_stopped_leader(small_cfg, town):
    st = _base_state(small_cfg, town)
    ego = np.asarray(st.ego.pos)
    st = _place_vehicle(st, [ego[0] + 7.0, ego[1]], yaw=0.0, speed=0.0)
    assert bool(hazard_brake(small_cfg, st, stopped_cone=True))
    # the moving-only forecast alone must NOT fire on a stopped leader
    assert not bool(hazard_brake(small_cfg, st, stopped_cone=False))


def test_cone_distance_threshold_scales_with_speed(small_cfg, town):
    st = _base_state(small_cfg, town)
    ego = np.asarray(st.ego.pos)
    # 14 m ahead: outside s1=10 at rest...
    st14 = _place_vehicle(st, [ego[0] + 14.0, ego[1]], yaw=0.0)
    assert not bool(hazard_brake(small_cfg, st14, stopped_cone=True))
    # ...inside s1=3·6=18 at 6 m/s
    fast = dataclasses.replace(
        st14, ego=dataclasses.replace(st14.ego, speed=jnp.float32(6.0)))
    assert bool(hazard_brake(small_cfg, fast, stopped_cone=True))


def test_cone_ignores_vehicle_behind_and_off_bearing(small_cfg, town):
    st = _base_state(small_cfg, town)
    ego = np.asarray(st.ego.pos)
    behind = _place_vehicle(st, [ego[0] - 7.0, ego[1]], yaw=0.0)
    assert not bool(hazard_brake(small_cfg, behind, stopped_cone=True))
    # 45° off the bow at 8 m: bearing cone is ±30°
    off = _place_vehicle(
        st, [ego[0] + 8.0 * np.cos(0.8), ego[1] + 8.0 * np.sin(0.8)], yaw=0.0)
    assert not bool(hazard_brake(small_cfg, off, stopped_cone=True))


def test_cone_crossing_heading_needs_dead_ahead(small_cfg, town):
    st = _base_state(small_cfg, town)
    ego = np.asarray(st.ego.pos)
    # crossing-heading (Δyaw=90°>60°) at bearing ~20°: skipped by the rule
    y = 8.0 * np.tan(np.deg2rad(20.0))
    side = _place_vehicle(st, [ego[0] + 8.0, ego[1] + y], yaw=np.pi / 2)
    assert not bool(hazard_brake(small_cfg, side, stopped_cone=True))
    # same crossing heading dead ahead (bearing < 15°): hazard
    ahead = _place_vehicle(st, [ego[0] + 8.0, ego[1]], yaw=np.pi / 2)
    assert bool(hazard_brake(small_cfg, ahead, stopped_cone=True))
