"""KIND_TL_MANIPULATOR (sim/scenarios.py — srunner TrafficLightManipulator,
atomic_behaviors.py:2100-2270): a running slot pins nearby aligned lights to
a forced phase; the override expires with the scenario timer."""

import numpy as np
import jax
import jax.numpy as jnp

from thinktwice_tpu.config import Config, SimConfig
from thinktwice_tpu.maps.procedural import make_grid_town
from thinktwice_tpu.maps.town import TL_GREEN, TL_RED, traffic_light_states
from thinktwice_tpu.sim import scenarios as scen_lib
from thinktwice_tpu.sim.reset import make_scenarios, reset_world
from thinktwice_tpu.sim.step import step_world


def _cfg():
    return Config(sim=SimConfig(max_vehicles=8, max_walkers=4,
                                max_route_len=256, max_scenarios=4))


def _world_with_manipulator(forced_state: float):
    cfg = _cfg()
    town = make_grid_town(n_blocks=2, block=100.0)
    tl_pos = np.asarray(town.tl_pos)
    tl_yaw = np.asarray(town.tl_yaw)
    tl_valid = np.asarray(town.tl_valid)
    k = int(np.nonzero(tl_valid)[0][0])       # grab the first real light

    xs = np.linspace(5.0, 120.0, 256)
    route = np.stack([xs, np.full_like(xs, 98.25), np.zeros_like(xs)], 1)
    # trigger at the ego spawn so the scenario fires on the first tick
    scen = make_scenarios(
        cfg,
        kinds=np.asarray([scen_lib.KIND_TL_MANIPULATOR]),
        trigger_pos=tl_pos[k : k + 1].astype(np.float64),
        actor_idx=np.asarray([0]),
        params=np.asarray([[1e4, float(tl_yaw[k]), 0.0, forced_state]]),
    )
    state = reset_world(cfg, town, route.astype(np.float32),
                        jax.random.key(0), n_vehicles=0, scenario=scen)
    return cfg, town, k, state


def _override_at(town, state, k):
    over = scen_lib.scenario_tl_override(
        state.scenario, town.tl_pos, town.tl_yaw, town.tl_valid)
    return int(np.asarray(over)[k])


def test_forced_red_overrides_and_expires():
    cfg, town, k, state = _world_with_manipulator(forced_state=float(TL_RED))
    step = jax.jit(lambda s: step_world(cfg, town, s, jnp.zeros(3))[0])
    state = step(state)                        # ARMED -> RUNNING
    assert int(np.asarray(state.scenario.state)[0]) == scen_lib.RUNNING
    assert _override_at(town, state, k) == TL_RED

    # run past TL_FORCE_DURATION: slot finishes, override clears
    n = int(scen_lib.TL_FORCE_DURATION / cfg.sim.dt) + 5
    for _ in range(n):
        state = step(state)
    assert int(np.asarray(state.scenario.state)[0]) == scen_lib.DONE
    assert _override_at(town, state, k) == -1


def test_forced_green_only_grabs_aligned_nearby_lights():
    cfg, town, k, state = _world_with_manipulator(forced_state=float(TL_GREEN))
    state = jax.jit(lambda s: step_world(cfg, town, s, jnp.zeros(3))[0])(state)
    over = np.asarray(scen_lib.scenario_tl_override(
        state.scenario, town.tl_pos, town.tl_yaw, town.tl_valid))
    tl_pos = np.asarray(town.tl_pos)
    tl_yaw = np.asarray(town.tl_yaw)
    tl_valid = np.asarray(town.tl_valid)
    trig = tl_pos[k]
    for i in range(len(over)):
        if not tl_valid[i]:
            assert over[i] == -1
            continue
        d = np.linalg.norm(tl_pos[i] - trig)
        dyaw = abs(np.arctan2(np.sin(tl_yaw[i] - tl_yaw[k]),
                              np.cos(tl_yaw[i] - tl_yaw[k])))
        if d < scen_lib.TL_FORCE_RADIUS and dyaw < np.pi / 3:
            assert over[i] == TL_GREEN
        else:
            assert over[i] == -1

    # and the world's own phase function is actually overridden in-step:
    # while running, an aligned red light reads green through the override
    sched = np.asarray(traffic_light_states(town, state.time_s))
    eff = np.where(over >= 0, over, sched)
    assert eff[k] == TL_GREEN
