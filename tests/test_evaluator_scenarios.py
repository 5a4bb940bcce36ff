"""Evaluator with scenario specs: triggers fire during scored rollouts."""

import numpy as np

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.harness.evaluator import build_route_scenarios, evaluate_routes
from thinktwice_tpu.harness.route_parser import ScenarioTrigger


def straight_route(y=-1.75, length=80.0, n=128):
    xs = np.linspace(8.0, 8.0 + length, n)
    return np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], axis=1)


def test_build_route_scenarios_slots(small_cfg):
    route = straight_route()
    trigs = [
        ScenarioTrigger("Scenario3", np.asarray([30.0, -1.75]), 90.0),
        ScenarioTrigger("Scenario7", np.asarray([50.0, -1.75]), 90.0),
        ScenarioTrigger("Scenario1", np.asarray([60.0, -1.75]), 0.0),
    ]
    scen = build_route_scenarios(small_cfg, route, trigs)
    kinds = np.asarray(scen.kind)[:3]
    assert list(kinds) == [1, 4, 2]
    actors = np.asarray(scen.actor_idx)[:3]
    # vehicle scenario gets a top traffic slot
    assert actors[1] == small_cfg.sim.max_vehicles - 1


def test_eval_with_crossing_scenario(small_cfg, town, tmp_path):
    route = straight_route()
    trigs = [ScenarioTrigger("Scenario3", np.asarray([40.0, -1.75]), 90.0)]
    scen = build_route_scenarios(small_cfg, route, trigs)
    g = evaluate_routes(
        small_cfg, town, [route], ["s0"],
        policy_fn=autopilot_control,
        worlds_per_batch=1,
        max_steps=1600,
        scenarios=[scen],
    )
    # the autopilot brakes for the crossing walker but should still finish;
    # score must be a valid leaderboard number either way
    assert 0.0 <= g["scores"]["score_composed"] <= 100.0
    assert g["scores"]["score_route"] > 50.0
