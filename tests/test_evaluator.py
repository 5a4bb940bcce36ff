"""End-to-end harness test: autopilot drives routes, DS statistics come out."""

import json

import numpy as np

from thinktwice_tpu.agents.autopilot import autopilot_control
from thinktwice_tpu.harness.evaluator import evaluate_routes


def straight_route(y, length=60.0, n=128):
    xs = np.linspace(8.0, 8.0 + length, n)
    return np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], axis=1)


def test_autopilot_completes_routes(small_cfg, town, tmp_path):
    routes = [straight_route(-1.75), straight_route(98.25)]
    out = str(tmp_path / "results.json")
    g = evaluate_routes(
        small_cfg, town, routes, ["r0", "r1"],
        policy_fn=autopilot_control,
        n_vehicles=0,
        worlds_per_batch=2,
        out_path=out,
        max_steps=1500,
    )
    assert g["scores"]["score_route"] > 60.0, g
    doc = json.load(open(out))
    assert len(doc["_checkpoint"]["records"]) == 2
    assert doc["labels"][0] == "Driving score"


def test_resume_skips_done(small_cfg, town, tmp_path):
    routes = [straight_route(-1.75), straight_route(98.25)]
    out = str(tmp_path / "results.json")
    evaluate_routes(
        small_cfg, town, routes[:1], ["r0"],
        policy_fn=autopilot_control,
        worlds_per_batch=1, out_path=out, max_steps=200,
    )
    # resume over both: only route 1 runs; both records in the doc afterwards
    g = evaluate_routes(
        small_cfg, town, routes, ["r0", "r1"],
        policy_fn=autopilot_control,
        worlds_per_batch=1, out_path=out, max_steps=200, resume=True,
    )
    # global statistics normalize over total_routes=2
    assert 0 <= g["scores"]["score_route"] <= 100.0


def test_policy_every_control_hold(small_cfg, town, tmp_path):
    """policy_every=2 (the reference expert's 10 Hz cadence,
    roach_ap_agent_data_collection.py:462-465) must still complete the route:
    the control is held between policy calls while criteria tick every step."""
    routes = [straight_route(-1.75)]
    g = evaluate_routes(
        small_cfg, town, routes, ["r0"],
        policy_fn=autopilot_control,
        n_vehicles=0,
        worlds_per_batch=1,
        out_path=str(tmp_path / "res.json"),
        max_steps=1500,
        segment_steps=250,
        policy_every=2,
    )
    assert g["scores"]["score_route"] > 60.0, g


def test_policy_every_must_divide_segment(small_cfg, town, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        evaluate_routes(
            small_cfg, town, [straight_route(-1.75)], ["r0"],
            policy_fn=autopilot_control,
            worlds_per_batch=1, max_steps=100,
            segment_steps=255, policy_every=2,
        )
